"""Regenerate the ``queries()`` ordering in ``__spark_entry__.py`` by
driver-evidence staleness.

The driver's CORRECTNESS pass is time-budgeted (~50 queries per round), so
the dict order IS the evidence-rotation policy: flagship first, then
never-checked queries, then everything else ascending by the round of its
most recent driver row (read from the ``CORRECTNESS_r0*.json`` ledger).
Run after adding queries or when a new CORRECTNESS artifact lands; the
invariant is pinned by tests/test_entry_contract.py::test_staleness_rotation.
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FLAGSHIP = "q1_pricing_summary"


def ledger(repo: str = REPO, max_round: int | None = None) -> dict[str, int]:
    """query -> round of its most recent driver CORRECTNESS row.

    ``max_round`` truncates the ledger to artifacts from rounds <= it, so a
    committed ordering can be validated against the ledger AS OF the snapshot
    it was generated from (a new CORRECTNESS_rN.json landing after the commit
    must not redden the suite — r9/r10 verdicts)."""
    last: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r0*(\d+)", os.path.basename(f)).group(1))
        if max_round is not None and rnd > max_round:
            continue
        for q in json.load(open(f)):
            last[q] = rnd
    return last


def committed_snapshot(src: str) -> int | None:
    """The ledger round the committed queries() ordering was generated from."""
    m = re.search(r"ledger-snapshot: r(\d+)", src)
    return int(m.group(1)) if m else None


def current_entries(src: str) -> tuple[re.Match, dict[str, str]]:
    m = re.search(r"def queries\(\).*?return \{(.*?)\n    \}\n", src, re.S)
    return m, dict(re.findall(r'"([a-z0-9_]+)":\s*([a-zA-Z_][\w.]*),', m.group(1)))


def main() -> None:
    path = os.path.join(REPO, "__spark_entry__.py")
    src = open(path).read()
    m, entries = current_entries(src)
    last = ledger()
    order = [FLAGSHIP] + sorted(
        (q for q in entries if q != FLAGSHIP),
        key=lambda q: (last.get(q, 0), q),
    )
    body = "\n".join(f'        "{q}": {entries[q]},' for q in order)
    snapshot = max(last.values(), default=0)
    comment = (
        "    # Ordered for the driver's time-budgeted CORRECTNESS pass (~50 rows),\n"
        "    # strictly by driver-evidence staleness: flagship first, then\n"
        "    # never-checked queries, then every other query sorted by the round\n"
        "    # of its most recent driver row ASCENDING. Regenerate with\n"
        "    # tools/staleness_order.py; pinned by tests/test_entry_contract.py.\n"
        f"    # ledger-snapshot: r{snapshot} (artifacts newer than this round are\n"
        "    # expected to land after this ordering was committed; the rotation\n"
        "    # test validates against the ledger as of this snapshot).\n"
    )
    fn = (
        "def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:\n"
        + comment
        + "    return {\n"
        + body
        + "\n    }\n"
    )
    open(path, "w").write(src[: m.start()] + fn + src[m.end() :])
    stale = [q for q in entries if max(last.values(), default=0) - last.get(q, 0) >= 3]
    print(f"{len(entries)} queries reordered; {len(stale)} were >=3 rounds stale")


if __name__ == "__main__":
    main()
