"""Unicode hygiene for corpus ingest: mojibake repair, control-char strip,
NFC normalization — with per-fix counters.

Every public corpus pipeline normalizes encodings before quality scoring
(CCNet and Gopher both do); skipping it double-counts near-identical docs
(é vs e+combining-acute hash differently) and poisons token statistics.

Spark-first shape — all zero-shuffle (pure per-row projections):

- ``mojibake``: the classic UTF-8-bytes-decoded-as-cp1252 artifacts
  ("Ã©" for é, "â€™" for ’). Repair is a fixed, ordered literal-replace
  chain — whole-stage-codegen'd JVM string ops, no UDF, no regex. The
  rule table is deliberately closed: a fixed list of unambiguous cp1252
  renderings, applied in one published order, so the scrub is a pure
  md5-checkable function of the input that DuckDB replays exactly
  (replace-for-replace) — the repo's cross-engine repair contract.
- ``control chars``: strip C0 controls except \\t \\n \\r, plus DEL — one
  codegen'd ``regexp_replace``.
- ``NFC``: full Unicode composition genuinely isn't expressible as Spark
  SQL expressions (no ICU surface), so this one step is an Arrow-batched
  pandas UDF over ``unicodedata.normalize`` — still zero-shuffle, and the
  documented swap-in seam for a JVM ICU UDF in a production deployment.
  The DuckDB oracle replays it via ``nfc_normalize`` (utf8proc); both
  implement the same Unicode standard.

The repair is SINGLE-PASS (each rule's literal replace runs once, in list
order): an adversarial input where one repair's output abuts leftover
artifact bytes to form an EARLIER rule's artifact (e.g. "ÂÂ««") keeps the
residual — the same semantics as DuckDB's replace chain, so cross-engine
equality (the gate contract) holds regardless; a deployment wanting
fixpoint repair iterates the pass, as ftfy does. Idempotence holds for
non-overlapping artifacts (test-pinned).

Counters count OCCURRENCES DETECTED IN THE INPUT of each artifact class
(cheap length-delta arithmetic on the original string — exact, no second
pass): in the pathological case where one repair's output abuts bytes that
form another rule's artifact, the chain repairs it but the counter doesn't
see it; the repaired TEXT is identical across engines either way because
both run the same literal chain in the same order.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (artifact, repaired) — UTF-8 bytes of the repaired char, re-decoded as
#: cp1252. Ordered; both engines must apply in THIS order.
MOJIBAKE_RULES: list[tuple[str, str]] = [
    ("â€™", "’"),  # right single quote
    ("â€œ", "“"),  # left double quote
    ("â€“", "–"),  # en dash
    ("â€”", "—"),  # em dash
    ("â€¦", "…"),  # ellipsis
    ("Ã©", "é"),
    ("Ã¨", "è"),
    ("Ã¡", "á"),
    ("Ã³", "ó"),
    ("Ãº", "ú"),
    ("Ã±", "ñ"),
    ("Ã¼", "ü"),
    ("Ã¶", "ö"),
    ("Ã¤", "ä"),
    ("Ã§", "ç"),
    ("Â«", "«"),
    ("Â»", "»"),
    ("Â°", "°"),
]

#: C0 controls except tab/newline/carriage-return, plus DEL. Plain
#: character-class regex — Java (Spark) and RE2 (DuckDB) agree.
CONTROL_PATTERN = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"


def mojibake_repair(text: Column) -> Column:
    """The ordered literal-replace chain (codegen'd JVM string ops)."""
    fixed = text
    for bad, good in MOJIBAKE_RULES:
        fixed = F.replace(fixed, F.lit(bad), F.lit(good))
    return fixed


def mojibake_count(text: Column) -> Column:
    """Occurrences of any artifact in the input — length-delta arithmetic,
    exact integers (each delta is a multiple of the artifact length)."""
    n = F.lit(0).cast("long")
    for bad, _ in MOJIBAKE_RULES:
        diff = F.length(text) - F.length(F.replace(text, F.lit(bad), F.lit("")))
        n = n + (diff / F.lit(len(bad))).cast("long")
    return n


def strip_controls(text: Column) -> Column:
    return F.regexp_replace(text, CONTROL_PATTERN, "")


def _nfc_udf():
    import pandas as pd  # noqa: F401  (Arrow serde)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def nfc(s):  # pandas Series -> pandas Series, Arrow-batched
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize("NFC", x) if x is not None else None
        )

    return nfc


def unicode_scrub(text: Column) -> dict[str, Column]:
    """Full hygiene pass. Returns named expressions so callers project
    exactly what they need:

    - ``clean``            the scrubbed text (repair → strip → NFC)
    - ``n_mojibake``       artifact occurrences detected in the input
    - ``n_ctrl``           control chars stripped
    - ``nfc_changed``      1 when NFC recomposed anything, else 0
    """
    repaired = mojibake_repair(text)
    stripped = strip_controls(repaired)
    clean = _nfc_udf()(stripped)
    return {
        "clean": clean,
        "n_mojibake": mojibake_count(text),
        "n_ctrl": (F.length(repaired) - F.length(strip_controls(repaired))).cast(
            "long"
        ),
        "nfc_changed": (clean != stripped).cast("long"),
    }
