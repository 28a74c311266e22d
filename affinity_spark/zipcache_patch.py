"""Stat-guarded ``zipimporter.invalidate_caches`` (backport of the
CPython >= 3.12 behavior).

Why this exists: pyspark's ``worker_util.setup_spark_files`` calls
``importlib.invalidate_caches()`` at the start of EVERY task, and on
CPython 3.11 ``zipimporter.invalidate_caches`` EAGERLY re-parses the
archive's entire central directory. With ``pyspark.zip`` (~3.5 MB,
thousands of entries) and ``py4j-*.zip`` on every worker's ``sys.path``,
that is ~150 ms of pure python-worker CPU per task — measured r15 by
sampling the reused worker's main-thread stacks during a trivial 1-row
pandas-UDF task (~180 ms worker CPU, dominated by
``zipimport._read_directory`` under ``importlib.invalidate_caches``).
It is the bulk of the fixed per-task cost of every python-boundary
stage, paid even on warm reused workers.

The patch re-reads the directory only when ``os.stat`` of the archive
changed (mtime_ns, size) since the last re-read — the same freshness
test CPython >= 3.12 ships in ``zipimport`` itself. A genuinely
modified or replaced archive is still picked up; an unchanged one stops
costing a full central-directory parse per task. The first
``invalidate_caches`` after patching still re-reads once (we cannot
know the stat the importer originally loaded under), so the guard can
never serve staler data than the unpatched code would.

Applied from ``affinity_spark/__init__``: driver-side on import, and
worker-side the first time a task unpickles one of our module-level
UDFs (cloudpickle serializes them by reference, so workers import the
package); python workers are reused, so every later task in that worker
skips the re-read. Idempotent and version-guarded — a zipimport whose
``invalidate_caches`` already stat-checks (CPython >= 3.12) is left
alone.
"""

from __future__ import annotations

import os
import sys
import zipimport

_STAMP = "_affinity_zipdir_stamp"


def apply() -> bool:
    """Install the stat guard. Returns True if (already) installed."""
    if os.environ.get("AFFINITY_NO_ZIPCACHE_PATCH"):
        # A/B lever: the patch applies at import time, before any
        # SparkSession conf exists, so the kill-switch is an env var.
        return False
    cls = zipimport.zipimporter
    orig = cls.invalidate_caches
    if getattr(orig, "_affinity_stat_guarded", False):
        return True
    if sys.version_info >= (3, 12):
        # upstream already stat-checks; nothing to fix
        return False

    def invalidate_caches(self):  # noqa: ANN001 - stdlib signature
        try:
            st = os.stat(self.archive)
            key = (st.st_mtime_ns, st.st_size)
        except OSError:
            key = None
        if (
            key is not None
            and getattr(self, _STAMP, None) == key
            and getattr(self, "_files", None)
        ):
            return
        orig(self)
        if key is not None and getattr(self, "_files", None):
            try:
                setattr(self, _STAMP, key)
            except AttributeError:
                pass

    invalidate_caches._affinity_stat_guarded = True  # type: ignore[attr-defined]
    invalidate_caches.__doc__ = orig.__doc__
    cls.invalidate_caches = invalidate_caches
    return True
