"""KeyedTable small-file compaction: physical rewrite, identical rows,
CAS-protected against racing writers."""

from __future__ import annotations

import pytest

from affinity_spark.sources.keyed_table import ConcurrentWriteError, KeyedTable


def _table(spark, tmp_path, name="kt", **kw):
    return KeyedTable(spark, str(tmp_path / name), ["k"], "ts", **kw)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, ts long, v string")


def test_compact_reduces_files_and_preserves_rows(spark, tmp_path):
    t = _table(spark, tmp_path, num_buckets=16)
    rows = [(i, 100 + i, f"v{i}") for i in range(64)]
    t.upsert(_df(spark, rows))
    before = t.file_stats()
    assert before["n_files"] == 16  # one tiny file per bucket

    res = t.compact(target_file_bytes=1 << 30)  # everything fits in one
    assert res["compacted"] is True
    assert res["n_files_after"] == 1
    got = sorted((r["k"], r["ts"], r["v"]) for r in t.read().collect())
    assert got == sorted(rows)


def test_compact_is_a_noop_when_already_compact(spark, tmp_path):
    t = _table(spark, tmp_path, num_buckets=2)
    t.upsert(_df(spark, [(1, 1, "a"), (2, 2, "b")]))
    t.compact(target_file_bytes=1 << 30)
    v = t.file_stats()["version"]
    res = t.compact(target_file_bytes=1 << 30)
    assert res["compacted"] is False
    assert t.file_stats()["version"] == v  # no new version committed


def test_compact_loses_cleanly_to_a_concurrent_upsert(spark, tmp_path, monkeypatch):
    """A compaction computed from a stale base must NOT resurrect
    pre-upsert data: simulate the race by moving the pointer between the
    compaction's base read and its commit."""
    t = _table(spark, tmp_path, num_buckets=8)
    t.upsert(_df(spark, [(i, i, "old") for i in range(8)]))

    real_commit = t._commit_version

    def racing_commit(version, expected_base, meta=None):
        other = _table(spark, tmp_path)
        other.upsert(_df(spark, [(1, 999, "new")]))
        return real_commit(version, expected_base)

    monkeypatch.setattr(t, "_commit_version", racing_commit)
    with pytest.raises(ConcurrentWriteError):
        t.compact(target_file_bytes=1 << 30)
    # the upsert's row survived
    assert [r["v"] for r in t.get({"k": 1}).collect()] == ["new"]


def test_compact_respects_time_travel_retention(spark, tmp_path):
    t = _table(spark, tmp_path, num_buckets=8, retain_versions=2)
    t.upsert(_df(spark, [(1, 1, "a")]))
    pre = t.file_stats()["version"]
    t.compact(target_file_bytes=1 << 30)
    # previous snapshot still readable (snapshot-isolated readers)
    assert t.read_version(pre).count() == 1


def test_compact_rejected_on_external_table(spark, tmp_path):
    t = _table(spark, tmp_path, num_buckets=2)
    t.upsert(_df(spark, [(1, 1, "a")]))
    ro = KeyedTable(spark, t.path, ["k"], "ts", external=True)
    with pytest.raises(PermissionError):
        ro.compact()
