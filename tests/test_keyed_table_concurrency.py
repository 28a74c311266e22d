"""KeyedTable optimistic-concurrency and snapshot-retention guarantees
(reference serializes per-key writes through partition masters,
KVStoreLocal.scala:589-631; a multi-writer batch table needs CAS commits)."""

from __future__ import annotations

import os

import pytest

from affinity_spark.sources.keyed_table import ConcurrentWriteError, KeyedTable


def _table(spark, tmp_path, name="kt", **kw):
    return KeyedTable(spark, str(tmp_path / name), ["k"], "ts", **kw)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, ts long, v string")


def test_lost_update_is_impossible(spark, tmp_path):
    """Writer A reads the base, writer B commits meanwhile: A's commit must
    raise, not silently drop B's update."""
    a = _table(spark, tmp_path)
    a.upsert(_df(spark, [(1, 100, "base")]))

    b = _table(spark, tmp_path)

    # A captures its base snapshot and computes a merge from it
    a_base = a._current_version_dir()
    a_merged = _df(spark, [(1, 200, "from-a"), (2, 200, "a-only")])

    # B commits first
    b.upsert(_df(spark, [(3, 150, "from-b")]))

    with pytest.raises(ConcurrentWriteError, match="moved from"):
        a.overwrite(a_merged, expected_base=a_base)

    # B's write survived; A's loser snapshot dir was cleaned up
    vals = {r.k: r.v for r in a.read().collect()}
    assert vals == {1: "base", 3: "from-b"}
    current = a._current_version_dir()
    others = [d for d in a._version_dirs() if d != current]
    # retained history only (no orphaned uncommitted snapshot bigger than it)
    assert len(others) <= a.retain_versions - 1 + 1


def test_sequential_upserts_still_fine(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.upsert(_df(spark, [(1, 100, "a")]))
    t.upsert(_df(spark, [(1, 200, "b"), (2, 100, "c")]))
    vals = {r.k: r.v for r in t.read().collect()}
    assert vals == {1: "b", 2: "c"}


def test_snapshot_isolated_reader_survives_next_commit(spark, tmp_path):
    """ADVICE fix: a lazy DataFrame over version N must stay readable after
    the N+1 commit (previous versions are retained, not deleted)."""
    t = _table(spark, tmp_path)
    t.upsert(_df(spark, [(1, 100, "first")]))
    snapshot = t.read()  # lazy plan pinned to version N's files
    t.upsert(_df(spark, [(1, 200, "second")]))
    # old snapshot still fully consumable
    assert [r.v for r in snapshot.collect()] == ["first"]
    # and the pointer serves the new version
    assert [r.v for r in t.read().collect()] == ["second"]


def test_vacuum_versions_reclaims_history(spark, tmp_path):
    t = _table(spark, tmp_path, retain_versions=3)
    for i in range(4):
        t.upsert(_df(spark, [(1, 100 + i, f"v{i}")]))
    assert len(t._version_dirs()) == 3  # auto-retention
    removed = t.vacuum_versions(keep=1)
    assert removed == 2
    assert len(t._version_dirs()) == 1
    assert [r.v for r in t.read().collect()] == ["v3"]


def test_stale_lock_is_broken(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.upsert(_df(spark, [(1, 100, "a")]))
    # simulate a dead writer's abandoned lock, aged past the 60s threshold
    with open(t._lock, "w"):
        pass
    old = os.path.getmtime(t._lock) - 120
    os.utime(t._lock, (old, old))
    t.upsert(_df(spark, [(2, 100, "b")]))  # must not dead-lock
    assert t.read().count() == 2


def test_held_lock_times_out(spark, tmp_path):
    t = _table(spark, tmp_path, lock_timeout_s=0.3)
    t.upsert(_df(spark, [(1, 100, "a")]))
    with open(t._lock, "w"):
        pass  # fresh lock -> treated as held
    with pytest.raises(ConcurrentWriteError, match="lock"):
        t.upsert(_df(spark, [(2, 100, "b")]))
    os.unlink(t._lock)


def test_time_travel_reads_retained_snapshots(spark, tmp_path):
    from affinity_spark.sources.keyed_table import KeyedTable

    t = KeyedTable(
        spark, str(tmp_path / "tt"), key_cols=["k"], ts_col="ts", retain_versions=3
    )
    t.overwrite(spark.createDataFrame([(1, 1, "a")], "k int, ts long, v string"))
    v1 = t.versions()[-1]
    t.overwrite(spark.createDataFrame([(1, 2, "b"), (2, 1, "c")], "k int, ts long, v string"))
    v2 = t.versions()[-1]

    assert {r.v for r in t.read_version(v1).collect()} == {"a"}
    assert {r.v for r in t.read_version(v2).collect()} == {"b", "c"}
    assert t.read_version(v2).count() == t.read().count()

    import pytest

    with pytest.raises(FileNotFoundError):
        t.read_version("v_nope")


def test_changes_between_classifies_insert_update_delete(spark, tmp_path):
    """CDF read: diffing two retained snapshots yields exactly the deltas."""
    t = _table(spark, tmp_path, retain_versions=4, tombstone_col=None)
    t.upsert(_df(spark, [(1, 100, "a"), (2, 100, "b"), (3, 100, "c")]))
    t.upsert(_df(spark, [(2, 200, "b2"), (4, 200, "d")]))  # update 2, insert 4
    v_old, v_new = t.versions()[-2], t.versions()[-1]

    got = {r.k: r.change for r in t.changes_between(v_old, v_new).collect()}
    assert got == {2: "update", 4: "insert"}

    rows = {r.k: r for r in t.changes_between(v_old, v_new).collect()}
    assert rows[2].old_values.v == "b" and rows[2].new_values.v == "b2"
    assert rows[4].old_values is None and rows[4].new_values.v == "d"

    # reverse diff sees the inverse operations
    rev = {r.k: r.change for r in t.changes_between(v_new, v_old).collect()}
    assert rev == {2: "update", 4: "delete"}


def test_changes_between_empty_for_identical_snapshots(spark, tmp_path):
    t = _table(spark, tmp_path, retain_versions=4)
    t.upsert(_df(spark, [(1, 100, "a")]))
    t.upsert(_df(spark, [(1, 100, "a")]))  # no-op merge, new snapshot
    v_old, v_new = t.versions()[-2], t.versions()[-1]
    assert t.changes_between(v_old, v_new).count() == 0


def test_changes_between_tolerates_added_column(spark, tmp_path):
    """Schema drift between snapshots (the evolution scenario CDF exists
    for): the missing column reads as null on the old side."""
    import pyspark.sql.functions as F

    t = _table(spark, tmp_path, retain_versions=4)
    t.upsert(_df(spark, [(1, 100, "a")]))
    # drift lands via overwrite (a widening backfill); upsert itself
    # correctly refuses mismatched schemas
    wider = spark.createDataFrame([(1, 200, "a2", "extra")],
                                  "k int, ts long, v string, note string")
    t.overwrite(wider, expected_base=t._current_version_dir())
    v_old, v_new = t.versions()[-2], t.versions()[-1]
    rows = {r.k: r for r in t.changes_between(v_old, v_new).collect()}
    assert rows[1].change == "update"
    assert rows[1].old_values.note is None
    assert rows[1].new_values.note == "extra"


def test_changes_between_tolerates_widened_column_type(spark, tmp_path):
    """A value column whose type widened between snapshots (int → long)
    must diff cleanly — both sides cast to the new snapshot's type —
    instead of failing struct-equality analysis."""
    from affinity_spark.sources.keyed_table import KeyedTable

    t = KeyedTable(spark, str(tmp_path / "widen"), key_cols=["k"], ts_col="ts",
                   retain_versions=4)
    t.overwrite(spark.createDataFrame([(1, 1, 7), (2, 1, 8)],
                                      "k int, ts long, amount int"))
    t.overwrite(spark.createDataFrame([(1, 2, 7), (2, 2, 99)],
                                      "k int, ts long, amount long"))
    v_old, v_new = t.versions()[-2], t.versions()[-1]
    rows = {r.k: r for r in t.changes_between(v_old, v_new).collect()}
    # k=1: amount unchanged in value (7 == 7L) but ts moved -> update;
    # k=2: real value change
    assert rows[2].change == "update"
    assert rows[2].old_values.amount == 8 and rows[2].new_values.amount == 99
