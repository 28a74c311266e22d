"""Maintained HLL sketch store (operators/sketch_store.py): range merge
== direct sketch, incremental admit == full build, replay idempotence by
algebra, partition-pruned range reads, streaming maintenance.

Reference pattern: X1 maintained indexes,
core/src/main/scala/io/amient/affinity/core/state/KVStoreLocal.scala:195-248.
"""

import datetime as dt
import json
import os

import pytest
from pyspark.sql import functions as F

from affinity_spark.operators.sketch_store import HLLStore
from affinity_spark.operators.sketches import hll_registers


def _rows(n, day_count=5, seed=3):
    base = dt.datetime(2024, 1, 1)
    out = []
    for i in range(n):
        day = (seed * i * 2654435761) % day_count
        ts = base + dt.timedelta(days=day, minutes=i % 1440)
        out.append((i, ts, (i * 7919) % 97))
    return out


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long"
    )


def _key():
    return F.col("user_id").cast("string")


def _regs(df):
    return {(r["bucket"], r["register"]) for r in df.collect()}


def test_range_merge_equals_direct_sketch(spark, tmp_path):
    """Merged registers for [d0, d1] must equal hll_registers computed
    directly over the raw rows of those days — the merge-on-read answer
    is the same sketch the raw rescan would build."""
    rows = _rows(400)
    df = _df(spark, rows)
    st = HLLStore(spark, str(tmp_path / "hll"))
    st.build(df, _key())
    d0, d1 = "2024-01-02", "2024-01-04"
    direct = hll_registers(
        df.filter(F.date_format("ts", "yyyy-MM-dd").between(d0, d1)), _key()
    )
    assert _regs(st.registers_for_range(d0, d1)) == _regs(direct)
    # full-range merge too
    assert _regs(st.registers_for_range("2024-01-01", "2024-01-05")) == _regs(
        hll_registers(df, _key())
    )


def test_admit_matches_full_build_and_is_idempotent(spark, tmp_path):
    rows = _rows(300)
    base, batch = rows[:200], rows[200:]
    st = HLLStore(spark, str(tmp_path / "incr"))
    st.build(_df(spark, base), _key())
    st.admit(_df(spark, batch), _key())

    full = HLLStore(spark, str(tmp_path / "full"))
    full.build(_df(spark, rows), _key())

    def table(s):
        return {
            (r["day"], r["bucket"], r["register"])
            for r in s.daily().collect()
        }

    assert table(st) == table(full)
    # replay: max-merge is idempotent by algebra — same table after
    st.admit(_df(spark, batch), _key())
    assert table(st) == table(full)


def test_admit_rewrites_only_touched_days(spark, tmp_path):
    """Delta-proportional IO: a batch touching one day hardlinks every
    other day partition from the base snapshot (same inodes)."""
    st = HLLStore(spark, str(tmp_path / "hl"))
    st.build(_df(spark, _rows(300)), _key())
    base = st._table._current_version_dir()
    one_day = [
        (1000, dt.datetime(2024, 1, 3, 12, 0), 9999),
        (1001, dt.datetime(2024, 1, 3, 13, 0), 9998),
    ]
    st.admit(_df(spark, one_day), _key())
    new = st._table._current_version_dir()

    def inodes(vdir, day):
        d = os.path.join(vdir, f"day={day}")
        if not os.path.isdir(d):
            return set()
        return {
            os.stat(os.path.join(d, f)).st_ino
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    days = {
        e.split("=", 1)[1] for e in os.listdir(base) if e.startswith("day=")
    }
    assert len(days) > 1
    for day in days - {"2024-01-03"}:
        assert inodes(new, day) == inodes(base, day)
    assert inodes(new, "2024-01-03").isdisjoint(inodes(base, "2024-01-03"))


def test_range_read_is_partition_pruned(spark, tmp_path):
    import re

    from affinity_spark.plans.introspect import formatted_plan

    st = HLLStore(spark, str(tmp_path / "pp"))
    st.build(_df(spark, _rows(300)), _key())
    q = st.daily().filter(F.col("day").between("2024-01-02", "2024-01-03"))
    q.collect()
    plan = formatted_plan(q)
    m = re.search(r"PartitionFilters: \[(?P<f>[^\]]*)\]", plan)
    assert m and "day" in m.group("f"), plan


def test_streaming_maintainer_matches_direct_build(spark, tmp_path):
    rows = _rows(240)
    st = HLLStore(spark, str(tmp_path / "m"))
    st.build(_df(spark, rows[:120]), _key())

    src = str(tmp_path / "in")
    os.makedirs(src, exist_ok=True)
    for i, chunk in enumerate([rows[120:180], rows[180:]]):
        tmp = os.path.join(src, f".c{i}.tmp")
        with open(tmp, "w") as f:
            for eid, ts, uid in chunk:
                f.write(json.dumps({
                    "event_id": eid, "ts": ts.isoformat(), "user_id": uid
                }) + "\n")
        dest = os.path.join(src, f"c{i}.json")
        os.rename(tmp, dest)
        os.utime(dest, (1_700_000_000 + i,) * 2)

    q = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long")
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .writeStream.foreachBatch(st.maintainer(_key()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    full = HLLStore(spark, str(tmp_path / "full"))
    full.build(_df(spark, rows), _key())
    assert {
        (r["day"], r["bucket"], r["register"]) for r in st.daily().collect()
    } == {
        (r["day"], r["bucket"], r["register"]) for r in full.daily().collect()
    }


def test_estimate_state_is_exact_integers(spark, tmp_path):
    st = HLLStore(spark, str(tmp_path / "est"))
    st.build(_df(spark, _rows(300)), _key())
    row = st.estimate_state("2024-01-01", "2024-01-05").collect()[0]
    regs = {r["bucket"]: r["register"] for r in
            st.registers_for_range("2024-01-01", "2024-01-05").collect()}
    assert row["n_buckets"] == len(regs)
    assert row["sum_registers"] == sum(regs.values())
    assert row["harmonic_num"] == sum(1 << (53 - r) for r in regs.values())


# --- KMVStore: the min-merge corner of the sketch-algebra triangle ----------


def test_kmv_range_sketch_equals_direct_sketch(spark, tmp_path):
    """Per-day k-min merging is EXACT vs sketching the raw range (every
    range-k-min hash is within its own day's k smallest) — the
    mergeability theorem the store's read path rests on."""
    from affinity_spark.operators.sketch_store import KMVStore
    from affinity_spark.operators.sketches import kmv_sketch

    rows = _rows(600)
    df = _df(spark, rows)
    st = KMVStore(spark, str(tmp_path / "kmv"), k=16)
    st.build(df, _key())
    d0, d1 = "2024-01-02", "2024-01-04"
    direct = kmv_sketch(
        df.filter(F.date_format("ts", "yyyy-MM-dd").between(d0, d1))
        .withColumn("_g", F.lit(1)),
        ["_g"],
        _key(),
        k=16,
    ).collect()[0]["kmv"]
    got = [r["h"] for r in st.sketch_for_range(d0, d1).collect()]
    assert got == list(direct)


def test_kmv_admit_matches_build_and_replay_is_free(spark, tmp_path):
    """Incremental admit == full build over the union, and re-admitting
    the same batch changes nothing — min-merge idempotence BY ALGEBRA
    (no fences, the HLL contract; contrast DDStore's fenced addition)."""
    from affinity_spark.operators.sketch_store import KMVStore

    rows = _rows(500)
    base, batch = rows[:350], rows[350:]
    st = KMVStore(spark, str(tmp_path / "inc"), k=16)
    st.build(_df(spark, base), _key())
    st.admit(_df(spark, batch), _key())
    full = KMVStore(spark, str(tmp_path / "full"), k=16)
    full.build(_df(spark, rows), _key())

    def days(s):
        return {(r["day"], r["h"]) for r in s.daily().collect()}

    assert days(st) == days(full)
    st.admit(_df(spark, batch), _key())  # replay: no markers needed
    assert days(st) == days(full)


def test_kmv_admit_hardlinks_untouched_days(spark, tmp_path):
    """Delta-proportional IO: days the batch does not touch hardlink
    forward (same inodes); touched days rewrite."""
    from affinity_spark.operators.sketch_store import KMVStore

    st = KMVStore(spark, str(tmp_path / "hl"), k=16)
    st.build(_df(spark, _rows(400)), _key())
    base_dir = st._table._current_version_dir()

    def inodes(vdir, day):
        d = os.path.join(vdir, f"day={day}")
        if not os.path.isdir(d):
            return set()
        return {
            os.stat(os.path.join(d, f)).st_ino
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    batch = _df(
        spark,
        [(9000 + i, dt.datetime(2024, 1, 3, 6), 100000 + i) for i in range(30)],
    )
    base = {
        e.split("=")[1]: inodes(base_dir, e.split("=")[1])
        for e in os.listdir(base_dir)
        if e.startswith("day=")
    }
    st.admit(batch, _key())
    new_dir = st._table._current_version_dir()
    for day, ino in base.items():
        if day == "2024-01-03":
            assert inodes(new_dir, day).isdisjoint(ino)  # fresh rewrite
        else:
            assert inodes(new_dir, day) == ino  # hardlinked


def test_kmv_overlap_estimate_matches_python_twin(spark, tmp_path):
    """The served overlap row reproduces the inclusion-exclusion math
    computed straight from the two range sketches in python."""
    from affinity_spark.operators.sketch_store import KMVStore

    KMV_M = 1 << 32
    st = KMVStore(spark, str(tmp_path / "ov"), k=16)
    st.build(_df(spark, _rows(600)), _key())
    a0, a1, b0, b1 = "2024-01-01", "2024-01-02", "2024-01-03", "2024-01-05"
    ka = [r["h"] for r in st.sketch_for_range(a0, a1).collect()]
    kb = [r["h"] for r in st.sketch_for_range(b0, b1).collect()]

    def est(kv):
        if len(kv) < 16:
            return len(kv)
        return (15 * KMV_M) // max(kv[15], 1)

    union = sorted(set(ka) | set(kb))[:16]
    want = (
        est(ka),
        est(kb),
        est(union),
        max(0, est(ka) + est(kb) - est(union)),
    )
    got = st.overlap_estimate(a0, a1, b0, b1).collect()[0]
    assert (got["est_a"], got["est_b"], got["est_union"],
            got["est_intersect"]) == want


def test_kmv_streaming_maintainer_matches_direct_build(spark, tmp_path):
    from affinity_spark.operators.sketch_store import KMVStore

    rows = _rows(300)
    st = KMVStore(spark, str(tmp_path / "m"), k=16)
    st.build(_df(spark, rows[:150]), _key())
    src = str(tmp_path / "in")
    os.makedirs(src, exist_ok=True)
    for i, chunk in enumerate([rows[150:220], rows[220:]]):
        tmp = os.path.join(src, f".c{i}.tmp")
        with open(tmp, "w") as f:
            for eid, ts, uid in chunk:
                f.write(json.dumps(
                    {"event_id": eid, "ts": ts.isoformat(), "user_id": uid}
                ) + "\n")
        dest = os.path.join(src, f"c{i}.json")
        os.rename(tmp, dest)
        os.utime(dest, (1_700_000_000 + i,) * 2)
    q = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long")
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .writeStream.foreachBatch(st.maintainer(_key()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    full = KMVStore(spark, str(tmp_path / "full"), k=16)
    full.build(_df(spark, rows), _key())
    assert {
        (r["day"], r["h"]) for r in st.daily().collect()
    } == {(r["day"], r["h"]) for r in full.daily().collect()}


def test_kmv_maintainer_scheduled_compaction_bounds_files(spark, tmp_path):
    """Scheduled maintainer compaction (r10 verdict #5): file count stays
    ~one per day dir across N batches; range reads unchanged (min-merge
    replay safety needs no fences, so only the physical layout moves)."""
    from affinity_spark.operators.sketch_store import KMVStore

    rows = _rows(300)
    st = KMVStore(spark, str(tmp_path / "kmc"), k=32)
    st.build(_df(spark, rows[:60]), _key())
    apply = st.maintainer(_key(), compact_every=4)
    for i in range(8):
        apply(_df(spark, rows[60 + 30 * i : 60 + 30 * (i + 1)]), i)
    stats = st._table.file_stats()
    n_days = st.daily().select("day").distinct().count()
    assert stats["n_files"] == n_days
    full = KMVStore(spark, str(tmp_path / "kmcfull"), k=32)
    full.build(_df(spark, rows), _key())
    assert {
        (r["day"], r["h"]) for r in st.daily().collect()
    } == {(r["day"], r["h"]) for r in full.daily().collect()}
