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
