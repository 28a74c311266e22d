"""Footer-stats manifest + pruned point reads on KeyedTable."""

from __future__ import annotations

import json
import os

from affinity_spark.sources.keyed_table import KeyedTable


def _table(spark, tmp_path, **kw):
    return KeyedTable(spark, str(tmp_path / "kt"), ["k"], "ts", **kw)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, ts long, v string")


def test_manifest_covers_all_files_and_rows(spark, tmp_path):
    t = _table(spark, tmp_path, num_buckets=8)
    t.upsert(_df(spark, [(i, i, f"v{i}") for i in range(64)]))
    m = t.write_manifest()
    assert len(m["files"]) == 8
    assert sum(e["rows"] for e in m["files"]) == 64
    for e in m["files"]:
        assert "k" in e["stats"]
        lo, hi = e["stats"]["k"]
        assert 0 <= lo <= hi <= 63


def test_pruned_read_matches_full_read_and_skips_files(spark, tmp_path):
    t = _table(spark, tmp_path, num_buckets=8)
    t.upsert(_df(spark, [(i, i, f"v{i}") for i in range(64)]))
    m = t.write_manifest()
    for key in (0, 17, 63):
        got = t.read_pruned({"k": key}).collect()
        want = t.get({"k": key}).collect()
        assert [(r.k, r.ts, r.v) for r in got] == [(r.k, r.ts, r.v) for r in want]
    # pruning is real: some key's envelope excludes most files
    matching = [
        len([e for e in m["files"]
             if e["stats"]["k"][0] <= k <= e["stats"]["k"][1]])
        for k in range(64)
    ]
    assert min(matching) < len(m["files"])


def test_pruned_read_out_of_range_key_opens_nothing(spark, tmp_path):
    t = _table(spark, tmp_path, num_buckets=4)
    t.upsert(_df(spark, [(i, i, "x") for i in range(10)]))
    t.write_manifest()
    assert t.read_pruned({"k": 999}).count() == 0


def test_pruned_read_without_manifest_falls_back(spark, tmp_path):
    t = _table(spark, tmp_path, num_buckets=4)
    t.upsert(_df(spark, [(1, 1, "a"), (2, 2, "b")]))
    vdir = t._current_version_dir()
    assert not os.path.exists(os.path.join(vdir, "_manifest.json"))
    assert [r.v for r in t.read_pruned({"k": 2}).collect()] == ["b"]


def test_manifest_survives_compaction_workflow(spark, tmp_path):
    t = _table(spark, tmp_path, num_buckets=8)
    t.upsert(_df(spark, [(i, i, "x") for i in range(32)]))
    t.compact(target_file_bytes=1 << 30)
    m = t.write_manifest()  # re-manifest the compacted snapshot
    assert len(m["files"]) == 1
    path = os.path.join(t._current_version_dir(), "_manifest.json")
    assert json.load(open(path))["version"] == m["version"]
    assert t.read_pruned({"k": 31}).count() == 1
