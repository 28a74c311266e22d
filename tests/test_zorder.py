"""Z-order clustering: interleave correctness + the layout benefit
(per-file min/max envelopes tight in BOTH dimensions)."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from affinity_spark.functions.zorder import cluster_by_zorder, morton_interleave


def _morton_py(a: int, b: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_morton_matches_python_model(spark):
    rows = [(a, b) for a in (0, 1, 5, 255, 65535) for b in (0, 2, 7, 1000, 65535)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select("a", "b", morton_interleave(F.col("a"), F.col("b")).alias("z")).collect()
    }
    for (a, b), z in got.items():
        assert z == _morton_py(a, b), (a, b)


def test_morton_is_monotone_in_locality(spark):
    # neighbors in (a,b) space stay close in z space: the max z-distance
    # inside a 2x2 tile is bounded (property of bit interleaving)
    base = _morton_py(100, 200)
    for da in (0, 1):
        for db in (0, 1):
            assert abs(_morton_py(100 + da, 200 + db) - base) <= 3


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    """Write the same (a, b) grid twice: linearly ordered by a, and
    z-ordered. In the z-ordered layout the per-file envelope of EACH
    dimension must shrink vs the worst case, so min/max stats can skip
    files for predicates on either column; the linear layout only ever
    prunes on a."""
    n = 64
    rows = [(a, b, a * n + b) for a in range(n) for b in range(n)]
    df = spark.createDataFrame(rows, "a long, b long, v long")

    lin_dir = str(tmp_path / "linear")
    df.repartitionByRange(16, F.col("a")).write.parquet(lin_dir)
    z_dir = str(tmp_path / "zorder")
    cluster_by_zorder(df, F.col("a"), F.col("b"), 16).drop("_z").write.parquet(z_dir)

    def max_envelope(path: str, col: str) -> int:
        worst = 0
        for f in glob.glob(f"{path}/part-*.parquet"):
            stats = spark.read.parquet(f).agg(
                F.min(col).alias("lo"), F.max(col).alias("hi")
            ).collect()[0]
            worst = max(worst, stats["hi"] - stats["lo"])
        return worst

    # b is unclustered in the linear layout: every file spans ~the full range
    assert max_envelope(lin_dir, "b") >= n - 1
    # z-order: both dimensions bounded well below the full range
    assert max_envelope(z_dir, "a") <= n // 2
    assert max_envelope(z_dir, "b") <= n // 2
