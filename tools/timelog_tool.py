"""TimeLogTool analog (reference cli/src/main/scala/TimeLogTool.scala:66-120):
group a log's records into time blocks, print min/max/count per block and an
ASCII density plot — compaction/arrival analysis from the command line.

Usage: python tools/timelog_tool.py <parquet_path> <ts_col> [n_blocks]

Block bounds are printed in the column's own unit (seconds for timestamp
columns cast to long, raw integers — e.g. nanos — for numeric columns).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from affinity_spark import get_spark


def timelog_blocks(df, ts_col: str, n_blocks: int = 24):
    """(block_start, n, min_ts, max_ts) per equal-width time block — one
    aggregate pass (groupBy(window) analog with data-driven bounds)."""
    lo, hi = df.agg(
        F.min(F.col(ts_col).cast("long")), F.max(F.col(ts_col).cast("long"))
    ).collect()[0]
    width = max((hi - lo) // n_blocks + 1, 1)
    return (
        df.select((F.col(ts_col).cast("long")).alias("t"))
        .withColumn("block", ((F.col("t") - lo) / width).cast("int"))
        .groupBy("block")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("t").alias("min_ts"),
            F.max("t").alias("max_ts"),
        )
        .orderBy("block")
    ), lo, width


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__)
        raise SystemExit(2)
    path, ts_col = sys.argv[1], sys.argv[2]
    n_blocks = int(sys.argv[3]) if len(sys.argv) > 3 else 24
    spark = get_spark("timelog-tool")
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(path)
    blocks, lo, width = timelog_blocks(df, ts_col, n_blocks)
    rows = blocks.collect()
    peak = max(r.n for r in rows) if rows else 1
    print(f"{'block_start':>15} {'count':>8}  density")
    for r in rows:
        bar = "#" * max(1, round(40 * r.n / peak))
        print(f"{lo + r.block * width:>15} {r.n:>8}  {bar}")


if __name__ == "__main__":
    main()
