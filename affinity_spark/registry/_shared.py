"""Shared registry helpers: table loader, money fixed-point, DuckDB CTE builders used by several query families.

Split from the single-file ``__spark_entry__.py`` registry (round 6):
one module per query family, each with its OWN helper namespace, so a
same-named oracle helper in another family can never silently clobber
this one's (the r3 ``_QUALITY_SQL`` collision trap). The driver contract
(``entry``/``queries``/``oracle_sql``) stays in ``__spark_entry__.py``
and references these modules by qualified name.

Cross-engine determinism rules (aliased aggregates, integer money/ratio
arithmetic, formatted timestamps, md5-derived text hashes) are inherited
from the original registry header — see ``__spark_entry__.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from affinity_spark.tables import load as load_table
from affinity_spark.operators import dedup as dd


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _cents(col):
    """Exact integer cents of a non-negative 2-decimal money expression.

    ``floor(x*100 + 0.5)`` is a single deterministic IEEE-double pipeline, so
    Spark and DuckDB produce bit-identical longs per row; summing longs is
    then order-independent (unlike summing doubles, which differs across
    engines by accumulation order).
    """
    return F.floor(col * 100 + F.lit(0.5))


def _duck_shingles_cte(n: int = 3) -> str:
    """DuckDB CTEs reproducing shingle_table(): (doc_id, shingle, h0)."""
    return f"""
d AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t FROM documents),
sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           range(1, greatest(len(t) - {n - 1}, 0) + 1),
           i -> array_to_string(t[i:i+{n - 1}], ' ')))) AS shingle
  FROM d WHERE len(t) >= {n}
),
h AS (SELECT doc_id, shingle,
             CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT) AS h0
      FROM sh)
"""


def _duck_lsh_bands_cte() -> str:
    """DuckDB CTEs reproducing the LSH banding over a prior
    ``h(doc_id, shingle, h0)`` CTE: sig → bands(doc_id, band_id, band_hash).

    Same md5-derived h0, LCG permutation constants and band hashing as the
    Spark side, so band buckets are bit-identical across engines.
    """
    sig_cols = ",\n       ".join(
        f"min(({a} * h0 + {b}) % {dd.MINHASH_P}) AS sig_{i}"
        for i, (a, b) in enumerate(dd.MINHASH_COEF)
    )
    band_selects = "\nUNION ALL\n".join(
        "SELECT doc_id, {band} AS band_id, md5({concat}) AS band_hash FROM sig".format(
            band=band,
            concat=" || '-' || ".join(
                f"CAST(sig_{band * dd.BAND_ROWS + r} AS VARCHAR)"
                for r in range(dd.BAND_ROWS)
            ),
        )
        for band in range(dd.NUM_BANDS)
    )
    return f"""
sig AS (SELECT doc_id, {sig_cols} FROM h GROUP BY doc_id),
bands AS ({band_selects})"""


def _duck_lsh_cand_cte() -> str:
    """:func:`_duck_lsh_bands_cte` + the distinct candidate-pair join:
    cand(id_a, id_b)."""
    return f"""{_duck_lsh_bands_cte()},
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
)"""
