"""Composed end-to-end corpus pipelines.

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
from affinity_spark.cache import track as _track_cache
from affinity_spark.functions.text import doc_fingerprint, token_count
from affinity_spark.operators import dedup as dd

from affinity_spark.registry._shared import _duck_lsh_cand_cte, _t


def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LLM-pipeline ops COMPOSED end to end: quality filter (>= 10
    tokens) → exact dedup (keep min id per fingerprint) → near-dup removal
    via MinHash-LSH candidates + exact-Jaccard >= 1/2 verify (drop the
    higher id of each confirmed pair) → surviving (doc_id, n_tokens).

    This is the SCALE tier composed end to end: signatures are the
    zero-shuffle map-side array transform, candidates come from the LSH
    band join (bucket-sized, never the all-pairs shingle self-join — that
    tier lives in dedup_ngram_jaccard as the small-scale verifier), and
    the verify step touches candidate pairs only. The shingle arrays are
    materialized ONCE (persist — the RDD checkpoint path loses AQE/codegen) and shared by the signature and
    verify branches.
    """
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    scored = docs.select("doc_id", "text", token_count(F.col("text")).alias("n_tokens"))
    quality = scored.filter(F.col("n_tokens") >= 10)
    # Exact dedup as a window (keep min doc_id per fingerprint): one shuffle
    # on fp, no self-join — documents is scanned ONCE for the whole pipeline
    # (keepers is checkpointed and feeds both the LSH branch and the final
    # anti-join).
    w_fp = Window.partitionBy(doc_fingerprint(F.col("text"))).orderBy("doc_id")
    keepers = (
        quality.withColumn("rn", F.row_number().over(w_fp))
        .filter(F.col("rn") == 1)
        .drop("rn")
        .persist()
    )
    keepers = _track_cache(keepers)
    arrs = _track_cache(dd.doc_shingle_arrays(keepers, "doc_id", "text", 3).persist())
    cand = dd.lsh_candidate_pairs(dd.lsh_bands_mapside(arrs, "doc_id"), "doc_id")
    near_dups = dd.jaccard_verify_arrays(cand, arrs, "doc_id", 1, 2).select(
        F.col("id_b").alias("doc_id")
    ).distinct()
    clean = keepers.join(near_dups, "doc_id", "left_anti")
    return clean.select("doc_id", "n_tokens")


def _pipeline_oracle_sql() -> str:
    return f"""
WITH t AS (
  SELECT doc_id, text,
         len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), x -> x <> ''))
           AS n_tokens
  FROM documents
),
q AS (SELECT * FROM t WHERE n_tokens >= 10),
k AS (
  SELECT min(doc_id) AS doc_id
  FROM q GROUP BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
),
kd AS (SELECT q.* FROM q JOIN k USING (doc_id)),
d AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t FROM kd),
sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           range(1, greatest(len(t) - 2, 0) + 1),
           i -> array_to_string(t[i:i+2], ' ')))) AS shingle
  FROM d WHERE len(t) >= 3
),
h AS (SELECT doc_id, shingle,
             CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT) AS h0
      FROM sh),
{_duck_lsh_cand_cte()},
sizes AS (SELECT doc_id, count(*) AS n FROM h GROUP BY doc_id),
common AS (
  SELECT c.id_a, c.id_b, count(*) AS n_common
  FROM cand c
  JOIN h x ON x.doc_id = c.id_a
  JOIN h y ON y.doc_id = c.id_b AND y.shingle = x.shingle
  GROUP BY c.id_a, c.id_b
),
dups AS (
  SELECT DISTINCT id_b AS doc_id
  FROM common JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
  WHERE 2 * n_common >= (sa.n + sb.n - n_common)
)
SELECT doc_id, n_tokens FROM kd
WHERE doc_id NOT IN (SELECT doc_id FROM dups)
"""


def pipeline_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-side ops COMPOSED end to end: quality filter (>= 10
    tokens) -> exact dedup (min doc_id per content fingerprint, window on
    fp, no self-join) -> deterministic 90% train split (zero-shuffle md5
    bucket) -> concat-and-chunk packing into 2048-token context windows per
    source shard -> per-pack accounting.

    Two shuffles total: the fingerprint window and the shard window (the
    final groupBy reuses the shard partitioning). The split adds none —
    membership is a projection of doc_id. This is the batch a training
    loader would mount, produced by one declarative plan.
    """
    from pyspark.sql import Window

    from affinity_spark.operators.sampling import pack_sequences, train_split

    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "source", "text", token_count(F.col("text")).alias("n_tokens")
    )
    quality = scored.filter(F.col("n_tokens") >= 10)
    w_fp = Window.partitionBy(doc_fingerprint(F.col("text"))).orderBy("doc_id")
    keepers = (
        quality.withColumn("rn", F.row_number().over(w_fp))
        .filter(F.col("rn") == 1)
        .drop("rn", "text")
    )
    train = train_split(keepers, "doc_id").filter(F.col("split") == "train")
    packed = pack_sequences(train, "source", "doc_id", "n_tokens", 2048)
    return packed.groupBy("source", "pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("pack_tokens"),
    )


_TRAIN_PIPE_SQL = """
WITH t AS (
  SELECT doc_id, source, text,
         len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), x -> x <> ''))
           AS n_tokens
  FROM documents
),
q AS (SELECT * FROM t WHERE n_tokens >= 10),
k AS (
  SELECT min(doc_id) AS doc_id
  FROM q GROUP BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
),
kd AS (SELECT q.doc_id, q.source, q.n_tokens FROM q JOIN k USING (doc_id)),
tr AS (
  SELECT * FROM kd
  WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000 < 900
),
cum AS (
  SELECT source, n_tokens,
         (CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id ASC
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
          - n_tokens) // 2048 AS pack_id
  FROM tr
)
SELECT source, pack_id, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS pack_tokens
FROM cum
GROUP BY source, pack_id
"""


def pipeline_streaming_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED STREAMING ingest pipeline's batch twin as a driver
    query (streaming/pipeline.py::corpus_pipeline_replay): quality gate →
    first-arrival exact dedup → online-LSH near-dup verdicts (band-bucket
    state contract, 1024-member cap) → split labels. The streaming query
    itself is equivalence-pinned to this replay over ≥3 micro-batches in
    tests/test_streaming_pipeline.py; this entry makes the final sink
    semantics oracle-checkable by the driver. dup_of = -1 and split =
    'rejected' encode the nullable columns hash-safely."""
    from affinity_spark.streaming.pipeline import corpus_pipeline_replay

    docs = _t(spark, sf_dir, "documents")
    out = corpus_pipeline_replay(docs)
    return out.select(
        "doc_id",
        "n_tokens",
        F.coalesce(F.col("split"), F.lit("rejected")).alias("split"),
        F.coalesce(F.col("dup_of"), F.lit(-1)).cast("long").alias("dup_of"),
    )


def _streaming_replay_oracle_sql() -> str:
    from affinity_spark.registry._shared import (
        _duck_lsh_bands_cte,
        _duck_shingles_cte,
    )

    shingles_over_keepers = _duck_shingles_cte(3).replace(
        "FROM documents", "FROM kd"
    )
    return f"""
WITH t0 AS (
  SELECT doc_id, text,
         len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                         x -> x <> '')) AS n_tokens
  FROM documents
),
q AS (SELECT * FROM t0 WHERE n_tokens >= 10),
k AS (
  SELECT min(doc_id) AS doc_id
  FROM q GROUP BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
),
kd AS (SELECT q.* FROM q JOIN k USING (doc_id)),
{shingles_over_keepers.lstrip().lstrip(chr(10))},
{_duck_lsh_bands_cte()},
ranked AS (
  SELECT doc_id, band_id, band_hash,
         row_number() OVER (PARTITION BY band_id, band_hash ORDER BY doc_id) AS rk
  FROM bands
),
bp AS (
  SELECT DISTINCT a.doc_id AS dup_of, b.doc_id AS doc_id
  FROM ranked a
  JOIN bands b ON a.band_id = b.band_id AND a.band_hash = b.band_hash
              AND a.doc_id < b.doc_id
  WHERE a.rk <= 1024
),
sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nsh FROM h GROUP BY doc_id),
common AS (
  SELECT p.dup_of, p.doc_id, CAST(count(*) AS BIGINT) AS n_common
  FROM bp p
  JOIN h x ON x.doc_id = p.dup_of
  JOIN h y ON y.doc_id = p.doc_id AND y.shingle = x.shingle
  GROUP BY 1, 2
),
matches AS (
  SELECT c.doc_id, min(c.dup_of) AS dup_of
  FROM common c
  JOIN sizes sa ON sa.doc_id = c.dup_of
  JOIN sizes sb ON sb.doc_id = c.doc_id
  WHERE 2 * c.n_common >= (sa.nsh + sb.nsh - c.n_common)
  GROUP BY c.doc_id
),
lab AS (
  SELECT kd.doc_id, kd.n_tokens, m.dup_of,
         CAST(('0x' || substr(md5(CAST(kd.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
           % 1000 AS bucket
  FROM kd LEFT JOIN matches m USING (doc_id)
)
SELECT doc_id, n_tokens,
       CASE WHEN dup_of IS NOT NULL THEN 'rejected'
            WHEN bucket < 900 THEN 'train'
            WHEN bucket < 950 THEN 'val'
            ELSE 'test' END AS split,
       CAST(coalesce(dup_of, -1) AS BIGINT) AS dup_of
FROM lab
"""
