"""Product quantization (PQ) for embedding compression + ADC search.

The standard ANN memory-scale trick (Jégou et al. 2011, public): split each
d-dim vector into ``m`` subvectors, k-means each subspace separately, store
only the ``m`` centroid ids (codes) per vector — d floats become m bytes.
Search uses ADC (asymmetric distance): the query stays exact, a per-subspace
distance table to each centroid is computed ONCE, and a vector's
approximate distance is ``m`` table lookups + adds.

100 TB shape (complements ``operators/ivf.py``, which prunes WHICH vectors
to scan; PQ shrinks WHAT is stored/scanned):
- codebooks are model-sized (m * k centroids) — trained on a sample,
  broadcast as literals, the IVF-codebook contract;
- code assignment is map-side (argmin over literal centroids per
  subspace), zero shuffle;
- ADC search scans CODES (m ints per row), not raw vectors — the scan is
  m table lookups per row, the distance table is a literal array, and
  top-k is TakeOrderedAndProject, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from affinity_spark.operators.ivf import train_centroids


def _sq_dist_slice(vec, centroid: list[float], start: int):
    """Squared distance between vec[start:start+len(centroid)] (1-based
    slice) and a literal centroid."""
    sub = F.slice(vec, start + 1, len(centroid))
    cent = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(sub, cent, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def train_pq(
    emb: DataFrame,
    m: int,
    k: int,
    dim: int,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Per-subspace k-means codebooks: ``m`` independent trainings on the
    sliced subvectors (reuses the deterministic IVF Lloyd trainer)."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    d_sub = dim // m
    books = []
    for s in range(m):
        sub = emb.select(
            F.col(id_col),
            F.slice(F.col(vec_col).cast("array<double>"), s * d_sub + 1, d_sub).alias(
                "sub"
            ),
        )
        books.append(train_centroids(sub, k, n_iter, id_col, "sub"))
    return books


def assign_codes(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Map-side PQ encoding: per subspace, the argmin centroid id over the
    literal codebook (first index wins ties — both engines' list-position
    semantics). Output: id + ``code_0..code_{m-1}`` int columns."""
    vec = F.col(vec_col).cast("array<double>")
    cols = [F.col(id_col)]
    d_sub = len(codebooks[0][0])
    for s, book in enumerate(codebooks):
        dists = F.array(*[_sq_dist_slice(vec, c, s * d_sub) for c in book])
        cols.append((F.array_position(dists, F.array_min(dists)) - 1).cast("int").alias(f"code_{s}"))
    return emb.select(*cols)


def adc_search(
    emb_codes: DataFrame,
    codebooks: list[list[list[float]]],
    query: list[float],
    k: int,
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: the query's per-subspace
    distance table becomes a literal array, each row costs ``m`` lookups.
    Returns (id, adc_dist) ordered ascending, ties by id."""
    d_sub = len(codebooks[0][0])
    total = None
    for s, book in enumerate(codebooks):
        qsub = query[s * d_sub : (s + 1) * d_sub]
        table = [
            sum((x - y) ** 2 for x, y in zip(qsub, c)) for c in book
        ]
        lookup = F.element_at(
            F.array(*[F.lit(float(v)) for v in table]), F.col(f"code_{s}") + 1
        )
        total = lookup if total is None else total + lookup
    return (
        emb_codes.select(F.col(id_col), total.alias("adc_dist"))
        .orderBy(F.col("adc_dist").asc(), F.col(id_col).asc())
        .limit(k)
    )
