"""Auto-sized hive-bucket lever shared by the maintained-index families.

The delta-IO admit contract (PostingsIndex / BandIndex / PrefixIndex /
ClusterStore) holds only in the regime **batch << buckets and buckets ∝
corpus**: an admit rewrites ~min(batch, buckets) partition dirs of
corpus/buckets rows each, so with a FIXED small bucket count the
per-bucket size grows with the corpus and a constant batch approaches a
full rewrite (BASELINE r11k measured 9.0× rewritten bytes at 10× corpus
under the old ``doc_buckets=8`` default — the anti-pattern regime;
buckets ∝ corpus measured 1.06×).

This module makes the lever automatic (r11 verdict #1):

- :func:`auto_bucket_count` sizes the count ∝ corpus at ``build()``
  (power of two for stable growth steps, floored so tiny local corpora
  keep the old default);
- each store COMMITS the chosen count in its table meta and always
  resolves the committed value for admits/probes — bucket placement is
  a function of the count, so the committed rows' count is the only
  correct one regardless of what a re-attaching constructor was told;
- ``needs_rebucket()`` fires when the corpus has outgrown the committed
  count (the IVFIndex ``needs_retrain`` discipline) and ``rebucket()``
  is the amortized full rewrite that re-freezes the lever.

At deployment scale the same ∝-corpus rule applies with a larger
``rows_per_bucket`` so each bucket is a few hundred MB; the constant
cancels out of the rewrite RATIO, which is what the rehearsal
(``tools/autobucket_rehearsal.py``) pins ≤ ~1.2 at 10× with defaults.
"""

from __future__ import annotations


def auto_bucket_count(
    n_rows: int,
    rows_per_bucket: int = 64,
    min_buckets: int = 8,
    max_buckets: int = 1 << 20,
) -> int:
    """Bucket count ∝ ``n_rows``: the next power of two holding
    ``rows_per_bucket`` rows per bucket, clamped to [min, max].

    Power-of-two steps keep growth-triggered rebuckets coarse (a count
    that crept +1 per admit would rewrite the whole table for nothing);
    the floor keeps tiny corpora on the historical local default."""
    if n_rows < 0:
        raise ValueError(f"n_rows must be >= 0, got {n_rows}")
    need = max(1, -(-n_rows // max(1, rows_per_bucket)))
    return max(min_buckets, min(max_buckets, 1 << (need - 1).bit_length()))


def bytes_floor_cap(
    n_bytes: int, min_bucket_bytes: int = 256 << 10, min_buckets: int = 8
) -> int:
    """Upper bound on a USEFUL bucket count for a table of ``n_bytes``.

    Rewrite granularity is a parquet file: below ~``min_bucket_bytes``
    per bucket a finer split cannot reduce real admit IO (each bucket is
    already a single tiny file) — it only multiplies per-read file opens
    and footer parses. The r12 auto lever sized the sf0.1 postings index
    into 128 × 5–15 KB files and DOUBLED the retrieval family's read
    walls (bm25 1.4 → 2.8 s measured, r13); the ∝-corpus growth law is
    kept ABOVE this floor, where buckets are at least row-group-sized and
    the delta-IO contract is physically real. pow2 floor so the cap
    composes with :func:`auto_bucket_count`'s pow2 steps."""
    if n_bytes <= min_bucket_bytes * min_buckets:
        return min_buckets
    need = max(1, n_bytes // min_bucket_bytes)
    return max(min_buckets, 1 << (need.bit_length() - 1))


def committed_buckets(table, meta_key: str, explicit: int | None) -> int:
    """The effective bucket count for operations on an EXISTING store.

    The committed count always wins over the constructor's — the
    committed rows were PLACED under it, and a partition-pruned merge
    computed under any other count rewrites the wrong dirs while
    hardlinking the stale ones (the r5 BandIndex silent-stale-rows
    failure, now impossible to reintroduce by attaching with a different
    constructor arg). Falls back to ``explicit`` then the historical
    default (8) for tables committed before the count was stamped."""
    committed = table.commit_meta().get(meta_key)
    if committed is not None:
        return int(committed)
    return explicit if explicit is not None else 8
