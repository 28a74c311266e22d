"""WebDataset shard export: content, reproducibility, stable assignment."""

import hashlib

from affinity_spark.operators.shards import (
    read_webdataset_shard,
    write_webdataset_shards,
)


def _docs(spark, n=40):
    return spark.createDataFrame(
        [(i, f"document number {i} body text") for i in range(n)],
        "doc_id long, text string",
    )


def test_shards_cover_all_docs_and_manifest_is_accurate(spark, tmp_path):
    out = str(tmp_path / "shards")
    manifest = write_webdataset_shards(_docs(spark), out, 4).collect()
    assert sum(r.n_docs for r in manifest) == 40
    seen = {}
    for r in manifest:
        entries = read_webdataset_shard(r.path)
        assert len(entries) == r.n_docs
        data = open(r.path, "rb").read()
        assert hashlib.md5(data).hexdigest() == r.md5
        assert len(data) == r.n_bytes
        for name, payload in entries:
            doc_id = int(name.split(".")[0])
            seen[doc_id] = payload.decode()
    assert seen == {i: f"document number {i} body text" for i in range(40)}


def test_shards_are_byte_reproducible(spark, tmp_path):
    m1 = {r.shard: r.md5 for r in
          write_webdataset_shards(_docs(spark), str(tmp_path / "a"), 3).collect()}
    m2 = {r.shard: r.md5 for r in
          write_webdataset_shards(_docs(spark), str(tmp_path / "b"), 3).collect()}
    assert m1 == m2


def test_shard_assignment_is_md5_stable(spark, tmp_path):
    manifest = write_webdataset_shards(_docs(spark), str(tmp_path / "c"), 4).collect()
    for r in manifest:
        for name, _ in read_webdataset_shard(r.path):
            doc_id = int(name.split(".")[0])
            want = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 4
            assert want == r.shard


def test_string_doc_ids_supported(spark, tmp_path):
    df = spark.createDataFrame(
        [("doc-a", "alpha"), ("doc-b", "beta")], "doc_id string, text string"
    )
    manifest = write_webdataset_shards(df, str(tmp_path / "s"), 2).collect()
    names = {n for r in manifest for n, _ in read_webdataset_shard(r.path)}
    assert names == {"doc-a.txt", "doc-b.txt"}
