"""CSV/TSV ingestion: same dead-letter contract as the JSONL source —
clean rows flow, malformed rows route, counts reconcile."""

from __future__ import annotations

from affinity_spark.sources.csv_source import read_csv, split_corrupt


def test_csv_corrupt_rows_are_dead_lettered(spark, tmp_path):
    p = str(tmp_path / "shard.csv")
    lines = [
        "1,alpha beta,en",
        "not-a-number,gamma,en",  # type mismatch -> corrupt
        "2,delta,de",
        "3,epsilon,fr",
    ]
    with open(p, "w") as f:
        f.write("\n".join(lines) + "\n")

    df = read_csv(spark, p, "doc_id BIGINT, text STRING, lang STRING").cache()
    try:
        clean, dead = split_corrupt(df)
        got = {r.doc_id: (r.text, r.lang) for r in clean.collect()}
        assert got == {1: ("alpha beta", "en"), 2: ("delta", "de"), 3: ("epsilon", "fr")}
        raws = [r.raw_line for r in dead.collect()]
        assert raws == ["not-a-number,gamma,en"]
        assert clean.count() + dead.count() == len(lines)
    finally:
        df.unpersist()


def test_tsv_and_header(spark, tmp_path):
    p = str(tmp_path / "shard.tsv")
    with open(p, "w") as f:
        f.write("doc_id\ttext\n7\thello world\n8\tbye\n")
    df = read_csv(spark, p, "doc_id BIGINT, text STRING", sep="\t", header=True).cache()
    try:
        clean, dead = split_corrupt(df)
        assert {r.doc_id: r.text for r in clean.collect()} == {7: "hello world", 8: "bye"}
        assert dead.count() == 0
    finally:
        df.unpersist()
