"""Avro Object Container File (OCF) ingestion without the spark-avro jar.

The reference's universal wire format is Avro (SURVEY §1; serde core
``avro/src/main/scala/io/amient/affinity/avro/record/AvroSerde.scala``), and
its data lands on disk as standard ``.avro`` container files. Spark's
built-in reader lives in the spark-avro jar, absent from this environment —
so this source parses the container format (spec: Apache Avro 1.11, "Object
Container Files") in pure python on top of the repo's own binary codec
(``functions/avro_binary.py``): magic ``Obj\\x01``, metadata map carrying
``avro.schema`` / ``avro.codec``, 16-byte sync marker, then blocks of
``(count, byte-size, data, sync)`` with null or deflate (raw zlib) codecs.

Distribution model: ``spark.read.format("binaryFile")`` ships each file to
an executor and an Arrow-batched ``mapInPandas`` decodes its blocks — the
split unit is the FILE (OCF blocks are not independently seekable without
reading the header), so parallelism = file count. That is the honest
trade at 100 TB: Avro ingest lands many files (one per producer/partition/
roll), which is exactly the layout this reader parallelizes over; the
decoded output is immediately rewritten columnar (parquet/ORC) and all
downstream reads are splittable scans.

Schema contract: the Spark output schema is EXPLICIT (never inferred — a
full inference pass over 100 TB is the anti-pattern ``sources/csv_source``
documents), and an optional Avro reader schema applies writer→reader
resolution per file (aliases, defaults, promotions) via ``resolve_datum``,
so mixed-writer-version file sets decode to one shape. Corrupt files are
dead-lettered to ``_corrupt_file`` rows, never silently dropped.
"""

from __future__ import annotations

import json
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from affinity_spark.functions.avro_binary import (
    decode_datum,
    parse_schema,
    resolve_datum,
)

OCF_MAGIC = b"Obj\x01"


def parse_ocf(data: bytes) -> tuple[dict, list]:
    """Parse one container file: returns (metadata, records)."""
    if data[:4] != OCF_MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    meta_schema = {"type": "map", "values": "bytes"}
    meta, pos = decode_datum(meta_schema, data, 4)
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro codec {codec!r}")
    writer_schema = parse_schema(meta["avro.schema"].decode())
    sync = data[pos : pos + 16]
    pos += 16
    records = []
    n = len(data)
    while pos < n:
        count, pos = decode_datum("long", data, pos)
        size, pos = decode_datum("long", data, pos)
        block = data[pos : pos + size]
        pos += size
        if data[pos : pos + 16] != sync:
            raise ValueError("sync marker mismatch (truncated/corrupt block)")
        pos += 16
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        bpos = 0
        for _ in range(count):
            rec, bpos = decode_datum(writer_schema, block, bpos)
            records.append(rec)
    return {"schema": writer_schema, "codec": codec}, records


def write_ocf(path: str, schema_json: str, records: list, codec: str = "null") -> None:
    """Write a container file (test/fixture helper — batch writes at scale
    go straight to columnar formats)."""
    from affinity_spark.functions.avro_binary import encode_datum

    schema = parse_schema(schema_json)
    meta = {"avro.schema": schema_json.encode(), "avro.codec": codec.encode()}
    sync = bytes(range(16))
    out = bytearray(OCF_MAGIC)
    out += encode_datum({"type": "map", "values": "bytes"}, meta)
    out += sync
    if records:
        block = bytearray()
        for r in records:
            block += encode_datum(schema, r)
        payload = bytes(block)
        if codec == "deflate":
            co = zlib.compressobj(wbits=-15)
            payload = co.compress(payload) + co.flush()
        out += encode_datum("long", len(records))
        out += encode_datum("long", len(payload))
        out += payload
        out += sync
    with open(path, "wb") as f:
        f.write(bytes(out))


def read_avro_files(
    spark: SparkSession,
    path: str,
    spark_schema: str,
    reader_schema_json: str | None = None,
) -> DataFrame:
    """Read a directory of ``.avro`` container files into a DataFrame.

    ``spark_schema`` is the explicit output schema (flat record fields);
    ``reader_schema_json``, when given, applies writer→reader resolution so
    files written under older/newer schema versions all decode to the
    reader shape. Returns the union schema plus a ``_corrupt_file`` column:
    rows from unparseable files carry the file path there and nulls
    elsewhere (the JSONL/CSV dead-letter contract).
    """
    out_schema = f"{spark_schema}, _corrupt_file string"
    field_names = [
        f.name for f in spark.createDataFrame([], out_schema).schema.fields
    ]
    reader = parse_schema(reader_schema_json) if reader_schema_json else None

    files = spark.read.format("binaryFile").load(path)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                # a file is all-or-nothing: its rows are staged locally and
                # land only if the WHOLE file decodes — otherwise one bad
                # record mid-file would emit partial rows AND a dead-letter
                # row for the same file (double counting on repair/retry)
                file_rows = []
                try:
                    info, recs = parse_ocf(bytes(content))
                    if reader is not None:
                        recs = [
                            resolve_datum(info["schema"], reader, r) for r in recs
                        ]
                    for r in recs:
                        row = {k: r.get(k) for k in field_names[:-1]}
                        row["_corrupt_file"] = None
                        file_rows.append(row)
                except Exception:
                    row = {k: None for k in field_names[:-1]}
                    row["_corrupt_file"] = fpath
                    file_rows = [row]
                rows.extend(file_rows)
            yield pd.DataFrame(rows, columns=field_names)

    return files.mapInPandas(decode, out_schema)
