"""Unicode hygiene operator (functions/unicode_clean.py): mojibake repair,
control strip, NFC composition, per-fix counters — crafted cases the
synthetic corpus can't exercise, cross-checked against DuckDB's replay."""

import duckdb
import pytest
from pyspark.sql import functions as F

from affinity_spark.functions.unicode_clean import (
    CONTROL_PATTERN,
    MOJIBAKE_RULES,
    unicode_scrub,
)


def _scrub_rows(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    s = unicode_scrub(F.col("text"))
    out = df.select(
        "id",
        s["clean"].alias("clean"),
        s["n_mojibake"].alias("n_mojibake"),
        s["n_ctrl"].alias("n_ctrl"),
        s["nfc_changed"].alias("nfc_changed"),
    )
    return {r["id"]: r for r in out.collect()}


def test_every_rule_repairs_and_counts(spark):
    texts = [f"x {bad} y" for bad, _ in MOJIBAKE_RULES]
    got = _scrub_rows(spark, texts)
    for i, (bad, good) in enumerate(MOJIBAKE_RULES):
        r = got[i]
        assert r["clean"] == f"x {good} y", (bad, good, r["clean"])
        assert r["n_mojibake"] == 1
        assert r["n_ctrl"] == 0


def test_control_strip_keeps_tab_newline_cr(spark):
    got = _scrub_rows(spark, ["a\x00b\x07c\td\ne\rf\x7fg"])
    r = got[0]
    assert r["clean"] == "ab" + "c\td\ne\rf" + "g"
    assert r["n_ctrl"] == 3  # NUL, BEL, DEL


def test_nfc_composes_and_flags(spark):
    # e + combining acute composes; plain ascii unchanged
    got = _scrub_rows(spark, ["café", "cafe"])
    assert got[0]["clean"] == "café" and got[0]["nfc_changed"] == 1
    assert got[1]["clean"] == "cafe" and got[1]["nfc_changed"] == 0


def test_scrub_is_idempotent(spark):
    dirty = "é Ã© \x07 â€™ plain"
    once = _scrub_rows(spark, [dirty])[0]
    twice = _scrub_rows(spark, [once["clean"]])[0]
    assert twice["clean"] == once["clean"]
    assert twice["n_mojibake"] == 0
    assert twice["n_ctrl"] == 0
    assert twice["nfc_changed"] == 0


def test_chained_artifact_counter_contract(spark):
    """The documented pathological case: repairing 'â€œ' -> '“' creates a
    new 'â€“' artifact spanning the repair boundary. The chain repairs it
    (later rule runs after earlier), the counter sees only the INPUT's
    artifacts — and DuckDB's replay agrees on BOTH, which is the
    cross-engine contract that matters."""
    dirty = "â€â€œ"  # â€ + (â€œ) -> after quote repair: â€“ -> en dash
    got = _scrub_rows(spark, [dirty])[0]
    rep = "t"
    for bad, good in MOJIBAKE_RULES:
        rep = f"replace({rep}, '{bad}', '{good}')"
    duck_clean, duck_n = duckdb.sql(
        f"SELECT nfc_normalize(regexp_replace({rep}, '{CONTROL_PATTERN}', '', 'g')), "
        + "CAST("
        + " + ".join(
            f"(length(t) - length(replace(t, '{bad}', ''))) // {len(bad)}"
            for bad, _ in MOJIBAKE_RULES
        )
        + " AS BIGINT) FROM (SELECT 'â€â€œ' AS t)"
    ).fetchone()
    assert got["clean"] == duck_clean
    assert got["n_mojibake"] == duck_n == 1  # input holds ONE artifact (â€œ)


@pytest.mark.parametrize(
    "text",
    ["", " ", "é already composed", "mixed Ã© and é and \x1f"],
)
def test_cross_engine_agreement(spark, text):
    got = _scrub_rows(spark, [text])[0]
    rep = "t"
    for bad, good in MOJIBAKE_RULES:
        rep = f"replace({rep}, '{bad}', '{good}')"
    con = duckdb.connect()
    con.execute(
        f"SELECT nfc_normalize(regexp_replace({rep}, '{CONTROL_PATTERN}', '', 'g')) "
        "FROM (SELECT ? AS t)",
        [text],
    )
    assert got["clean"] == con.fetchone()[0]
