"""Unicode text-class validation (functions/textclass.py — the
reference's api/.../util/Text.java utility): the TextTest.java matrix
re-run against BOTH the python (unicodedata) and the Column (JVM regex)
forms, plus the require() gateway-guard semantics."""

import pytest
from pyspark.sql import functions as F

from affinity_spark.functions import textclass as tc

FULLTEXT_SOUP = (
    " <>~.,|\\/-+/*#()[]{}_\"\r\n\t:;!?^&@%¢$£1234567890١٢٣٤٥٦٧٨٩a\n"
    "AľľščťžýáíéτσιαιγολοχβςανنيرحبالтерабX"
)
LITERAL_SOUP = (
    "()[]{}<>\"'.,-+*\\/#_:;!?&@%¢$£1234567890١٢٣٤٥٦٧٨٩aA"
    "ľľščťžýáíéτσιαιγολοχβςανنيرحبالтераб"
)


def test_python_matrix_mirrors_reference():
    # fulltext: any unicode text, control chars rejected
    assert tc.is_("fulltext", FULLTEXT_SOUP)
    for c in (0, 1, 2, 3):
        assert not tc.is_("fulltext", chr(c))
    # literal: unicode without whitespace; filter is identity on it
    assert tc.is_("literal", LITERAL_SOUP)
    assert tc.filter_("literal", LITERAL_SOUP) == LITERAL_SOUP
    for ws in ("\r", "\n", "\t", " "):
        assert not tc.is_("literal", ws)
    # nominal: letters/accents/dash-apostrophe family only, no digits
    assert tc.is_("nominal", "Aľľščťžýáíéτσιαιγολοχβςανтераб-'–‘’‛′")
    for d in "123456789":
        assert not tc.is_("nominal", d)
    # numeral accepts unicode digits; decimal is ASCII-only
    assert tc.is_("numeral", "١٢٣456")
    assert tc.is_("decimal", "0123456789")
    assert not tc.is_("decimal", "١٢٣")
    # plaintext: currency symbols in, other symbols and tabs out
    assert tc.is_("plaintext", "price $5.99 or £3")
    assert not tc.is_("plaintext", "tab\there")
    # empty string belongs to no class; unknown class is loud
    assert not tc.is_("fulltext", "")
    with pytest.raises(ValueError):
        tc.is_("nosuch", "x")


def test_require_guard_semantics():
    assert tc.require("name", "nominal", "O'Brien-Smith") == "O'Brien-Smith"
    with pytest.raises(ValueError, match="name"):
        tc.require("name", "nominal", "DROP TABLE;")
    assert tc.filter_("plaintext", "ab\tc\x01d") == "abcd"


def test_column_forms_agree_with_python(spark):
    samples = [
        FULLTEXT_SOUP, LITERAL_SOUP, "hello world", "12345", "tab\there",
        "line\nfeed", "ctrl\x01char", "price $5.99", "a_b-c", "O'Brien",
        "dash–dash", "x  y", "símbolo ©", "", "العربية", "日本語テスト",
        # the r13 ADVICE divergence probes: \x1c-\x1f (Cc separators) and
        # \x85 (NEL) are NOT Java \s — fulltext must reject them in BOTH
        # forms; \x0b/\x0c ARE Java \s and must pass in both
        "fs\x1c", "gs\x1d", "rs\x1e", "us\x1f", "nel\x85",
        "vtab\x0bhere", "ff\x0chere",
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(samples)], "i long, s string"
    )
    for kind in tc.SETS:
        got = {
            r["i"]: bool(r["m"])
            for r in df.select(
                "i", F.coalesce(tc.is_class(kind, F.col("s")), F.lit(False)).alias("m")
            ).collect()
        }
        want = {i: tc.is_(kind, s) for i, s in enumerate(samples)}
        assert got == want, kind
    # filter_class strips exactly what the python filter strips
    stripped = df.select(
        "i", tc.filter_class("plaintext", F.col("s")).alias("f")
    ).collect()
    for r in stripped:
        assert r["f"] == tc.filter_("plaintext", samples[r["i"]])
