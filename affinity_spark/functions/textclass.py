"""Unicode text-class validation — the reference's ``Text`` utility
(``api/src/main/java/io/amient/affinity/core/util/Text.java:1-100``)
re-expressed for both worlds it serves here:

- COLUMN forms (:func:`is_class`, :func:`filter_class`) — JVM-side
  regex (``rlike`` / ``regexp_replace`` with Java unicode property
  classes, whole-stage codegen, no UDF) for corpus hygiene at scale:
  "which documents are fulltext-clean", "strip non-plaintext from this
  field";
- PYTHON forms (:func:`is_`, :func:`filter_`, :func:`require`) — the
  gateway-edge input guards (the reference's ``Text.require`` pattern in
  ``examples/example-auth-methods/.../PrivateApi.scala``), implemented
  over stdlib ``unicodedata`` categories so driver-side validation needs
  no regex engine at all.

Class semantics mirror the reference's sets exactly (clean-room from the
public source + its test matrix, ``TextTest.java``):

=========  ==================================================================
fulltext   letters, marks, numbers, separators, punctuation, symbols,
           plus Java's ``\\s`` whitespace EXACTLY (space ``\\t \\n \\x0B
           \\f \\r``) — all other control characters (incl. \\x1c-\\x1f,
           NEL \\x85) are rejected, matching ``Text.java``
literal    letters, marks, numbers, punctuation, symbols — NO whitespace
plaintext  letters, marks, numbers, separators, punctuation, currency
           symbols — no tabs/line feeds/controls, no non-currency symbols
alphanum   letters, marks, numbers, ``-`` and ``_``
nominal    letters, marks, dash/apostrophe family (``- ' ‘ ’ ‛ ′ – —``)
numeral    unicode numbers
decimal    ASCII digits 0-9 only
control    control/format characters (the complement filter: what
           ``fulltext`` rejects)
=========  ==================================================================
"""

from __future__ import annotations

import unicodedata

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Java-regex character-set body per class (what goes inside ``[...]``),
#: usable verbatim in Spark ``rlike``/``regexp_replace`` and (same
#: syntax) DuckDB's RE2.
SETS: dict[str, str] = {
    # whitespace spelled EXPLICITLY as Java's \s set ([ \t\n\x0B\f\r]):
    # a bare \s means different sets to Java (no \x85) and DuckDB's RE2
    # (no \x0B), so both engines must compile the identical class (r13
    # ADVICE)
    "fulltext": "\\p{L}\\p{M}\\p{N}\\p{Z}\\p{P}\\p{S} \\t\\n\\x0B\\f\\r",
    "literal": r"\p{L}\p{M}\p{N}\p{P}\p{S}",
    "plaintext": r"\p{L}\p{M}\p{N}\p{Z}\p{P}\p{Sc}",
    "alphanum": r"\p{L}\p{M}\p{N}\-_",
    "nominal": "\\p{L}\\p{M}\\-'‘’‛′–—",
    "numeral": r"\p{N}",
    "decimal": "0-9",
    "control": r"\p{C}",
}

#: unicodedata major-category letters backing each class python-side,
#: plus explicit extra characters. Categories map 1:1 to the regex
#: property classes: L/M/N/Z/P/S/C.
_CATS: dict[str, tuple[str, str]] = {
    # extras = Java's \s EXACTLY; \x1c-\x1f and \x85 are category Cc/Cf
    # which the reference's Text.java (and the column form) reject —
    # including them here made the gateway edge admit control characters
    # the corpus predicate refuses (r13 ADVICE)
    "fulltext": ("LMNZPS", " \t\n\x0b\x0c\r"),
    "literal": ("LMNPS", ""),
    "plaintext": ("LMNZP", ""),  # symbols: currency only (special-cased)
    "alphanum": ("LMN", "-_"),
    "nominal": ("LM", "-'‘’‛′–—"),
    "numeral": ("N", ""),
    "decimal": ("", "0123456789"),
    "control": ("C", ""),
}


def _char_ok(kind: str, ch: str) -> bool:
    cats, extra = _CATS[kind]
    if ch in extra:
        return True
    cat = unicodedata.category(ch)
    if kind == "plaintext" and cat == "Sc":
        return True
    return cat[0] in cats


def is_(kind: str, s: str) -> bool:
    """True when the ENTIRE (non-empty) string belongs to the class —
    the reference's ``Text.is``."""
    if kind not in _CATS:
        raise ValueError(f"unknown text class {kind!r}")
    return bool(s) and all(_char_ok(kind, ch) for ch in s)


def filter_(kind: str, s: str) -> str:
    """Drop every character outside the class — ``Text.apply`` over the
    class's filter pattern."""
    if kind not in _CATS:
        raise ValueError(f"unknown text class {kind!r}")
    return "".join(ch for ch in s if _char_ok(kind, ch))


def require(field: str, kind: str, s: str) -> str:
    """``Text.require``: raise ``ValueError`` naming the field when the
    input falls outside the class; returns the input unchanged so guards
    compose inline."""
    if not is_(kind, s):
        raise ValueError(
            f"value of {field!r} contains characters outside the "
            f"{kind} class"
        )
    return s


def is_class(kind: str, col: Column) -> Column:
    """Column predicate: the whole string belongs to the class (JVM
    regex — codegen'd, no UDF). NULL stays NULL.

    Anchored with ``\\A``/``\\z``, not ``^``/``$``: Java's ``$`` matches
    BEFORE a final line terminator (\\n, \\r, NEL \\x85, \\u2028/9), so a
    ``^[...]+$`` form silently admits any string whose one illegal
    character is a trailing line terminator (r13 ADVICE probe)."""
    if kind not in SETS:
        raise ValueError(f"unknown text class {kind!r}")
    return col.rlike(f"\\A[{SETS[kind]}]+\\z")


def filter_class(kind: str, col: Column) -> Column:
    """Column transform: strip every character outside the class."""
    if kind not in SETS:
        raise ValueError(f"unknown text class {kind!r}")
    return F.regexp_replace(col, f"[^{SETS[kind]}]", "")
