"""Tagged-union column encoding (sealed-trait Avro unions → Spark).

The reference maps sealed traits with ``@Union(i)``-ordered subclasses to
Avro unions (``avro/.../record/AvroRecord.scala:42-44,462-477``). Spark has
no native union type (SURVEY §7 hard part 2), so the engine's convention is
a **tagged struct of variants**: one ``_tag`` string column plus one
nullable struct per variant, exactly one non-null. These helpers build,
inspect and match such columns so user code never touches the encoding.

At scale the encoding is columnar-friendly: variant structs are sparse
nullable columns (parquet stores only definition levels for the nulls), and
``_tag`` predicates prune by dictionary filter.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def make_union(variants: Mapping[str, Column | None], tag: Column | str) -> Column:
    """Build a union value: ``variants`` maps variant name -> struct column
    (or None when that variant is impossible in this expression); ``tag``
    selects which variant is live."""
    tag_col = F.lit(tag) if isinstance(tag, str) else tag
    fields = [tag_col.alias("_tag")]
    for name, col in variants.items():
        if col is None:
            fields.append(F.lit(None).alias(name))
        else:
            fields.append(F.when(tag_col == name, col).alias(name))
    return F.struct(*fields)


def union_tag(union: Column) -> Column:
    return union.getField("_tag")


def union_get(union: Column, variant: str) -> Column:
    """The variant struct (NULL when the union holds another variant)."""
    return union.getField(variant)


def union_is(union: Column, variant: str) -> Column:
    return union.getField("_tag") == variant


def match_union(union: Column, cases: Mapping[str, Column], default: Column | None = None) -> Column:
    """Exhaustive-by-convention match: ``cases`` maps variant name -> result
    expression (which may reference ``union_get(union, name)``)."""
    expr = None
    for name, result in cases.items():
        cond = union_is(union, name)
        expr = F.when(cond, result) if expr is None else expr.when(cond, result)
    if default is not None:
        expr = expr.otherwise(default)
    return expr


def split_by_variant(df: DataFrame, union_col: str) -> dict[str, DataFrame]:
    """One DataFrame per variant, with the live variant struct flattened —
    the relational normal form of a union column (process each variant with
    its own plan, union the results back)."""
    utype = df.schema[union_col].dataType
    variant_names = [f.name for f in utype.fields if f.name != "_tag"]
    out = {}
    for name in variant_names:
        out[name] = (
            df.filter(union_is(F.col(union_col), name))
            .withColumn(f"_{name}", union_get(F.col(union_col), name))
            .drop(union_col)
            .withColumnRenamed(f"_{name}", name)
        )
    return out
