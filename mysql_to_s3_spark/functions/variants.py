"""Mixed-type ("variant") column support: the Spark-native analog of the
reference's dynamically-typed values.

The reference widens column METADATA to string when scalar types conflict
(vendor/jx_python/meta.py:232-331 _merge_type) but never coerces stored
VALUES — its in-memory rows stay Python-typed, so sorting compares with
value_compare's TYPE_ORDER (vendor/jx_python/jx.py:562-627: boolean 0 <
number 1 < string 2 < ... < null 9). A Spark column holds exactly one
type, so preserving that observable behavior needs a typed-struct
encoding — one nullable field per scalar kind, exactly one non-null
(the same idea as ES typed JSON columns, mysql_to_s3's target encoding):

    struct<b: boolean, n: double, s: string>

Sorting a variant compiles to a STRUCT sort key (type_rank, b, n, s) —
Spark orders structs field-wise, which reproduces value_compare's
(rank, value) total order in one JVM comparison, shuffle-compatible and
whole-stage-codegen'd. No Python comparators anywhere, so the 100 TB
range-partitioned sort path (global orderBy) is unaffected.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# field order fixes the in-struct layout; rank values match TYPE_ORDER
# (jx.py:614-627): boolean 0, number 1, string 2, missing 9
VARIANT_FIELDS = (("b", T.BooleanType()), ("n", T.DoubleType()), ("s", T.StringType()))

VARIANT_TYPE = T.StructType([T.StructField(k, t, True) for k, t in VARIANT_FIELDS])


def is_variant_type(dtype: T.DataType) -> bool:
    return isinstance(dtype, T.StructType) and [f.name for f in dtype.fields] == [
        k for k, _ in VARIANT_FIELDS
    ]


def variant_of(col: Column, kind: str) -> Column:
    """Wrap a single-typed column as a variant. ``kind`` is the lattice
    scalar name. NULL input produces the all-null (missing, rank 9)
    variant, not a NULL struct, so sort keys never need outer-null
    handling."""
    b = col.cast("boolean") if kind == "boolean" else F.lit(None).cast("boolean")
    n = (
        col.cast("double")
        if kind in ("integer", "number")
        else F.lit(None).cast("double")
    )
    s = col.cast("string") if kind == "string" else F.lit(None).cast("string")
    return F.struct(b.alias("b"), n.alias("n"), s.alias("s"))


def type_rank(v: Column) -> Column:
    """TYPE_ORDER rank of a variant value (jx.py:614-627)."""
    return (
        F.when(v.getField("b").isNotNull(), F.lit(0))
        .when(v.getField("n").isNotNull(), F.lit(1))
        .when(v.getField("s").isNotNull(), F.lit(2))
        .otherwise(F.lit(9))
    )


def sort_key(v: Column) -> Column:
    """value_compare total order as ONE struct sort key: Spark compares
    structs field-wise, so (rank, b, n, s) == (type_rank, value) pairs.
    Within a rank only that rank's field is ever non-null, so the later
    fields never influence the order."""
    return F.struct(
        type_rank(v).alias("r"),
        v.getField("b").alias("b"),
        v.getField("n").alias("n"),
        v.getField("s").alias("s"),
    )


def variant_python_value(row_value) -> object:
    """Collected struct -> the original Python value (driver-side shaping
    for format_list parity)."""
    if row_value is None:
        return None
    for k, _ in VARIANT_FIELDS:
        v = row_value[k] if not hasattr(row_value, k) else getattr(row_value, k)
        if v is not None:
            return v
    return None
