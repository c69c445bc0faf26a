"""Document ingest with the reference's type-widening lattice
(jx_python/meta.py:232-331 _merge_type; jx_sqlite/insert_table.py:204-337
flatten_many), plus container update/delete
(jx_python/containers/list_usingPythonList.py:103,121).

Widening order: null < boolean < integer < number < string. Objects merge
field-wise; an array's element type widens like a scalar; scalar + array
-> array of the widened element (jx_sqlite _nest_column analog,
snowflake.py:148). Unlike jx_sqlite there are no physical child tables to
migrate — the merged schema IS the nested Spark schema, so schema
evolution is a createDataFrame + unionByName(allowMissingColumns=True).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class IngestError(ValueError):
    pass


_ORDER = ["null", "boolean", "integer", "number", "string"]

# value_compare kind classes (jx.py:614-627 TYPE_ORDER): merging across
# classes is LOSSY (the reference widens only the column METADATA and
# keeps values dynamically typed), within a class it is exact
_KIND = {"boolean": "boolean", "integer": "number", "number": "number", "string": "string"}


def _merge_scalar(a: str, b: str, preserve: bool = False) -> Any:
    if preserve and _KIND[a] != _KIND[b]:
        # cross-kind merge: keep both original types as a variant column
        # (see functions/variants.py) instead of coercing values
        return {"mixed": sorted({_KIND[a], _KIND[b]})}
    return _ORDER[max(_ORDER.index(a), _ORDER.index(b))]


def _jtype(value: Any) -> Any:
    """JSON type descriptor: scalar name | {"object": {field: desc}} |
    {"array": desc}."""
    if value is None:
        return "null"
    if isinstance(value, bool):
        return "boolean"
    if isinstance(value, int):
        return "integer"
    if isinstance(value, float):
        return "number"
    if isinstance(value, str):
        return "string"
    if isinstance(value, dict):
        return {"object": {k: _jtype(v) for k, v in value.items()}}
    if isinstance(value, (list, tuple)):
        elem = "null"
        for v in value:
            elem = merge_type(elem, _jtype(v))
        return {"array": elem}
    raise IngestError(f"cannot ingest value of type {type(value).__name__}: {value!r}")


def merge_type(a: Any, b: Any, preserve: bool = False) -> Any:
    """The widening lattice (meta.py:232-331). With ``preserve``,
    cross-kind scalar merges produce a {"mixed": [kinds]} variant
    descriptor instead of widening values to string — the reference's
    observable behavior (values keep their dynamic types; only the
    column metadata widens)."""
    if a == "null":
        return b
    if b == "null":
        return a
    a_mix = isinstance(a, dict) and "mixed" in a
    b_mix = isinstance(b, dict) and "mixed" in b
    if a_mix or b_mix:
        ka = set(a["mixed"]) if a_mix else {_KIND[a]} if isinstance(a, str) else None
        kb = set(b["mixed"]) if b_mix else {_KIND[b]} if isinstance(b, str) else None
        if ka is None or kb is None:
            raise IngestError(f"cannot merge mixed with non-scalar: {a!r} vs {b!r}")
        return {"mixed": sorted(ka | kb)}
    a_obj = isinstance(a, dict) and "object" in a
    b_obj = isinstance(b, dict) and "object" in b
    a_arr = isinstance(a, dict) and "array" in a
    b_arr = isinstance(b, dict) and "array" in b
    if a_obj and b_obj:
        fields = dict(a["object"])
        for k, v in b["object"].items():
            fields[k] = merge_type(fields.get(k, "null"), v, preserve)
        return {"object": fields}
    if a_arr or b_arr:
        ea = a["array"] if a_arr else a
        eb = b["array"] if b_arr else b
        return {"array": merge_type(ea, eb, preserve)}  # scalar+array -> array(widened)
    if a_obj or b_obj:
        raise IngestError(f"cannot merge object with scalar: {a!r} vs {b!r}")
    return _merge_scalar(a, b, preserve)


_SPARK_TYPES = {
    "null": T.StringType(),  # all-null column: harmless default
    "boolean": T.BooleanType(),
    "integer": T.LongType(),
    "number": T.DoubleType(),
    "string": T.StringType(),
}


def _to_spark_type(desc: Any) -> T.DataType:
    if isinstance(desc, str):
        return _SPARK_TYPES[desc]
    if "mixed" in desc:
        from mysql_to_s3_spark.functions.variants import VARIANT_TYPE

        return VARIANT_TYPE
    if "object" in desc:
        return T.StructType(
            [T.StructField(k, _to_spark_type(v), True) for k, v in sorted(desc["object"].items())]
        )
    return T.ArrayType(_to_spark_type(desc["array"]), True)


def _coerce(value: Any, desc: Any) -> Any:
    """Widen a value to the merged type (int->float->str etc.)."""
    if isinstance(desc, dict) and "mixed" in desc:
        # variant (b, n, s) tuple; missing = all-null, keeping the struct
        # itself non-null so sort keys skip outer-null handling
        if value is None:
            return (None, None, None)
        if isinstance(value, bool):
            return (value, None, None)
        if isinstance(value, (int, float)):
            return (None, float(value), None)
        if isinstance(value, str):
            return (None, None, value)
        raise IngestError(f"cannot store {value!r} in a mixed scalar column")
    if value is None:
        return None
    if isinstance(desc, str):
        if desc == "number" and isinstance(value, (int, bool)) and not isinstance(value, bool):
            return float(value)
        if desc == "string" and not isinstance(value, str):
            v = value
            if isinstance(v, bool):
                return "true" if v else "false"
            if isinstance(v, float) and v.is_integer():
                return str(int(v))
            return str(v)
        return value
    if "object" in desc:
        if not isinstance(value, dict):
            raise IngestError(f"expected object, got {value!r}")
        return tuple(_coerce(value.get(k), v) for k, v in sorted(desc["object"].items()))
    # array
    if not isinstance(value, (list, tuple)):
        value = [value]  # scalar widened into array (nest-column analog)
    return [_coerce(v, desc["array"]) for v in value]


def infer_schema(docs: list[dict], preserve: bool = False) -> Any:
    desc: Any = "null"
    for d in docs:
        if not isinstance(d, dict):
            raise IngestError(f"documents must be objects, got {d!r}")
        desc = merge_type(desc, _jtype(d), preserve)
    if desc == "null":
        desc = {"object": {}}
    return desc


def ingest_docs(
    spark: SparkSession,
    docs: list[dict],
    schema_desc: Any | None = None,
    on_conflict: str = "widen",
) -> DataFrame:
    """Documents -> DataFrame with the lattice-widened schema.

    ``on_conflict`` governs cross-kind scalar clashes: "widen" coerces
    values up the lattice to one Spark type (schema-first, the scalable
    default); "preserve" stores them as variant structs keeping the
    original dynamic types — the reference's observable semantics, with
    value_compare sort parity (functions/variants.py)."""
    preserve = on_conflict == "preserve"
    desc = (
        merge_type(infer_schema(docs, preserve), schema_desc, preserve)
        if schema_desc
        else infer_schema(docs, preserve)
    )
    spark_schema = _to_spark_type(desc)
    rows = [_coerce(d, desc) for d in docs]
    return spark.createDataFrame(rows, spark_schema)


def insert_docs(df: DataFrame, docs: list[dict], on_conflict: str = "widen") -> DataFrame:
    """Schema-evolving insert: new fields appear, shared fields widen
    (insert_table.py:204 flatten_many analog)."""
    spark = df.sparkSession
    new = ingest_docs(spark, docs, on_conflict=on_conflict)
    if _compatible(df, new):
        return df.unionByName(new, allowMissingColumns=True)
    # incompatible scalar types: DISTRIBUTED re-cast — merge the two spark
    # schemas through the widening lattice, cast BOTH sides column-wise to
    # the merged schema, then union. Never collects the container (the old
    # re-ingest fallback pulled every row to the driver: OOM at scale).
    preserve = on_conflict == "preserve"
    desc = merge_type(_desc_from_spark(df.schema), _desc_from_spark(new.schema), preserve)
    return _cast_to(df, desc).unionByName(_cast_to(new, desc))


def _compatible(a: DataFrame, b: DataFrame) -> bool:
    ta = {f.name: f.dataType for f in a.schema.fields}
    tb = {f.name: f.dataType for f in b.schema.fields}
    return all(ta[k] == tb[k] for k in set(ta) & set(tb))


def _desc_from_spark(dtype: T.DataType) -> Any:
    """Spark type -> widening-lattice descriptor (inverse of
    _to_spark_type; only lattice types occur in ingested containers)."""
    if isinstance(dtype, T.NullType):
        return "null"
    if isinstance(dtype, T.BooleanType):
        return "boolean"
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "integer"
    if isinstance(dtype, (T.FloatType, T.DoubleType, T.DecimalType)):
        return "number"
    if isinstance(dtype, T.StringType):
        return "string"
    if isinstance(dtype, T.StructType):
        from mysql_to_s3_spark.functions.variants import is_variant_type

        if is_variant_type(dtype):
            return {"mixed": ["boolean", "number", "string"]}
        return {"object": {f.name: _desc_from_spark(f.dataType) for f in dtype.fields}}
    if isinstance(dtype, T.ArrayType):
        return {"array": _desc_from_spark(dtype.elementType)}
    raise IngestError(f"cannot widen non-lattice type {dtype.simpleString()}")


def _cast_col(col: F.Column, src: T.DataType, desc: Any) -> F.Column:
    """Column-algebra analog of _coerce: widen ``col`` (type ``src``) to
    the merged descriptor, matching the driver-side coercions exactly
    (integral doubles render '7' not '7.0'; booleans 'true'/'false')."""
    target = _to_spark_type(desc)
    if isinstance(desc, str):
        if desc == "string" and isinstance(src, (T.FloatType, T.DoubleType)):
            as_long = col.cast("long")
            return F.when(
                col.isNotNull() & (col == as_long.cast(src)), as_long.cast("string")
            ).otherwise(col.cast("string"))
        return col.cast(target)
    if "mixed" in desc:
        from mysql_to_s3_spark.functions import variants

        if variants.is_variant_type(src):
            return col
        kind = _desc_from_spark(src)
        if not isinstance(kind, str):
            raise IngestError(f"cannot store {src.simpleString()} in a mixed scalar column")
        return variants.variant_of(col, kind)
    if "object" in desc:
        if not isinstance(src, T.StructType):
            raise IngestError(f"expected struct, got {src.simpleString()}")
        have = {f.name: f.dataType for f in src.fields}
        fields = [
            _cast_col(col.getField(k), have[k], v).alias(k)
            if k in have
            else F.lit(None).cast(_to_spark_type(v)).alias(k)
            for k, v in sorted(desc["object"].items())
        ]
        return F.when(col.isNotNull(), F.struct(*fields))
    # array target: scalar source nests into a 1-element array (NULL stays
    # NULL, not [NULL]) — the jx_sqlite _nest_column analog
    elem = desc["array"]
    if isinstance(src, T.ArrayType):
        return F.transform(col, lambda v: _cast_col(v, src.elementType, elem))
    return F.when(col.isNotNull(), F.array(_cast_col(col, src, elem)))


def _cast_to(df: DataFrame, desc: Any) -> DataFrame:
    have = {f.name: f.dataType for f in df.schema.fields}
    return df.select(
        *[
            _cast_col(F.col(k), have[k], v).alias(k)
            if k in have
            else F.lit(None).cast(_to_spark_type(v)).alias(k)
            for k, v in sorted(desc["object"].items())
        ]
    )


# ---------------------------------------------------------------------------
# container update / delete (Container.update, list_usingPythonList.py:103)


def update_container(df: DataFrame, command: dict) -> DataFrame:
    """{"set": {col: jx_expr}, "clear": [col...], "where": jx_expr} ->
    new DataFrame (immutable analog of in-place update; write.mode
    ('overwrite') persists it)."""
    from mysql_to_s3_spark.functions.compiler import Schema, compile_expression

    schema = Schema.from_spark(df.schema)
    where = command.get("where", True)
    cond = (
        F.lit(True)
        if where is True
        else F.coalesce(compile_expression(where, schema).col.cast("boolean"), F.lit(False))
    )
    out = df
    for col, expr in (command.get("set") or {}).items():
        new_val = compile_expression(expr, schema).col
        out = out.withColumn(col, F.when(cond, new_val).otherwise(F.col(col)))
    for col in command.get("clear") or []:
        out = out.withColumn(col, F.when(cond, F.lit(None)).otherwise(F.col(col)))
    return out


def delete_rows(df: DataFrame, where) -> DataFrame:
    from mysql_to_s3_spark.functions.compiler import Schema, compile_expression

    schema = Schema.from_spark(df.schema)
    cond = F.coalesce(compile_expression(where, schema).col.cast("boolean"), F.lit(False))
    return df.filter(~cond)
