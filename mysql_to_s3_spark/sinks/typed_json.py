"""ES typed-JSON encoding (reference mo_json/typed_encoder.py:18-23,
untyping :34-71; encode side pyLibrary/env/typed_inserter.py:127-260).

Every value is wrapped in an object keyed by its type marker so a search
index can hold mixed-type fields side by side:

  True        -> {"~b~": true}
  3 / 3.5     -> {"~n~": 3}
  "x"         -> {"~s~": "x"}
  {"a": 1}    -> {"a": {"~n~": 1}, "~e~": 1}
  [1, "x"]    -> {"~N~": [{"~n~": 1}, {"~s~": "x"}], "~e~": 2}
  []          -> {"~N~": []}
  {} (empty)  -> {"~e~": 0}
  None        -> {}

Property names encode "." as "," (a literal "," escapes to "\\,") so
dotted keys survive path flattening (typed_encoder.py:26-31).

Spark mapping: the encoder is a per-document transform at the sink
boundary — it runs inside the same Arrow-batched ``mapInPandas`` stage as
the JSON-lines writer (zero shuffles, scales with partitions). Inside the
query engine mixed-type fields stay as variant structs
(functions/variants.py); typed JSON is only a wire format.
"""

from __future__ import annotations

import json
from typing import Any, Iterator

from pyspark.sql import DataFrame

TYPE_PREFIX = "~"
BOOLEAN_TYPE = TYPE_PREFIX + "b~"
NUMBER_TYPE = TYPE_PREFIX + "n~"
STRING_TYPE = TYPE_PREFIX + "s~"
NESTED_TYPE = TYPE_PREFIX + "N~"
EXISTS_TYPE = TYPE_PREFIX + "e~"


class TypedEncodeError(ValueError):
    pass


def encode_property(name: str) -> str:
    return name.replace(",", "\\,").replace(".", ",")


def decode_property(encoded: str) -> str:
    return encoded.replace("\\,", "\a").replace(",", ".").replace("\a", ",")


def untype_path(encoded: str) -> str:
    """Strip typed markers from a dotted path ('a.~n~' -> 'a')."""
    parts = [decode_property(c) for c in encoded.split(".") if c and not c.startswith(TYPE_PREFIX)]
    return ".".join(parts) or "."


def _marker_of(v: Any) -> str:
    if isinstance(v, bool):
        return BOOLEAN_TYPE
    if isinstance(v, (int, float)):
        return NUMBER_TYPE
    if isinstance(v, (str, bytes)):
        return STRING_TYPE
    raise TypedEncodeError(f"cannot typed-encode {type(v).__name__}")


def typed_encode(value: Any) -> Any:
    """Python-value -> typed-JSON value (typed_inserter.py:127-260):

    - dict properties with None/"" values are skipped (:345-347); a dict
      with surviving keys carries ``~e~: 1``, otherwise ``~e~: 0``
    - a list containing any container encodes as ``~N~`` with each
      element typed + ``~e~: count`` (:308-318)
    - a list of same-typed primitives is a MULTIVALUE: Nones dropped, a
      singleton collapses to the bare scalar under its type marker, and
      mixed primitive types are an error (:234-250)
    """
    if value is None:
        return {}
    if isinstance(value, bool):
        return {BOOLEAN_TYPE: value}
    if isinstance(value, (int, float)):
        return {NUMBER_TYPE: value}
    if isinstance(value, bytes):
        return {STRING_TYPE: value.decode("utf8")}
    if isinstance(value, str):
        return {STRING_TYPE: value}
    if isinstance(value, dict):
        out = {}
        for k in sorted(value, key=str):
            v = value[k]
            if v is None or v == "":
                continue
            out[encode_property(str(k))] = typed_encode(v)
        out[EXISTS_TYPE] = 1 if out else 0
        return out
    if isinstance(value, (list, tuple, set)):
        items = list(value)
        if not items:
            return {NESTED_TYPE: []}
        if any(isinstance(v, (dict, list, tuple, set)) for v in items):
            return {NESTED_TYPE: [typed_encode(v) for v in items], EXISTS_TYPE: len(items)}
        items = [v for v in items if v is not None]
        if not items:
            return {NESTED_TYPE: []}
        markers = {_marker_of(v) for v in items}
        if len(markers) > 1:
            raise TypedEncodeError("cannot typed-encode multi-typed multivalues")
        marker = markers.pop()
        return {marker: items[0] if len(items) == 1 else items}
    raise TypedEncodeError(f"cannot typed-encode {type(value).__name__}")


def untyped(value: Any) -> Any:
    """Typed-JSON value -> plain value (typed_encoder.py:52-71): drop
    ``~e~`` markers, unwrap the single typed property, recurse through
    objects and arrays. As in the reference, ``{}`` (the encode of None)
    unwraps to an empty object — None-ness is not representable."""
    if isinstance(value, dict):
        out = {}
        for k, v in value.items():
            if k == EXISTS_TYPE:
                continue
            if k.startswith(TYPE_PREFIX):
                return untyped(v) if k == NESTED_TYPE else v
            out[decode_property(k)] = untyped(v)
        return out
    if isinstance(value, list):
        return [untyped(v) for v in value]
    return value


def write_typed_json_lines(
    df: DataFrame,
    path: str,
    fact_name: str,
    gzip: bool = False,
    mode: str = "overwrite",
) -> None:
    """Distributed typed-JSON-lines write: the doc struct column
    ``fact_name`` is scrubbed (json_sink semantics) then typed-encoded
    inside one Arrow-batched mapInPandas stage. 100 TB story: identical
    to write_json_lines — per-partition streaming, no shuffle, no
    driver materialization."""
    from pyspark.sql import types as T

    from mysql_to_s3_spark.sinks.json_sink import scrub

    def to_lines(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            lines = []
            for rec in pdf.to_dict(orient="records"):
                doc = scrub(rec[fact_name])
                lines.append(json.dumps(typed_encode(doc), sort_keys=True, default=str))
            yield pd.DataFrame({"value": lines})

    out = df.mapInPandas(to_lines, T.StructType([T.StructField("value", T.StringType())]))
    writer = out.write.mode(mode)
    if gzip:
        writer = writer.option("compression", "gzip")
    writer.text(path)
