"""JX expression JSON -> pyspark.sql.Column compiler.

Implements the ~60-operator expression algebra of the reference
(vendor/jx_base/expressions.py:2775-2844 `operators` registry; semantics per
SURVEY.md §2.6), emitting Catalyst Column trees instead of exec'd Python
source (the reference's jx_python/expression_compiler.py:27-62).

JX null semantics, encoded at compile time (no custom Catalyst rules):

  - ``missing(x)`` is ``x IS NULL`` — OR ``x = ''`` when x is a string
    (reference MissingOp @1877; ES treats "" as missing, scrub drops "").
  - ``eq`` is null-safe: eq(null, null) = TRUE (EqOp @953, partial_eval @999).
  - ``and``/``or``: missing terms act as FALSE (AndOp compiles to a Python
    ``and`` chain where None is falsy, jx_python/expressions.py:208-213;
    OrOp likewise).
  - binary arithmetic: NULL if either side missing, unless a ``default``
    clause is given; division by zero -> default/NULL (BinaryOp @794, DivOp).
  - n-ary ``add``/``mul`` ignore nulls unless ``"nulls": false``; all-null ->
    ``default`` (MultiOp @1717).

Every compile returns a :class:`Compiled` carrying the value Column, the
inferred JX type, and a ``missing`` Column so parent operators can compose
null predicates exactly like the reference's per-op ``missing()`` methods
(jx_base/expressions.py:207-213).

"Simple form" ``{"op": {"field": literal}}`` and variable/literal shorthand
are normalized here, mirroring Expression.define (expressions.py:142-186).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# canonical JX types (reference vendor/jx_base/__init__.py:27-38)
IS_NULL = "null"
BOOLEAN = "boolean"
INTEGER = "integer"
NUMBER = "number"
TIME = "time"
STRING = "string"
OBJECT = "object"
NESTED = "nested"
ARRAY = "array"  # multi-valued scalar (ArrayType(primitive))
UNKNOWN = "unknown"

_NUMERIC = {INTEGER, NUMBER, TIME}


@dataclass
class Compiled:
    """A compiled JX expression: value column + type + missing predicate.

    ``_filter`` is the FILTER-CONTEXT form of a boolean expression: the
    raw (nullable) Spark predicate without the missing->FALSE coalesce
    wrapper. In ``df.filter`` a NULL predicate drops the row exactly like
    FALSE, so the row set is identical — but the raw predicate reaches the
    parquet reader as a pushed-down filter, while ``coalesce(p, false)``
    never does. Use ``fcol`` in filter positions, ``col`` when the boolean
    is PROJECTED as a value (where JX demands FALSE, not NULL).

    ``_time_source`` carries the raw time column (+ its Spark type name)
    through ``unix()`` so comparisons against date literals can be folded
    back onto the scan column (pushdown survives).
    """

    col: Column
    jxtype: str = UNKNOWN
    _missing: Column | None = None
    _filter: Column | None = None
    spark_type: str | None = None
    _time_source: "tuple[Column, str | None] | None" = None

    @property
    def fcol(self) -> Column:
        return self._filter if self._filter is not None else self.col

    @property
    def missing(self) -> Column:
        """JX missing(): NULL, or empty string for strings (MissingOp @1877)."""
        if self._missing is not None:
            return self._missing
        if self.jxtype == STRING:
            return self.col.isNull() | (self.col == F.lit(""))
        if self.jxtype == IS_NULL:
            return F.lit(True)
        return self.col.isNull()

    @property
    def exists(self) -> Column:
        return ~self.missing


class Schema:
    """Column-name -> JX type lookup built from a Spark schema.

    Resolves dotted paths through StructType nesting the way the reference's
    ``nested_path`` columns do (vendor/jx_base/__init__.py:244-264).
    """

    def __init__(self, types: Mapping[str, str] | None = None, columns: list[str] | None = None):
        self.types = dict(types or {})
        self.columns = list(columns or [])  # top-level column order (OffsetOp)

    @classmethod
    def from_spark(cls, schema: T.StructType) -> "Schema":
        out: dict[str, str] = {}

        spark_types: dict[str, str] = {}

        def walk(prefix: str, st: T.StructType) -> None:
            for f in st.fields:
                name = f"{prefix}{f.name}"
                out[name] = _spark_to_jx(f.dataType)
                spark_types[name] = f.dataType.simpleString()
                dt = f.dataType
                if isinstance(dt, T.StructType):
                    walk(name + ".", dt)
                elif isinstance(dt, T.ArrayType) and isinstance(dt.elementType, T.StructType):
                    walk(name + ".", dt.elementType)

        walk("", schema)
        s = cls(out, columns=[f.name for f in schema.fields])
        s.spark_types = spark_types
        return s

    def type_of(self, name: str) -> str:
        return self.types.get(name, UNKNOWN)

    def spark_type_of(self, name: str) -> str | None:
        return getattr(self, "spark_types", {}).get(name)


def _spark_to_jx(dt: T.DataType) -> str:
    if isinstance(dt, T.BooleanType):
        return BOOLEAN
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return INTEGER
    if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        return NUMBER
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return TIME
    if isinstance(dt, T.StringType):
        return STRING
    if isinstance(dt, T.StructType):
        return OBJECT
    if isinstance(dt, T.ArrayType):
        return NESTED if isinstance(dt.elementType, T.StructType) else ARRAY
    return UNKNOWN


def _merge_types(*ts: str) -> str:
    """Type-widening lattice (reference jx_python/meta.py:232-331)."""
    out = IS_NULL
    order = [IS_NULL, BOOLEAN, INTEGER, TIME, NUMBER, STRING, UNKNOWN]
    for t in ts:
        if t == UNKNOWN:
            return UNKNOWN
        if order.index(t) > order.index(out):
            out = t
    return out


# ---------------------------------------------------------------------------


class JXError(ValueError):
    pass


def compile_expression(expr: Any, schema: Schema | None = None) -> Compiled:
    """Compile a JX expression (JSON) to a :class:`Compiled` Column."""
    return _Compiler(schema or Schema()).compile(expr)


class _Compiler:
    def __init__(self, schema: Schema):
        self.schema = schema

    # -- entry ---------------------------------------------------------------

    def compile(self, expr: Any) -> Compiled:
        if expr is None:
            return Compiled(F.lit(None), IS_NULL, F.lit(True))
        if isinstance(expr, bool):
            return Compiled(F.lit(expr), BOOLEAN, F.lit(False))
        if isinstance(expr, (int, float)):
            return Compiled(F.lit(expr), INTEGER if isinstance(expr, int) else NUMBER, F.lit(False))
        if isinstance(expr, str):
            return self.variable(expr)
        if isinstance(expr, dict):
            return self.compile_op(expr)
        if isinstance(expr, list):
            # bare list = tuple of expressions (TupleOp @742)
            return self.op_tuple([self.compile(e) for e in expr])
        raise JXError(f"cannot compile JX expression: {expr!r}")

    def compile_op(self, expr: dict) -> Compiled:
        clauses = {"default", "nulls", "separator", "start", "prefix", "suffix", "percentile", "then", "else"}
        ops = [k for k in expr if k not in clauses]
        if not ops:
            # prefix/suffix are operators on their own, clauses only under `between`
            ops = [k for k in expr if k in ("prefix", "suffix")]
        if len(ops) != 1:
            raise JXError(f"expected exactly one operator key in {expr!r}")
        op = ops[0]
        term = expr[op]
        method = getattr(self, "op_" + op.replace(".", "_"), None)
        if method is None:
            raise JXError(f"unknown JX operator {op!r}")
        return method(term, expr)

    # -- leaves ---------------------------------------------------------------

    def variable(self, name: str) -> Compiled:
        if name == ".":
            raise JXError("whole-row variable '.' must be handled by the executor")
        jxtype = self.schema.type_of(name)
        # an EXACT top-level column wins over path parsing: F.col("a.b")
        # parses as field b of struct a (and a backtick in the name is a
        # syntax error), so a variable that literally names an existing
        # column — a dotted select alias, a window output, anything a
        # user renamed — is referenced backtick-quoted. Only when no
        # top-level column matches does the name fall through to Spark's
        # dotted-path resolution (nested struct access).
        if name in self.schema.columns:
            col = F.col("`" + name.replace("`", "``") + "`")
        else:
            col = F.col(name)
        return Compiled(col, jxtype, spark_type=self.schema.spark_type_of(name))

    def op_literal(self, term, expr=None) -> Compiled:
        if term is None:
            return Compiled(F.lit(None), IS_NULL, F.lit(True))
        if isinstance(term, bool):
            return Compiled(F.lit(term), BOOLEAN, F.lit(False))
        if isinstance(term, (int, float)):
            return Compiled(F.lit(term), INTEGER if isinstance(term, int) else NUMBER, F.lit(False))
        if isinstance(term, str):
            return Compiled(F.lit(term), STRING)
        if isinstance(term, list):
            first = next((x for x in term if x is not None), None)
            et = STRING if isinstance(first, str) else NUMBER if isinstance(first, (int, float)) else UNKNOWN
            return Compiled(F.array(*[F.lit(v) for v in term]), ARRAY if et != UNKNOWN else ARRAY, F.lit(False))
        raise JXError(f"unsupported literal {term!r}")

    def op_null(self, term, expr=None) -> Compiled:
        return Compiled(F.lit(None), IS_NULL, F.lit(True))

    def op_true(self, term, expr=None) -> Compiled:
        return Compiled(F.lit(True), BOOLEAN, F.lit(False))

    def op_false(self, term, expr=None) -> Compiled:
        return Compiled(F.lit(False), BOOLEAN, F.lit(False))

    def op_date(self, term, expr=None) -> Compiled:
        """DateOp @718: literal date -> unix seconds (mo_times convention)."""
        from mysql_to_s3_spark.functions.dates import parse_date_literal

        return Compiled(F.lit(parse_date_literal(term)), NUMBER, F.lit(False))

    def op_variable(self, term, expr=None) -> Compiled:
        return self.variable(term)

    def op_get(self, term, expr=None) -> Compiled:
        """GetOp @347: dynamic member access v[k].

        Structs need getField/getItem (element_at only accepts array/map);
        arrays get 1-based element_at on a 0-based JX offset.
        """
        if isinstance(term, list):
            base, key = term
        else:
            (base, key), = term.items() if isinstance(term, dict) else [(term, None)]
        b = self.compile(base)
        key_lit = None
        if isinstance(key, dict) and "literal" in key:
            key_lit = key["literal"]
        elif isinstance(key, (int, float)):
            key_lit = key
        if b.jxtype == OBJECT:
            if isinstance(key_lit, str):
                return Compiled(b.col.getField(key_lit), UNKNOWN)
            raise JXError("get on an object requires a literal string key")
        k = self.compile(key)
        if b.jxtype in (ARRAY, NESTED):
            # JX offsets are 0-based; element_at is 1-based
            return Compiled(F.element_at(b.col, k.col.cast("int") + 1), UNKNOWN)
        return Compiled(F.element_at(b.col, k.col), UNKNOWN)

    def op_tuple(self, term, expr=None) -> Compiled:
        items = term if isinstance(term, list) else [term]
        cs = [self.compile(t) if not isinstance(t, Compiled) else t for t in items]
        return Compiled(F.struct(*[c.col for c in cs]), OBJECT, F.lit(False))

    def op_select(self, term, expr=None) -> Compiled:
        """SelectOp @367: build a record from {name, value} terms."""
        items = term if isinstance(term, list) else [term]
        fields = []
        for it in items:
            if isinstance(it, str):
                fields.append(self.compile(it).col.alias(it.split(".")[-1]))
            else:
                fields.append(self.compile(it["value"]).col.alias(it["name"]))
        return Compiled(F.struct(*fields), OBJECT, F.lit(False))

    def op_script(self, term, expr=None) -> Compiled:
        """ScriptOp @417: raw SQL escape hatch (gated like ALLOW_SCRIPTING)."""
        import os

        if not os.environ.get("JX_ALLOW_SCRIPTING"):
            raise JXError("script op disabled; set JX_ALLOW_SCRIPTING=1")
        return Compiled(F.expr(term), UNKNOWN)

    # -- boolean --------------------------------------------------------------

    def op_and(self, term, expr=None) -> Compiled:
        terms = [self.compile(t) for t in (term if isinstance(term, list) else [term])]
        if not terms:
            return Compiled(F.lit(True), BOOLEAN, F.lit(False))
        # missing terms behave as FALSE: the reference compiles AND to a
        # Python `and` chain where None is falsy (jx_python/expressions.py:208)
        out = F.lit(True)
        for t in terms:
            out = out & F.coalesce(t.col.cast("boolean"), F.lit(False))
        # filter context: raw AND — a NULL conjunct yields NULL, which a
        # Filter drops exactly like FALSE, and each raw term can push down
        filt = terms[0].fcol.cast("boolean")
        for t in terms[1:]:
            filt = filt & t.fcol.cast("boolean")
        return Compiled(out, BOOLEAN, F.lit(False), _filter=filt)

    def op_or(self, term, expr=None) -> Compiled:
        terms = [self.compile(t) for t in (term if isinstance(term, list) else [term])]
        if not terms:
            return Compiled(F.lit(False), BOOLEAN, F.lit(False))
        out = F.lit(False)
        for t in terms:
            out = out | F.coalesce(t.col.cast("boolean"), F.lit(False))
        # raw OR: NULL|TRUE = TRUE (kept), NULL|FALSE = NULL (dropped) —
        # same row set as the missing->FALSE coercion
        filt = terms[0].fcol.cast("boolean")
        for t in terms[1:]:
            filt = filt | t.fcol.cast("boolean")
        return Compiled(out, BOOLEAN, F.lit(False), _filter=filt)

    def op_not(self, term, expr=None) -> Compiled:
        t = self.compile(term)
        return Compiled(~F.coalesce(t.col.cast("boolean"), F.lit(False)), BOOLEAN, F.lit(False))

    # -- comparison -----------------------------------------------------------

    def _pairs(self, term) -> list[tuple[Compiled, Compiled]]:
        """Normalize binary-op operand forms: [a, b] or simple form {field: lit}."""
        if isinstance(term, list):
            if len(term) != 2:
                raise JXError(f"binary op expects 2 terms, got {term!r}")
            return [(self.compile(term[0]), self.compile(term[1]))]
        if isinstance(term, dict):
            return [(self.variable(k), self.op_literal(v)) for k, v in term.items()]
        raise JXError(f"bad operand form {term!r}")

    def op_eq(self, term, expr=None) -> Compiled:
        """EqOp @953: null-safe; map form = AND of field=value; rhs list = IN.

        Filter context keeps the RAW equality (pushdownable): with a
        non-null literal rhs the null-safe wrapper only converts NULL to
        FALSE, which a Filter does anyway.
        """
        conds = []
        raw_conds: list[Column] | None = []
        if isinstance(term, dict):
            for k, v in term.items():
                lhs = self.variable(k)
                if isinstance(v, list):
                    # IN form is never missing (EqOp.missing()=FALSE):
                    # NULL lhs compares FALSE, not NULL
                    conds.append(F.coalesce(lhs.col.isin(v), F.lit(False)))
                    raw_conds = raw_conds if None not in v else None
                    if raw_conds is not None:
                        raw_conds.append(lhs.col.isin(v))
                elif v is None or v == "":
                    # JX treats "" as missing: eq-"" must match NULL rows
                    # too, so the raw pushdown predicate (which drops
                    # NULLs) is unusable — keep only the null-safe form
                    conds.append(self._null_safe_eq(lhs, self.op_literal(v)))
                    raw_conds = None
                else:
                    conds.append(self._null_safe_eq(lhs, self.op_literal(v)))
                    if raw_conds is not None:
                        raw_conds.append(lhs.col == F.lit(v))
        else:
            l, r = self._pairs(term)[0]
            conds.append(self._null_safe_eq(l, r))
            raw_conds = None
        out = conds[0]
        for c in conds[1:]:
            out = out & c
        filt = None
        if raw_conds:
            filt = raw_conds[0]
            for c in raw_conds[1:]:
                filt = filt & c
        return Compiled(out, BOOLEAN, F.lit(False), _filter=filt)

    def _null_safe_eq(self, l: Compiled, r: Compiled) -> Column:
        return (l.missing & r.missing) | F.coalesce(l.col == r.col, F.lit(False))

    def op_term(self, term, expr=None) -> Compiled:
        return self.op_eq(term, expr)

    def op_ne(self, term, expr=None) -> Compiled:
        """NeOp @1017: true only when both exist and differ."""
        if isinstance(term, dict):
            (k, v), = term.items()
            l, r = self.variable(k), self.op_literal(v)
        else:
            l, r = self._pairs(term)[0]
        out = l.exists & r.exists & F.coalesce(l.col != r.col, F.lit(False))
        return Compiled(out, BOOLEAN, F.lit(False))

    def op_neq(self, term, expr=None) -> Compiled:
        return self.op_ne(term, expr)

    def _inequality(self, term, op: str) -> Compiled:
        if isinstance(term, dict):
            (k, v), = term.items()
            l, r = self.variable(k), self.op_literal(v)
        else:
            l, r = self._pairs(term)[0]
        # fold unix(ts) CMP number back onto the time column: the seconds
        # cast is strictly increasing, so comparing the raw column against
        # timestamp_seconds(rhs) is equivalent — and, with a foldable rhs,
        # reaches the parquet scan as a pushed filter
        for a, b, flip in ((l, r, False), (r, l, True)):
            if a._time_source is not None and b.jxtype in (NUMBER, INTEGER):
                raw, stype = a._time_source
                lit = F.timestamp_seconds(b.col)
                if stype == "timestamp_ntz":
                    lit = lit.cast("timestamp_ntz")
                eff = op if not flip else {"gt": "lt", "gte": "lte", "lt": "gt", "lte": "gte"}[op]
                cmp = {
                    "gt": raw > lit,
                    "gte": raw >= lit,
                    "lt": raw < lit,
                    "lte": raw <= lit,
                }[eff]
                return Compiled(cmp, BOOLEAN)
        cmp = {"gt": l.col > r.col, "gte": l.col >= r.col, "lt": l.col < r.col, "lte": l.col <= r.col}[op]
        return Compiled(cmp, BOOLEAN)

    def op_gt(self, term, expr=None) -> Compiled:
        return self._inequality(term, "gt")

    def op_gte(self, term, expr=None) -> Compiled:
        return self._inequality(term, "gte")

    def op_lt(self, term, expr=None) -> Compiled:
        return self._inequality(term, "lt")

    def op_lte(self, term, expr=None) -> Compiled:
        return self._inequality(term, "lte")

    def op_in(self, term, expr=None) -> Compiled:
        """InOp @2525: membership; list-valued lhs -> arrays_overlap.
        InOp.missing() is declared FALSE (@2562): `None in [...]` is
        False in the reference, never missing — coalesce the value form,
        keep the raw predicate for filter pushdown."""

        def _b(raw: Column) -> Compiled:
            return Compiled(F.coalesce(raw, F.lit(False)), BOOLEAN, F.lit(False), _filter=raw)

        if isinstance(term, dict):
            (k, v), = term.items()
            l = self.variable(k)
            if l.jxtype in (ARRAY, NESTED):
                rhs = self.op_literal(v if isinstance(v, list) else [v])
                return _b(F.arrays_overlap(l.col, rhs.col))
            return _b(l.col.isin(v if isinstance(v, list) else [v]))
        l, r = self._pairs(term)[0]
        if r.jxtype in (ARRAY, NESTED):
            return _b(F.array_contains(r.col, l.col))
        return _b(l.col == r.col)

    def op_terms(self, term, expr=None) -> Compiled:
        return self.op_in(term, expr)

    def op_range(self, term, expr=None) -> Compiled:
        """RangeOp @2566: {field: {gte: a, lt: b}} -> AND of inequalities."""
        conds = []
        for field, spec in term.items():
            v = self.variable(field)
            for cmp, lim in spec.items():
                lim_c = self.compile(lim)
                conds.append(
                    {
                        "gt": v.col > lim_c.col,
                        "gte": v.col >= lim_c.col,
                        "lt": v.col < lim_c.col,
                        "lte": v.col <= lim_c.col,
                    }[cmp]
                )
        out = conds[0]
        for c in conds[1:]:
            out = out & c
        return Compiled(out, BOOLEAN)

    def op_missing(self, term, expr=None) -> Compiled:
        return Compiled(self.compile(term).missing, BOOLEAN, F.lit(False))

    def op_exists(self, term, expr=None) -> Compiled:
        return Compiled(self.compile(term).exists, BOOLEAN, F.lit(False))

    # -- arithmetic -----------------------------------------------------------

    def _default(self, expr) -> Compiled:
        if expr and "default" in expr:
            return self.compile(expr["default"])
        return Compiled(F.lit(None), IS_NULL, F.lit(True))

    def _binary(self, term, expr, fn, jxtype=NUMBER) -> Compiled:
        l, r = self._pairs(term)[0]
        dflt = self._default(expr)
        raw = fn(l.col, r.col)
        out = F.when(l.missing | r.missing, dflt.col).otherwise(raw)
        return Compiled(out, _merge_types(jxtype, dflt.jxtype) if dflt.jxtype != IS_NULL else jxtype)

    def op_sub(self, term, expr=None) -> Compiled:
        return self._binary(term, expr, lambda a, b: a - b)

    op_subtract = op_minus = op_sub

    def op_div(self, term, expr=None) -> Compiled:
        """DivOp @897: div-by-zero and null -> default (else NULL)."""
        l, r = self._pairs(term)[0]
        dflt = self._default(expr)
        out = F.when(l.missing | r.missing | (r.col == 0), dflt.col).otherwise(l.col / r.col)
        return Compiled(out, NUMBER)

    op_divide = op_div

    def op_exp(self, term, expr=None) -> Compiled:
        return self._binary(term, expr, lambda a, b: F.pow(a, b))

    def op_mod(self, term, expr=None) -> Compiled:
        l, r = self._pairs(term)[0]
        dflt = self._default(expr)
        # Python-% semantics (the reference execs Python `%`): result takes
        # the DIVISOR's sign. pmod is always-positive (wrong for negative
        # divisors); Spark's % is C-style (dividend sign). ((a%b)+b)%b maps
        # C-% onto Python-%.
        py_mod = ((l.col % r.col) + r.col) % r.col
        out = F.when(l.missing | r.missing | (r.col == 0), dflt.col).otherwise(py_mod)
        return Compiled(out, NUMBER)

    def op_floor(self, term, expr=None) -> Compiled:
        """FloorOp @925: floor(l/r)*r bucketing; 1-arg = plain floor."""
        if isinstance(term, list) and len(term) == 2:
            l, r = self.compile(term[0]), self.compile(term[1])
            dflt = self._default(expr)
            # FloorOp.data_type is NUMBER: cast the bucket back to double so
            # integer inputs don't silently narrow the result to bigint.
            raw = (F.floor(l.col / r.col) * r.col).cast("double")
            out = F.when(l.missing | r.missing | (r.col == 0), dflt.col).otherwise(raw)
            return Compiled(out, NUMBER)
        t = self.compile(term)
        return Compiled(F.floor(t.col), INTEGER)

    def _nary(self, term, expr, identity, combine, strict_null_break) -> Compiled:
        """MultiOp @1717: n-ary add/mul; `nulls` flag toggles ignore-null."""
        terms = [self.compile(t) for t in (term if isinstance(term, list) else [term])]
        nulls_ok = True if expr is None else expr.get("nulls", True)
        dflt = self._default(expr)
        all_missing = F.lit(True)
        for t in terms:
            all_missing = all_missing & t.missing
        if nulls_ok:
            acc = F.lit(identity)
            for t in terms:
                acc = combine(acc, F.coalesce(t.col, F.lit(identity)))
            out = F.when(all_missing, dflt.col).otherwise(acc)
        else:
            any_missing = F.lit(False)
            for t in terms:
                any_missing = any_missing | t.missing
            acc = F.lit(identity)
            for t in terms:
                acc = combine(acc, t.col)
            out = F.when(any_missing, dflt.col).otherwise(acc)
        return Compiled(out, NUMBER)

    def op_add(self, term, expr=None) -> Compiled:
        return self._nary(term, expr, 0, lambda a, b: a + b, True)

    op_sum = op_add

    def op_mul(self, term, expr=None) -> Compiled:
        return self._nary(term, expr, 1, lambda a, b: a * b, True)

    op_mult = op_multiply = op_mul

    def op_max(self, term, expr=None) -> Compiled:
        """MaxOp @1611: row-wise greatest ignoring nulls."""
        terms = [self.compile(t) for t in (term if isinstance(term, list) else [term])]
        if len(terms) == 1:
            return terms[0]
        return Compiled(F.greatest(*[t.col for t in terms]), NUMBER)

    def op_min(self, term, expr=None) -> Compiled:
        terms = [self.compile(t) for t in (term if isinstance(term, list) else [term])]
        if len(terms) == 1:
            return terms[0]
        return Compiled(F.least(*[t.col for t in terms]), NUMBER)

    def op_count(self, term, expr=None) -> Compiled:
        """CountOp @1584: row-wise count of non-missing terms."""
        terms = [self.compile(t) for t in (term if isinstance(term, list) else [term])]
        acc = F.lit(0)
        for t in terms:
            acc = acc + F.when(t.missing, 0).otherwise(1)
        return Compiled(acc, INTEGER, F.lit(False))

    # -- casts & type predicates ----------------------------------------------

    def op_boolean(self, term, expr=None) -> Compiled:
        t = self.compile(term)
        if t.jxtype == STRING:
            out = F.when(t.missing, None).otherwise(F.lower(t.col).isin("true", "t", "1"))
        else:
            out = t.col.cast("boolean")
        return Compiled(out, BOOLEAN)

    def op_integer(self, term, expr=None) -> Compiled:
        t = self.compile(term)
        out = F.when(t.missing, None).otherwise(t.col.try_cast("double").try_cast("long"))
        return Compiled(out, INTEGER)

    def op_number(self, term, expr=None) -> Compiled:
        """number('') -> null (JX cast rules); malformed strings -> null
        via try_cast (ANSI cast would raise, the reference returns Null)."""
        t = self.compile(term)
        if t.jxtype == TIME:
            # dates are unix seconds at the JX boundary (mo_times convention);
            # NTZ timestamps need the TIMESTAMP hop before DOUBLE
            out = F.when(t.missing, None).otherwise(t.col.cast("timestamp").cast("double"))
        else:
            out = F.when(t.missing, None).otherwise(t.col.try_cast("double"))
        return Compiled(out, NUMBER)

    def op_string(self, term, expr=None) -> Compiled:
        t = self.compile(term)
        if t.jxtype == TIME:
            out = F.date_format(t.col, "yyyy-MM-dd HH:mm:ss")
        else:
            out = F.when(t.missing, None).otherwise(t.col.cast("string"))
        return Compiled(out, STRING)

    # Spark typeof() names -> JX types, for runtime is_* on UNKNOWN-typed exprs
    _SPARK_TYPE_NAMES = {
        BOOLEAN: ("boolean",),
        INTEGER: ("tinyint", "smallint", "int", "bigint"),
        NUMBER: ("float", "double") + ("tinyint", "smallint", "int", "bigint"),
        TIME: ("date", "timestamp", "timestamp_ntz"),
        STRING: ("string",),
    }

    def _is_type(self, term, jxtypes: set[str]) -> Compiled:
        t = self.compile(term)
        if t.jxtype != UNKNOWN:
            return Compiled(F.lit(t.jxtype in jxtypes), BOOLEAN, F.lit(False))
        # runtime check on dynamically-typed expressions via typeof()
        names: set[str] = set()
        for jt in jxtypes:
            names.update(self._SPARK_TYPE_NAMES.get(jt, ()))
        if hasattr(F, "typeof"):
            tn = F.typeof(t.col)
            return Compiled(tn.isin(*sorted(names)), BOOLEAN, F.lit(False))
        return Compiled(F.lit(False), BOOLEAN, F.lit(False))

    def op_is_boolean(self, term, expr=None) -> Compiled:
        return self._is_type(term, {BOOLEAN})

    def op_is_integer(self, term, expr=None) -> Compiled:
        return self._is_type(term, {INTEGER})

    def op_is_number(self, term, expr=None) -> Compiled:
        return self._is_type(term, {INTEGER, NUMBER, TIME})

    def op_is_string(self, term, expr=None) -> Compiled:
        return self._is_type(term, {STRING})

    # -- strings ----------------------------------------------------------------

    def op_length(self, term, expr=None) -> Compiled:
        t = self.compile(term)
        return Compiled(F.when(t.col.isNull(), None).otherwise(F.length(t.col)), INTEGER)

    def op_prefix(self, term, expr=None) -> Compiled:
        """PrefixOp @1948: startswith; {} -> TRUE."""
        if not term:
            return Compiled(F.lit(True), BOOLEAN, F.lit(False))
        if isinstance(term, dict):
            (k, v), = term.items()
            l, r = self.variable(k), self.op_literal(v)
        else:
            l, r = self._pairs(term)[0]
        # PrefixOp.missing() is declared FALSE (@1981): never NULL as a
        # value; the raw form stays in filter context for pushdown
        raw = l.col.startswith(r.col)
        return Compiled(F.coalesce(raw, F.lit(False)), BOOLEAN, F.lit(False), _filter=raw)

    def op_suffix(self, term, expr=None) -> Compiled:
        if not term:
            return Compiled(F.lit(True), BOOLEAN, F.lit(False))
        if isinstance(term, dict):
            (k, v), = term.items()
            l, r = self.variable(k), self.op_literal(v)
        else:
            l, r = self._pairs(term)[0]
        # SuffixOp.missing() likewise declared FALSE (@2019)
        raw = l.col.endswith(r.col)
        return Compiled(F.coalesce(raw, F.lit(False)), BOOLEAN, F.lit(False), _filter=raw)

    op_postfix = op_suffix

    def op_concat(self, term, expr=None) -> Compiled:
        """ConcatOp @2017: joins non-missing terms with `separator`.

        concat_ws skips NULLs; JX missing also covers "" -> nullif each term.
        """
        sep = (expr or {}).get("separator", "")
        if isinstance(term, dict):
            (k, v), = term.items()
            terms = [self.variable(k), self.op_literal(v)]
        else:
            terms = [self.compile(t) for t in (term if isinstance(term, list) else [term])]
        parts = [F.nullif(t.col.cast("string"), F.lit("")) for t in terms]
        out = F.concat_ws(sep, *parts)
        # all-missing -> default (reference returns missing -> NULL)
        all_missing = F.lit(True)
        for t in terms:
            all_missing = all_missing & t.missing
        dflt = self._default(expr)
        return Compiled(F.when(all_missing, dflt.col).otherwise(out), STRING)

    def op_left(self, term, expr=None) -> Compiled:
        """LeftOp @2110: first n chars, null-safe, clamped."""
        l, n = self._pairs(term)[0]
        out = F.when(l.missing | n.missing, None).otherwise(
            F.substring(l.col, 1, F.greatest(n.col.cast("int"), F.lit(0)))
        )
        return Compiled(out, STRING)

    def op_not_left(self, term, expr=None) -> Compiled:
        l, n = self._pairs(term)[0]
        nn = F.greatest(n.col.cast("int"), F.lit(0))
        out = F.when(l.missing | n.missing, None).otherwise(l.col.substr(nn + 1, F.length(l.col)))
        return Compiled(out, STRING)

    def op_right(self, term, expr=None) -> Compiled:
        l, n = self._pairs(term)[0]
        nn = F.least(F.greatest(n.col.cast("int"), F.lit(0)), F.length(l.col))
        out = F.when(l.missing | n.missing, None).otherwise(
            l.col.substr(F.length(l.col) - nn + 1, nn)
        )
        return Compiled(out, STRING)

    def op_not_right(self, term, expr=None) -> Compiled:
        l, n = self._pairs(term)[0]
        nn = F.least(F.greatest(n.col.cast("int"), F.lit(0)), F.length(l.col))
        out = F.when(l.missing | n.missing, None).otherwise(
            F.substring(l.col, 1, F.length(l.col) - nn)
        )
        return Compiled(out, STRING)

    def op_find(self, term, expr=None) -> Compiled:
        """FindOp @2290: 0-based index of substring, NULL (not -1) if absent."""
        l, sub = self._pairs(term)[0]
        start = self.compile((expr or {}).get("start", 0))
        dflt = self._default(expr)
        st = start.col.cast("int")
        tail = F.substring(l.col, st + 1, F.length(l.col))
        idx = F.instr(tail, sub.col)  # 1-based within tail, 0 if absent
        found = F.when(l.missing | sub.missing, dflt.col).otherwise(
            F.when(idx > 0, idx - 1 + st).otherwise(dflt.col)
        )
        return Compiled(found, INTEGER)

    op_instr = op_find

    def op_split(self, term, expr=None) -> Compiled:
        """SplitOp @2368: the separator is a LITERAL string (regex-escaped),
        in both the list form ["field", "sep"] and dict form {"field": "sep"}.
        """
        import re as _re

        if isinstance(term, dict):
            (k, sep), = term.items()
            l = self.variable(k)
        elif isinstance(term, list) and len(term) == 2:
            l = self.compile(term[0])
            sep = term[1]
        else:
            raise JXError(f"bad split operands {term!r}")
        if isinstance(sep, dict) and "literal" in sep:
            sep = sep["literal"]
        if not isinstance(sep, str):
            raise JXError(f"split separator must be a literal string, got {sep!r}")
        return Compiled(F.split(l.col, _re.escape(sep)), ARRAY)

    def op_between(self, term, expr=None) -> Compiled:
        """BetweenOp @2410: substring between literal prefix/suffix."""
        import re as _re

        expr = expr or {}
        if isinstance(term, dict) and "prefix" not in expr:
            (k, spec), = term.items()
            value = self.variable(k)
            pre, suf = spec[0], spec[1]
        else:
            value = self.compile(term)
            pre, suf = expr.get("prefix", ""), expr.get("suffix", "")
        dflt = self._default(expr)
        pattern = _re.escape(pre) + "(.*?)" + (_re.escape(suf) if suf else "$")
        hit = F.regexp_extract(value.col, pattern, 1)
        # regexp_extract returns "" on no match; treat as default
        matched = value.col.rlike(pattern)
        out = F.when(value.missing | ~matched, dflt.col).otherwise(hit)
        return Compiled(out, STRING)

    def op_regex(self, term, expr=None) -> Compiled:
        """RegExpOp @1803: FULL match -> anchor the pattern."""
        (k, v), = term.items()
        l = self.variable(k)
        pat = v if v.startswith("^") else "^(?:" + v + ")$"
        # RegExpOp.missing()=FALSE (@1820): never NULL as a value
        raw = l.col.rlike(pat)
        return Compiled(F.coalesce(raw, F.lit(False)), BOOLEAN, F.lit(False), _filter=raw)

    op_regexp = op_regex

    # -- null handling / conditionals ------------------------------------------

    def op_coalesce(self, term, expr=None) -> Compiled:
        terms = [self.compile(t) for t in (term if isinstance(term, list) else [term])]
        # JX coalesce skips missing (incl. "" for strings)
        out = None
        jxt = _merge_types(*[t.jxtype for t in terms])
        for t in reversed(terms):
            out = t.col if out is None else F.when(t.missing, out).otherwise(t.col)
        return Compiled(out, jxt)

    def op_when(self, term, expr=None) -> Compiled:
        expr = expr or {}
        cond = self.compile(term)
        then = self.compile(expr.get("then"))
        els = self.compile(expr.get("else"))
        out = F.when(F.coalesce(cond.col.cast("boolean"), F.lit(False)), then.col).otherwise(els.col)
        return Compiled(out, _merge_types(then.jxtype, els.jxtype))

    def op_case(self, term, expr=None) -> Compiled:
        """CaseOp @2641: list of {when,then}, optional trailing default expr."""
        clauses = list(term)
        default = Compiled(F.lit(None), IS_NULL, F.lit(True))
        if clauses and not (isinstance(clauses[-1], dict) and "when" in clauses[-1]):
            default = self.compile(clauses.pop())
        out = default.col
        jxt = default.jxtype
        for c in reversed(clauses):
            cond = self.compile(c["when"])
            then = self.compile(c.get("then"))
            jxt = _merge_types(jxt, then.jxtype)
            out = F.when(F.coalesce(cond.col.cast("boolean"), F.lit(False)), then.col).otherwise(out)
        return Compiled(out, jxt)

    # -- multivalue -------------------------------------------------------------

    def op_first(self, term, expr=None) -> Compiled:
        """FirstOp @1300: first of multivalue; scalar passthrough."""
        t = self.compile(term)
        if t.jxtype in (ARRAY, NESTED):
            return Compiled(F.element_at(t.col, 1), UNKNOWN)
        return t

    def op_last(self, term, expr=None) -> Compiled:
        t = self.compile(term)
        if t.jxtype in (ARRAY, NESTED):
            return Compiled(F.element_at(t.col, -1), UNKNOWN)
        return t

    def op_leaves(self, term, expr=None) -> Compiled:
        raise JXError("leaves op must be expanded by the executor (select clause)")

    def op_rows(self, term, expr=None) -> Compiled:
        raise JXError("rows op is only valid inside a window clause")

    def op_offset(self, term, expr=None) -> Compiled:
        """OffsetOp @284: positional column (tuple rows), resolved at
        compile time against the schema's column order."""
        i = int(term)
        if not self.schema.columns:
            raise JXError("offset op requires a schema with column order")
        if not (0 <= i < len(self.schema.columns)):
            return Compiled(F.lit(None), IS_NULL, F.lit(True))
        return self.variable(self.schema.columns[i])

    # -- dates -------------------------------------------------------------------

    def op_unix(self, term, expr=None) -> Compiled:
        t = self.compile(term)
        if t.jxtype == TIME:
            # NTZ needs the TIMESTAMP hop (session TZ pinned UTC); keep the
            # raw column so date-literal comparisons fold back onto the scan
            return Compiled(
                t.col.cast("timestamp").cast("double"),
                NUMBER,
                _time_source=(t.col, t.spark_type),
            )
        return Compiled(F.unix_timestamp(t.col).cast("double"), NUMBER)

    def op_from_unix(self, term, expr=None) -> Compiled:
        t = self.compile(term)
        return Compiled(F.timestamp_seconds(t.col), TIME)

    # -- basic (null-blind internal prims @2708-2758) ------------------------------

    def op_basic_index_of(self, term, expr=None) -> Compiled:
        l, sub = self._pairs(term)[0]
        return Compiled(F.instr(l.col, sub.col) - 1, INTEGER)

    def op_basic_eq(self, term, expr=None) -> Compiled:
        l, r = self._pairs(term)[0]
        return Compiled(l.col == r.col, BOOLEAN)

    def op_basic_substring(self, term, expr=None) -> Compiled:
        s, start, end = [self.compile(t) for t in term]
        return Compiled(
            s.col.substr(start.col.cast("int") + 1, (end.col - start.col).cast("int")), STRING
        )


