"""Typed columnar compiler: JSON Schema → native Spark Column expressions.

The 100 TB hot path. Where the generic path (jsi_spark.functions) ships a
Python closure tree to executors, this compiler evaluates the SAME keyword
semantics (reference: SURVEY.md §2.1-2.3 mapping of
lib/jsi/schema/elements/*.rb) entirely inside Catalyst/Tungsten:
assertions become whole-stage-codegen'd Column expressions, child
applicators on arrays become higher-order functions (transform / forall /
exists / filter), combinators become boolean Column algebra. No Python
runs per row.

Null convention (documented deviation, the standard SQL-constraint view):
a SQL NULL models JSON "absent". Assertion keywords pass on NULL (they are
type-gated in JSON Schema anyway); only ``required`` fails on NULL fields.

Two-pass strategy mirroring the reference's Valid-vs-Full result split
(lib/jsi/validation/result.rb:185-199): ``valid`` mode compiles a single
boolean column (cheap, runs over every row); ``violations`` mode compiles
an array<struct> column of violation rows, intended to run only on the
rows that already failed the boolean pass (filter-first, so the expensive
error expansion never touches passing rows).

Keywords not expressible as typed Columns ($dynamicRef, unevaluated*,
patternProperties on structs, ...) raise TypedCompileError; callers fall
back to the Arrow-UDF generic path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jsi_spark.compile.compiler import (
    CompiledSchema, SchemaNode, compile_schema,
)

VIOLATION_ELEM_TYPE = T.StructType([
    T.StructField("keyword", T.StringType()),
    T.StructField("ptr", T.StringType()),
    T.StructField("span_index", T.IntegerType()),
    T.StructField("message_key", T.StringType()),
])
VIOLATION_ARRAY_TYPE = T.ArrayType(VIOLATION_ELEM_TYPE)


class TypedCompileError(ValueError):
    """Schema uses keywords the typed path can't express → use the
    generic Arrow-UDF path instead."""


_UNSUPPORTED = frozenset({
    "dynamic_ref", "unevaluatedItems", "unevaluatedProperties",
    "patternProperties", "propertyNames", "additionalProperties",
    "maxProperties", "minProperties", "dependentRequired",
    "dependencies_required", "dependencies_schema", "dependentSchemas",
})

_NUMERIC_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                  T.FloatType, T.DoubleType, T.DecimalType)
_INTEGRAL_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def _empty_viols() -> Column:
    return F.array().cast(VIOLATION_ARRAY_TYPE)


def _forall_idx(col: Column, f) -> Column:
    """forall with an index-aware lambda (Spark's `forall` HOF is 1-arg;
    `filter` supports (x, i) → express forall as no-counterexample)."""
    return F.size(F.filter(col, lambda x, i: ~f(x, i))) == 0


class _Ctx:
    """Compilation context for one instance location."""

    __slots__ = ("col", "dtype", "ptr", "span_index", "collect")

    def __init__(self, col: Column, dtype: T.DataType, ptr: Column,
                 span_index: Column | None, collect: bool):
        self.col = col
        self.dtype = dtype
        self.ptr = ptr
        self.span_index = span_index
        self.collect = collect


class TypedValidator:
    """Compiled typed plan for one (JSON Schema, Spark StructType) pair."""

    def __init__(self, compiled: CompiledSchema, struct: T.StructType,
                 max_ref_depth: int = 16):
        self.compiled = compiled
        self.struct = struct
        self.max_ref_depth = max_ref_depth

    # -- public API -----------------------------------------------------------

    def valid_column(self) -> Column:
        """Boolean verdict column (pass 1 — runs over all rows)."""
        ctx = self._root_ctx(collect=False)
        valid, _ = self._node(self.compiled.root, ctx, depth=0)
        return valid

    def violations_column(self) -> Column:
        """array<struct<keyword,ptr,span_index,message_key>> column
        (pass 2 — run after ``filter(~valid)``)."""
        ctx = self._root_ctx(collect=True)
        _, viols = self._node(self.compiled.root, ctx, depth=0)
        return viols

    def apply(self, df: DataFrame, valid_col: str = "valid",
              violations_col: str | None = None) -> DataFrame:
        out = df.withColumn(valid_col, self.valid_column())
        if violations_col:
            out = out.withColumn(
                violations_col,
                F.when(F.col(valid_col), _empty_viols())
                .otherwise(self.violations_column()))
        return out

    def _root_ctx(self, collect: bool) -> _Ctx:
        root_col = F.struct(*[F.col(f.name).alias(f.name)
                              for f in self.struct.fields])
        return _Ctx(root_col, self.struct, F.lit(""), None, collect)

    # -- node compilation -------------------------------------------------------

    def _node(self, node: SchemaNode, ctx: _Ctx,
              depth: int) -> tuple[Column, Column]:
        """Returns (valid Column, violations Column)."""
        if depth > self.max_ref_depth:
            raise TypedCompileError(
                f"$ref nesting exceeds {self.max_ref_depth} at "
                f"{node.location} (cyclic schema? use the generic path)")
        if node.value is True or node.value == {}:
            return F.lit(True), _empty_viols()
        if node.value is False:
            return F.lit(False), self._emit(ctx, None,
                                            "validation.false_schema")
        kw = node.kw
        bad = _UNSUPPORTED & kw.keys()
        if bad:
            raise TypedCompileError(
                f"typed path does not support {sorted(bad)} at "
                f"{node.location}")
        checks: list[tuple[Column, Column]] = []

        if "ref" in kw:
            checks.append(self._node(kw["ref"], ctx, depth + 1))
            if node.dialect.ref_exclusive:
                return self._combine(checks)

        self._assertions(node, ctx, checks)
        self._inplace(node, ctx, depth, checks)
        self._children(node, ctx, depth, checks)
        return self._combine(checks)

    def _combine(self, checks) -> tuple[Column, Column]:
        if not checks:
            return F.lit(True), _empty_viols()
        valid = checks[0][0]
        for v, _ in checks[1:]:
            valid = valid & v
        viols = (checks[0][1] if len(checks) == 1
                 else F.concat(*[c[1] for c in checks]))
        return valid, viols

    def _emit(self, ctx: _Ctx, keyword: str | None, message_key: str,
              when_invalid: Column | None = None) -> Column:
        """Violation array: one element when the check fails."""
        if not ctx.collect:
            return _empty_viols()
        row = F.array(F.struct(
            F.lit(keyword).alias("keyword"),
            ctx.ptr.alias("ptr"),
            (ctx.span_index if ctx.span_index is not None
             else F.lit(None).cast("int")).alias("span_index"),
            F.lit(message_key).alias("message_key"),
        ))
        if when_invalid is None:
            return row
        return F.when(when_invalid, row).otherwise(_empty_viols())

    def _check(self, ctx: _Ctx, applicable: bool, ok: Column | bool,
               keyword: str, message_key: str) -> tuple[Column, Column]:
        """Type-gated assertion: NULL instance (absent) passes."""
        if not applicable:
            return F.lit(True), _empty_viols()
        okc = ok if isinstance(ok, Column) else F.lit(ok)
        valid = F.when(ctx.col.isNull(), F.lit(True)).otherwise(okc)
        return valid, self._emit(ctx, keyword, message_key, ~valid)

    # -- assertion keywords (SURVEY.md §2.1) -------------------------------------

    def _assertions(self, node: SchemaNode, ctx: _Ctx, checks):
        kw, dt, c = node.kw, ctx.dtype, ctx.col

        if "type" in kw:
            ok = self._type_ok(kw["type"], dt, c, node)
            checks.append(self._check(ctx, True, ok, "type",
                                      "validation.keyword.type.not_match"))

        if "enum" in kw:
            vals = [v for v in node.value["enum"]
                    if _literal_matches(v, dt)]
            if isinstance(dt, (T.StringType, *_NUMERIC_TYPES, T.BooleanType)):
                ok = c.isin(vals) if vals else F.lit(False)
            else:
                raise TypedCompileError(
                    f"enum over {dt.simpleString()} needs the generic path")
            checks.append(self._check(ctx, True, ok, "enum",
                                      "validation.keyword.enum.none_equal"))
        if "const" in kw:
            v = node.value["const"]
            if not _literal_matches(v, dt):
                ok = F.lit(False)
            else:
                ok = c == F.lit(v)
            checks.append(self._check(ctx, True, ok, "const",
                                      "validation.keyword.const.not_equal"))

        numeric = isinstance(dt, _NUMERIC_TYPES)
        if "multipleOf" in kw:
            q = kw["multipleOf"]
            if isinstance(dt, _INTEGRAL_TYPES) and isinstance(q, int):
                ok = c % F.lit(q) == 0
            else:
                # exact decimal arithmetic (BigDecimal analog,
                # reference numeric.rb:17-22)
                dec = T.DecimalType(38, 12)
                ok = F.pmod(c.cast(dec), F.lit(q).cast(dec)) == 0
            checks.append(self._check(
                ctx, numeric, ok, "multipleOf",
                "validation.keyword.multipleOf.not_multiple"))
        if "maximum" in kw:
            lim, excl = kw["maximum"]
            ok = (c < F.lit(lim)) if excl else (c <= F.lit(lim))
            key = ("validation.keyword.maximum.with_exclusiveMaximum."
                   "greater_or_equal" if excl
                   else "validation.keyword.maximum.greater")
            checks.append(self._check(ctx, numeric, ok, "maximum", key))
        if "minimum" in kw:
            lim, excl = kw["minimum"]
            ok = (c > F.lit(lim)) if excl else (c >= F.lit(lim))
            key = ("validation.keyword.minimum.with_exclusiveMinimum."
                   "less_or_equal" if excl
                   else "validation.keyword.minimum.less")
            checks.append(self._check(ctx, numeric, ok, "minimum", key))
        if "exclusiveMaximum" in kw:
            checks.append(self._check(
                ctx, numeric, c < F.lit(kw["exclusiveMaximum"]),
                "exclusiveMaximum",
                "validation.keyword.exclusiveMaximum.greater_or_equal"))
        if "exclusiveMinimum" in kw:
            checks.append(self._check(
                ctx, numeric, c > F.lit(kw["exclusiveMinimum"]),
                "exclusiveMinimum",
                "validation.keyword.exclusiveMinimum.less_or_equal"))

        is_str = isinstance(dt, T.StringType)
        if "maxLength" in kw:
            checks.append(self._check(
                ctx, is_str, F.length(c) <= kw["maxLength"], "maxLength",
                "validation.keyword.maxLength.length_greater"))
        if "minLength" in kw:
            checks.append(self._check(
                ctx, is_str, F.length(c) >= kw["minLength"], "minLength",
                "validation.keyword.minLength.length_less"))
        if "pattern" in kw:
            # Java regex vs reference's Ruby regex (ECMA-262 caveat,
            # reference README.md:181) — documented deviation; the generic
            # path uses Python `re` for parity-sensitive patterns
            checks.append(self._check(
                ctx, is_str, c.rlike(kw["pattern"][0]), "pattern",
                "validation.keyword.pattern.not_match"))

        is_arr = isinstance(dt, T.ArrayType)
        if "maxItems" in kw:
            checks.append(self._check(
                ctx, is_arr, F.size(c) <= kw["maxItems"], "maxItems",
                "validation.keyword.maxItems.size_greater"))
        if "minItems" in kw:
            checks.append(self._check(
                ctx, is_arr, F.size(c) >= kw["minItems"], "minItems",
                "validation.keyword.minItems.size_less"))
        if "uniqueItems" in kw:
            checks.append(self._check(
                ctx, is_arr, F.size(F.array_distinct(c)) == F.size(c),
                "uniqueItems", "validation.keyword.uniqueItems.not_unique"))

        if "required" in kw and isinstance(dt, T.StructType):
            names = {f.name for f in dt.fields}
            ok = F.lit(True)
            for name in kw["required"]:
                ok = ok & (c.getField(name).isNotNull()
                           if name in names else F.lit(False))
            checks.append(self._check(
                ctx, True, ok, "required",
                "validation.keyword.required.missing_property_names"))

    def _type_ok(self, types: tuple, dt: T.DataType, c: Column,
                 node: SchemaNode) -> Column | bool:
        oks = []
        for t in types:
            if t == "object":
                oks.append(isinstance(dt, (T.StructType, T.MapType)))
            elif t == "array":
                oks.append(isinstance(dt, T.ArrayType))
            elif t == "string":
                oks.append(isinstance(dt, T.StringType))
            elif t == "boolean":
                oks.append(isinstance(dt, T.BooleanType))
            elif t == "number":
                oks.append(isinstance(dt, _NUMERIC_TYPES))
            elif t == "integer":
                if isinstance(dt, _INTEGRAL_TYPES):
                    oks.append(True)
                elif (isinstance(dt, _NUMERIC_TYPES)
                      and not node.dialect.integer_disallows_0_fraction):
                    # 1.0 is an integer post-draft-04: runtime check
                    oks.append(F.pmod(c, F.lit(1)) == 0)
                else:
                    oks.append(False)
            elif t == "null":
                oks.append(False)  # NULL models "absent"; gate passes anyway
        cols = [o for o in oks if isinstance(o, Column)]
        if any(o is True for o in oks):
            return True
        ok: Column | bool = False
        for col in cols:
            ok = col if ok is False else (ok | col)
        return ok

    # -- in-place applicators (SURVEY.md §2.2) ------------------------------------

    def _inplace(self, node: SchemaNode, ctx: _Ctx, depth: int, checks):
        kw = node.kw
        if "allOf" in kw:
            subs = [self._node(n, ctx, depth + 1) for n in kw["allOf"]]
            checks.extend(subs)
        if "anyOf" in kw:
            subs = [self._node(n, ctx, depth + 1) for n in kw["anyOf"]]
            valid = subs[0][0]
            for v, _ in subs[1:]:
                valid = valid | v
            viols = F.when(valid, _empty_viols()).otherwise(
                F.concat(*[s[1] for s in subs],
                         self._emit(ctx, "anyOf",
                                    "validation.keyword.anyOf.not_any_valid")))
            checks.append((valid, viols))
        if "oneOf" in kw:
            subs = [self._node(n, ctx, depth + 1) for n in kw["oneOf"]]
            count = subs[0][0].cast("int")
            for v, _ in subs[1:]:
                count = count + v.cast("int")
            valid = count == 1
            viols = (
                F.when(valid, _empty_viols())
                .when(count == 0,
                      F.concat(*[s[1] for s in subs],
                               self._emit(ctx, "oneOf",
                                          "validation.keyword.oneOf."
                                          "not_any_valid")))
                .otherwise(self._emit(ctx, "oneOf",
                                      "validation.keyword.oneOf."
                                      "multiple_valid")))
            checks.append((valid, viols))
        if "not" in kw:
            sub_valid, _ = self._node(kw["not"], ctx, depth + 1)
            valid = ~sub_valid
            checks.append((valid, self._emit(ctx, "not",
                                             "validation.keyword.not.valid",
                                             ~valid)))
        if "if" in kw:
            if_valid, _ = self._node(kw["if"], ctx, depth + 1)
            then_valid, then_viols = (
                self._node(kw["then"], ctx, depth + 1)
                if "then" in kw else (F.lit(True), _empty_viols()))
            else_valid, else_viols = (
                self._node(kw["else"], ctx, depth + 1)
                if "else" in kw else (F.lit(True), _empty_viols()))
            valid = F.when(if_valid, then_valid).otherwise(else_valid)
            if ctx.collect:
                viols = F.when(
                    if_valid,
                    F.when(then_valid, _empty_viols()).otherwise(
                        F.concat(then_viols,
                                 self._emit(ctx, "then",
                                            "validation.keyword.then."
                                            "invalid")))
                ).otherwise(
                    F.when(else_valid, _empty_viols()).otherwise(
                        F.concat(else_viols,
                                 self._emit(ctx, "else",
                                            "validation.keyword.else."
                                            "invalid"))))
            else:
                viols = _empty_viols()
            checks.append((valid, viols))

    # -- child applicators (SURVEY.md §2.3) ----------------------------------------

    def _children(self, node: SchemaNode, ctx: _Ctx, depth: int, checks):
        kw = node.kw
        if "properties" in kw and isinstance(ctx.dtype, T.StructType):
            fields = {f.name: f.dataType for f in ctx.dtype.fields}
            for name, child_node in kw["properties"].items():
                if name not in fields:
                    continue  # never present → vacuously valid
                child_ctx = _Ctx(
                    ctx.col.getField(name), fields[name],
                    F.concat(ctx.ptr, F.lit("/" + name)),
                    ctx.span_index, ctx.collect)
                valid, viols = self._node(child_node, child_ctx, depth + 1)
                # object NULL (absent) ⇒ children vacuously valid
                valid = F.when(ctx.col.isNull(), F.lit(True)).otherwise(valid)
                if ctx.collect:
                    viols = F.when(ctx.col.isNull() | valid,
                                   _empty_viols()).otherwise(viols)
                checks.append((valid, viols))

        arr = isinstance(ctx.dtype, T.ArrayType)
        elem_dt = ctx.dtype.elementType if arr else None

        def elem_pair(child_node, x, i):
            eptr = F.concat(ctx.ptr, F.lit("/"), i.cast("string"))
            span = ctx.span_index if ctx.span_index is not None else \
                i.cast("int")
            ectx = _Ctx(x, elem_dt, eptr, span, ctx.collect)
            return self._node(child_node, ectx, depth + 1)

        for items_kw in ("items_schema", "items_rest"):
            if items_kw in kw and arr:
                child_node = kw[items_kw]
                start = len(kw.get("prefixItems", ())) \
                    if items_kw == "items_rest" else 0
                gate = (lambda i: i >= F.lit(start)) if start else \
                    (lambda i: F.lit(True))
                valid = _forall_idx(
                    ctx.col,
                    lambda x, i: ~gate(i) | elem_pair(child_node, x, i)[0])
                valid = F.when(ctx.col.isNull(), F.lit(True)).otherwise(valid)
                if ctx.collect:
                    per_elem = F.transform(
                        ctx.col,
                        lambda x, i: F.when(
                            gate(i) & ~elem_pair(child_node, x, i)[0],
                            elem_pair(child_node, x, i)[1])
                        .otherwise(_empty_viols()))
                    viols = F.when(ctx.col.isNull(), _empty_viols()) \
                        .otherwise(F.flatten(per_elem))
                else:
                    viols = _empty_viols()
                checks.append((valid, viols))

        if "prefixItems" in kw and arr:
            for i, child_node in enumerate(kw["prefixItems"]):
                has = F.size(ctx.col) > i
                ectx = _Ctx(F.element_at(ctx.col, i + 1), elem_dt,
                            F.concat(ctx.ptr, F.lit(f"/{i}")),
                            ctx.span_index if ctx.span_index is not None
                            else F.lit(i), ctx.collect)
                v, viols = self._node(child_node, ectx, depth + 1)
                valid = F.when(ctx.col.isNull() | ~has,
                               F.lit(True)).otherwise(v)
                if ctx.collect:
                    viols = F.when(valid, _empty_viols()).otherwise(viols)
                checks.append((valid, viols))

        if "items_tuple" in kw and arr:
            for i, child_node in enumerate(kw["items_tuple"]):
                has = F.size(ctx.col) > i
                ectx = _Ctx(F.element_at(ctx.col, i + 1), elem_dt,
                            F.concat(ctx.ptr, F.lit(f"/{i}")),
                            ctx.span_index if ctx.span_index is not None
                            else F.lit(i), ctx.collect)
                v, viols = self._node(child_node, ectx, depth + 1)
                valid = F.when(ctx.col.isNull() | ~has,
                               F.lit(True)).otherwise(v)
                if ctx.collect:
                    viols = F.when(valid, _empty_viols()).otherwise(viols)
                checks.append((valid, viols))
            if "additionalItems" in kw:
                n = len(kw["items_tuple"])
                child_node = kw["additionalItems"]
                valid = _forall_idx(
                    ctx.col,
                    lambda x, i: (i < F.lit(n))
                    | elem_pair(child_node, x, i)[0])
                valid = F.when(ctx.col.isNull(),
                               F.lit(True)).otherwise(valid)
                viols = self._emit(
                    ctx, "additionalItems",
                    "validation.keyword.additionalItems.invalid", ~valid)
                checks.append((valid, viols))

        if "contains" in kw and arr:
            child_node = kw["contains"]
            match_count = F.size(F.filter(
                ctx.col, lambda x, i: elem_pair(child_node, x, i)[0]))
            mn = kw.get("minContains", 1)
            mx = kw.get("maxContains")
            ok = match_count >= mn
            if mx is not None:
                ok = ok & (match_count <= mx)
            valid = F.when(ctx.col.isNull(), F.lit(True)).otherwise(ok)
            viols = self._emit(ctx, "contains",
                               "validation.keyword.contains.none", ~valid)
            checks.append((valid, viols))


def _literal_matches(v, dt: T.DataType) -> bool:
    if isinstance(v, bool):
        return isinstance(dt, T.BooleanType)
    if isinstance(v, (int, float)):
        return isinstance(dt, _NUMERIC_TYPES)
    if isinstance(v, str):
        return isinstance(dt, T.StringType)
    return False


def typed_validator(schema, struct: T.StructType,
                    registry=None, dialect=None) -> TypedValidator:
    """Compile ``schema`` for a DataFrame whose rows are the instances
    (root object properties = columns)."""
    compiled = schema if isinstance(schema, CompiledSchema) else \
        compile_schema(schema, registry=registry, dialect=dialect)
    return TypedValidator(compiled, struct)
