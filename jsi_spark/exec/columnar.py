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

Every keyword compiles on this path — including unevaluated* (validity-
gated evaluated-annotation masks) and $dynamicRef (the dynamic-scope
resource chain is statically known along the inlined walk). Remaining
fallbacks to the Arrow-UDF generic path raise TypedCompileError:
unevaluatedProperties over MapType (unbounded key space) and cyclic
$ref graphs beyond max_ref_depth.
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


_I64_MIN, _I64_MAX = -(1 << 63), (1 << 63) - 1


def _guard_bignum(v, keyword: str) -> None:
    """Raise TypedCompileError if a schema constant (possibly composite)
    contains an integer outside int64 — ``F.lit`` would throw an opaque
    py4j NumberFormatException deep in plan construction otherwise."""
    if isinstance(v, bool):
        return
    if isinstance(v, int) and not _I64_MIN <= v <= _I64_MAX:
        raise TypedCompileError(
            f"{keyword} constant {v} exceeds int64; bignum schema "
            "constants are generic-path only")
    if isinstance(v, list):
        for x in v:
            _guard_bignum(x, keyword)
    elif isinstance(v, dict):
        for x in v.values():
            _guard_bignum(x, keyword)


_UNSUPPORTED = frozenset()

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
        self._valid_col: Column | None = None
        self._viols_col: Column | None = None

    # -- public API -----------------------------------------------------------

    def valid_column(self) -> Column:
        """Boolean verdict column (pass 1 — runs over all rows).
        Memoized: the tree is large (seconds of driver-side build for a
        real schema) and Columns are immutable unresolved expressions,
        reusable across any DataFrame with this struct."""
        if self._valid_col is None:
            ctx = self._root_ctx(collect=False)
            self._valid_col, _ = self._node(self.compiled.root, ctx,
                                            depth=0)
        return self._valid_col

    def violations_column(self) -> Column:
        """array<struct<keyword,ptr,span_index,message_key>> column
        (pass 2 — run after ``filter(~valid)``). Memoized like
        :meth:`valid_column`."""
        if self._viols_col is None:
            ctx = self._root_ctx(collect=True)
            _, self._viols_col = self._node(self.compiled.root, ctx,
                                            depth=0)
        return self._viols_col

    def evaluated_props_columns(self) -> dict:
        """Root-level evaluated-property masks: field name → boolean
        Column, true iff some applicator in the root schema's in-place
        application graph applied a schema to that field AND the
        application validated (annotation semantics). The typed analog
        of the reference's application inspection
        (jsi Base#jsi_each_propertyName / application suite,
        test/application_suite_test.rb)."""
        ctx = self._root_ctx(collect=False)
        return self._eval_props(self.compiled.root, ctx, 0)

    def evaluated_items_mask(self, field: str) -> Column:
        """array<boolean> per-element evaluated mask for root array
        field ``field`` under the schema at ``properties/<field>`` —
        which elements prefixItems/items/contains/in-place branches
        applied to (validity-gated), BEFORE unevaluatedItems."""
        node = self.compiled.root.kw.get("properties", {}).get(field)
        if node is None:
            raise KeyError(f"no properties/{field} subschema")
        dtype = dict((f.name, f.dataType)
                     for f in self.struct.fields)[field]
        ctx = _Ctx(F.col(field), dtype, F.lit("/" + field), None, False)
        pred = self._eval_items_pred(node, ctx, 0, include_self=False)
        return F.transform(F.col(field), lambda x, i: pred(x, i))

    def field_defaults(self) -> dict:
        """Per-root-field ``default`` annotation (reference:
        lib/jsi/base.rb:484-505 jsi_default_child / use_default): collect
        the defaults every schema describing the child declares; a field
        gets a default only if exactly ONE distinct value is declared
        (multiple different defaults → none, the reference's nil rule).
        The walk follows the unconditional in-place applicators
        ($ref, allOf); instance-conditional branches (anyOf/oneOf/
        if-then-else/dependentSchemas) never contribute — their
        application is row-dependent, which the reference resolves
        per-read and a static Column plan conservatively skips."""
        from jsi_spark.compile.compiler import canon_key

        found: dict = {}

        def visit(node, seen):
            if id(node) in seen or not isinstance(node.value, dict):
                return
            seen = seen | {id(node)}
            kw = node.kw
            for name, sub in kw.get("properties", {}).items():
                if isinstance(sub.value, dict) and "default" in sub.value:
                    raw = sub.value["default"]
                    found.setdefault(name, {})[canon_key(raw)] = raw
            if "ref" in kw:
                visit(kw["ref"], seen)
            for sub in kw.get("allOf", ()):
                visit(sub, seen)

        visit(self.compiled.root, frozenset())
        return {name: next(iter(vals.values()))
                for name, vals in found.items() if len(vals) == 1}

    def with_defaults(self, df: DataFrame) -> DataFrame:
        """Coalesce NULL (absent) root fields with their unique schema
        ``default`` — the DataFrame lift of reading with use_default."""
        defaults = self.field_defaults()
        fields = {f.name: f.dataType for f in self.struct.fields}
        cols = []
        for f in df.columns:
            if f in defaults and f in fields:
                cols.append(F.coalesce(
                    F.col(f),
                    F.lit(defaults[f]).cast(fields[f])).alias(f))
            else:
                cols.append(F.col(f))
        return df.select(*cols)

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
              depth: int, scope: tuple = ()) -> tuple[Column, Column]:
        """Returns (valid Column, violations Column). ``scope`` is the
        dynamic-scope resource chain (outermost first) accumulated along
        this compile-time walk — the typed analog of the generic path's
        runtime scope (compiler.py SchemaNode.validate), statically known
        here because $refs are inlined."""
        if depth > self.max_ref_depth:
            raise TypedCompileError(
                f"$ref nesting exceeds {self.max_ref_depth} at "
                f"{node.location} (cyclic schema? use the generic path)")
        sres = node.scope_resource
        if sres is not None and (not scope or scope[-1] is not sres):
            scope = scope + (sres,)
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
            checks.append(self._node(kw["ref"], ctx, depth + 1, scope))
            if node.dialect.ref_exclusive:
                return self._combine(checks)
        if "dynamic_ref" in kw:
            checks.append(self._node(
                self._dynamic_target(node, scope), ctx, depth + 1, scope))

        self._assertions(node, ctx, checks)
        self._inplace(node, ctx, depth, checks, scope)
        self._children(node, ctx, depth, checks, scope)
        return self._combine(checks)

    @staticmethod
    def _dynamic_target(node: SchemaNode, scope: tuple) -> SchemaNode:
        """Outermost dynamic-scope resource holding the anchor wins
        (2020-12 §8.2.3.2; generic analog: compiler.py validate's
        dynamic_ref loop; reference: elements/dynamic_ref.rb:5-68)."""
        anchor, static_node = node.kw["dynamic_ref"]
        for res in scope:
            p = res.dynamic_anchors.get(anchor)
            if p is not None:
                return node.engine._node_for(res, p, node.dialect)
        return static_node

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

        # JVM literals are int64/double; a schema constant outside int64
        # (official-suite "bignum" family) cannot be expressed in a typed
        # plan — decline at compile time (the generic path evaluates
        # arbitrary-precision Python ints natively)
        for _k in ("multipleOf", "maximum", "minimum",
                   "exclusiveMaximum", "exclusiveMinimum",
                   "enum", "const"):
            if _k in kw:
                _guard_bignum(node.value.get(_k), _k)

        if "type" in kw:
            ok = self._type_ok(kw["type"], dt, c, node)
            checks.append(self._check(ctx, True, ok, "type",
                                      "validation.keyword.type.not_match"))

        if "enum" in kw:
            if isinstance(dt, (T.StringType, *_NUMERIC_TYPES, T.BooleanType)):
                vals = [v for v in node.value["enum"]
                        if _literal_matches(v, dt)]
                ok = c.isin(vals) if vals else F.lit(False)
            else:
                ok = F.lit(False)
                for v in node.value["enum"]:
                    ok = ok | _deep_eq(c, dt, v)
            checks.append(self._check(ctx, True, ok, "enum",
                                      "validation.keyword.enum.none_equal"))
        if "const" in kw:
            ok = _deep_eq(c, dt, node.value["const"])
            checks.append(self._check(ctx, True, ok, "const",
                                      "validation.keyword.const.not_equal"))

        for key, entry in kw.items():
            if key.startswith("custom:"):
                from jsi_spark.compile import plugins

                name, sval, _check = entry
                ck = plugins.registered().get(name)
                col_ok = (ck.typed_fn(sval, c, dt)
                          if ck is not None and ck.typed_fn else None)
                if col_ok is None:
                    raise TypedCompileError(
                        f"custom keyword {name!r} has no typed compiler "
                        f"— use the generic path")
                checks.append(self._check(
                    ctx, True, col_ok, name,
                    f"validation.keyword.{name}.invalid"))

        numeric = isinstance(dt, _NUMERIC_TYPES)
        if "multipleOf" in kw:
            q = kw["multipleOf"]
            if isinstance(dt, _INTEGRAL_TYPES) and isinstance(q, int):
                ok = c % F.lit(q) == 0
            elif not 0 < abs(q) < 1e26:
                # divisor itself exceeds Decimal(38,12): double fmod
                ok = F.pmod(c.cast("double"), F.lit(float(q))) == 0
            else:
                # exact decimal arithmetic (BigDecimal analog,
                # reference numeric.rb:17-22). Values outside the
                # Decimal(38,12) range would make the cast raise under
                # ANSI mode; the official suite's float-overflow case
                # (multipleOf 0.123456789 vs 1e308) requires invalid,
                # not a crash — CaseWhen branches evaluate lazily
                # per-row, so the cast never runs for out-of-range rows.
                # Outside the Decimal window, IEEE fmod is exact: huge
                # exact multiples (2^90 % 2.0) stay valid (matching the
                # generic path's Fraction fallback and the reference's
                # BigDecimal), while 1e308 % 0.123456789 stays invalid.
                dec = T.DecimalType(38, 12)
                bound = F.lit(1e25)
                ok = F.when(
                    (c >= -bound) & (c <= bound),
                    F.pmod(c.cast(dec), F.lit(q).cast(dec)) == 0
                ).otherwise(
                    F.pmod(c.cast("double"), F.lit(float(q))) == 0)
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

        is_struct = isinstance(dt, T.StructType)
        is_map = isinstance(dt, T.MapType)
        if "required" in kw and (is_struct or is_map):
            ok = F.lit(True)
            for name in kw["required"]:
                ok = ok & self._present(ctx, name)
            checks.append(self._check(
                ctx, True, ok, "required",
                "validation.keyword.required.missing_property_names"))

        if "maxProperties" in kw and (is_struct or is_map):
            checks.append(self._check(
                ctx, True, self._prop_count(ctx) <= kw["maxProperties"],
                "maxProperties",
                "validation.keyword.maxProperties.properties_count_greater"))
        if "minProperties" in kw and (is_struct or is_map):
            checks.append(self._check(
                ctx, True, self._prop_count(ctx) >= kw["minProperties"],
                "minProperties",
                "validation.keyword.minProperties.properties_count_less"))

        for dep_kw, keyword, key in (
                ("dependentRequired", "dependentRequired",
                 "validation.keyword.dependentRequired."
                 "missing_property_names"),
                ("dependencies_required", "dependencies",
                 "validation.keyword.dependencies.dependent_required."
                 "missing_property_names")):
            if dep_kw in kw and (is_struct or is_map):
                ok = F.lit(True)
                for k, names in kw[dep_kw].items():
                    need = F.lit(True)
                    for n in names:
                        need = need & self._present(ctx, n)
                    ok = ok & (F.when(self._present(ctx, k), need)
                               .otherwise(F.lit(True)))
                checks.append(self._check(ctx, True, ok, keyword, key))

    # -- object helpers ---------------------------------------------------------

    def _present(self, ctx: _Ctx, name: str) -> Column:
        """Presence of property ``name`` (NULL models absent)."""
        if isinstance(ctx.dtype, T.StructType):
            if name not in {f.name for f in ctx.dtype.fields}:
                return F.lit(False)
            return ctx.col.getField(name).isNotNull()
        if isinstance(ctx.dtype, T.MapType):
            return (F.map_contains_key(ctx.col, F.lit(name))
                    & F.element_at(ctx.col, F.lit(name)).isNotNull())
        return F.lit(False)

    def _prop_count(self, ctx: _Ctx) -> Column:
        if isinstance(ctx.dtype, T.StructType):
            cnt = F.lit(0)
            for f in ctx.dtype.fields:
                cnt = cnt + ctx.col.getField(f.name).isNotNull().cast("int")
            return cnt
        return F.size(F.filter(F.map_values(ctx.col),
                               lambda v: v.isNotNull()))

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

    def _inplace(self, node: SchemaNode, ctx: _Ctx, depth: int, checks,
                 scope: tuple = ()):
        kw = node.kw
        if "allOf" in kw:
            subs = [self._node(n, ctx, depth + 1, scope) for n in kw["allOf"]]
            checks.extend(subs)
        if "anyOf" in kw:
            subs = [self._node(n, ctx, depth + 1, scope) for n in kw["anyOf"]]
            valid = subs[0][0]
            for v, _ in subs[1:]:
                valid = valid | v
            viols = F.when(valid, _empty_viols()).otherwise(
                F.concat(*[s[1] for s in subs],
                         self._emit(ctx, "anyOf",
                                    "validation.keyword.anyOf.not_any_valid")))
            checks.append((valid, viols))
        if "oneOf" in kw:
            subs = [self._node(n, ctx, depth + 1, scope) for n in kw["oneOf"]]
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
            sub_valid, _ = self._node(kw["not"], ctx, depth + 1, scope)
            valid = ~sub_valid
            checks.append((valid, self._emit(ctx, "not",
                                             "validation.keyword.not.valid",
                                             ~valid)))
        for dep_kw, keyword, key in (
                ("dependentSchemas", "dependentSchemas",
                 "validation.keyword.dependentSchemas.invalid"),
                ("dependencies_schema", "dependencies",
                 "validation.keyword.dependencies.dependent_schema."
                 "invalid")):
            if dep_kw in kw and isinstance(ctx.dtype,
                                           (T.StructType, T.MapType)):
                for k, dep_node in kw[dep_kw].items():
                    sub_valid, sub_viols = self._node(dep_node, ctx,
                                                      depth + 1, scope)
                    present = self._present(ctx, k)
                    valid = F.when(present, sub_valid).otherwise(F.lit(True))
                    if ctx.collect:
                        viols = F.when(present & ~sub_valid, F.concat(
                            sub_viols, self._emit(ctx, keyword, key))
                        ).otherwise(_empty_viols())
                    else:
                        viols = _empty_viols()
                    checks.append((valid, viols))

        if "if" in kw:
            if_valid, _ = self._node(kw["if"], ctx, depth + 1, scope)
            then_valid, then_viols = (
                self._node(kw["then"], ctx, depth + 1, scope)
                if "then" in kw else (F.lit(True), _empty_viols()))
            else_valid, else_viols = (
                self._node(kw["else"], ctx, depth + 1, scope)
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

    def _child_check(self, child_node, ctx: _Ctx, name: str, child_col,
                     child_dt, depth: int,
                     scope: tuple = ()) -> tuple[Column, Column]:
        """Validate one named child; absent parent/child ⇒ vacuous.

        The child-NULL gate matters for combinators: assertions are
        individually NULL-gated in _check, but oneOf/anyOf/not over a
        NULL child would otherwise evaluate branch validities (all
        vacuously true) and e.g. fail a two-branch oneOf on an ABSENT
        property — which JSON Schema never applies at all."""
        child_ctx = _Ctx(child_col, child_dt,
                         F.concat(ctx.ptr, F.lit("/" + name)),
                         ctx.span_index, ctx.collect)
        valid, viols = self._node(child_node, child_ctx, depth + 1, scope)
        absent = ctx.col.isNull() | child_col.isNull()
        valid = F.when(absent, F.lit(True)).otherwise(valid)
        if ctx.collect:
            viols = F.when(absent | valid,
                           _empty_viols()).otherwise(viols)
        return valid, viols

    def _object_children(self, node: SchemaNode, ctx: _Ctx, depth: int,
                         checks, scope: tuple = ()):
        kw = node.kw
        is_struct = isinstance(ctx.dtype, T.StructType)
        is_map = isinstance(ctx.dtype, T.MapType)
        if not (is_struct or is_map):
            return
        fields = ({f.name: f.dataType for f in ctx.dtype.fields}
                  if is_struct else {})
        val_dt = ctx.dtype.valueType if is_map else None
        props = kw.get("properties", {})
        pprops = kw.get("patternProperties", ())

        def child_col(name: str):
            return (ctx.col.getField(name) if is_struct
                    else F.element_at(ctx.col, F.lit(name)))

        def child_dt(name: str):
            return fields[name] if is_struct else val_dt

        if props:
            for name, child_node in props.items():
                if is_struct and name not in fields:
                    continue  # never present → vacuously valid
                checks.append(self._child_check(
                    child_node, ctx, name, child_col(name), child_dt(name),
                    depth, scope))

        if pprops:
            if is_struct:
                # compile-time key matching (Python `re` search, same
                # dialect as the generic path / reference pattern.rb)
                for name in fields:
                    for _pat, rx, sub_node in pprops:
                        if rx.search(name):
                            checks.append(self._child_check(
                                sub_node, ctx, name, child_col(name),
                                fields[name], depth, scope))
            else:
                # runtime key matching over map entries (Java regex —
                # documented deviation of the typed path)
                for pat, _rx, sub_node in pprops:
                    checks.append(self._entries_check(
                        sub_node, ctx, val_dt,
                        lambda k, pat=pat: k.rlike(pat), depth,
                        "patternProperties",
                        "validation.keyword.patternProperties.invalid",
                        scope))

        if "additionalProperties" in kw:
            sub_node = kw["additionalProperties"]
            if is_struct:
                for name in fields:
                    if name in props:
                        continue
                    if any(rx.search(name) for _p, rx, _n in pprops):
                        continue
                    checks.append(self._child_check(
                        sub_node, ctx, name, child_col(name), fields[name],
                        depth, scope))
            else:
                prop_names = [F.lit(n) for n in props]

                def is_additional(k):
                    extra = ~k.isin(*prop_names) if prop_names else \
                        F.lit(True)
                    for pat, _rx, _n in pprops:
                        extra = extra & ~k.rlike(pat)
                    return extra

                checks.append(self._entries_check(
                    sub_node, ctx, val_dt, is_additional, depth,
                    "additionalProperties",
                    "validation.keyword.additionalProperties.invalid",
                    scope))

        if "propertyNames" in kw:
            sub_node = kw["propertyNames"]
            if is_struct:
                for name in fields:
                    name_ctx = _Ctx(F.lit(name), T.StringType(),
                                    F.concat(ctx.ptr, F.lit("/" + name)),
                                    ctx.span_index, ctx.collect)
                    nv, nviols = self._node(sub_node, name_ctx, depth + 1, scope)
                    valid = F.when(
                        ctx.col.isNull() | ~self._present(ctx, name),
                        F.lit(True)).otherwise(nv)
                    viols = self._emit(
                        ctx, "propertyNames",
                        "validation.keyword.propertyNames.invalid", ~valid)
                    checks.append((valid, viols))
            else:
                def name_valid(k):
                    name_ctx = _Ctx(k, T.StringType(), ctx.ptr,
                                    ctx.span_index, False)
                    return self._node(sub_node, name_ctx, depth + 1, scope)[0]

                ok = F.forall(F.map_keys(ctx.col), name_valid)
                valid = F.when(ctx.col.isNull(), F.lit(True)).otherwise(ok)
                viols = self._emit(
                    ctx, "propertyNames",
                    "validation.keyword.propertyNames.invalid", ~valid)
                checks.append((valid, viols))

    def _entries_check(self, sub_node, ctx: _Ctx, val_dt,
                       key_gate, depth: int, keyword: str,
                       message_key: str,
                       scope: tuple = ()) -> tuple[Column, Column]:
        """Map-typed child application: validate every entry whose key
        passes ``key_gate``; one summary violation on failure (per-entry
        rows would need posexplode, which the caller can do via ptr)."""
        def entry_ok(e):
            ectx = _Ctx(e["value"], val_dt, ctx.ptr, ctx.span_index, False)
            # NULL map value models absent (same gate as _child_check)
            return (~key_gate(e["key"]) | e["value"].isNull()
                    | self._node(sub_node, ectx, depth + 1, scope)[0])

        ok = F.forall(F.map_entries(ctx.col), entry_ok)
        valid = F.when(ctx.col.isNull(), F.lit(True)).otherwise(ok)
        return valid, self._emit(ctx, keyword, message_key, ~valid)

    def _children(self, node: SchemaNode, ctx: _Ctx, depth: int, checks,
                  scope: tuple = ()):
        kw = node.kw
        self._object_children(node, ctx, depth, checks, scope)

        arr = isinstance(ctx.dtype, T.ArrayType)
        elem_dt = ctx.dtype.elementType if arr else None

        def elem_pair(child_node, x, i):
            eptr = F.concat(ctx.ptr, F.lit("/"), i.cast("string"))
            span = ctx.span_index if ctx.span_index is not None else \
                i.cast("int")
            ectx = _Ctx(x, elem_dt, eptr, span, ctx.collect)
            return self._node(child_node, ectx, depth + 1, scope)

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
                    def _mk(cn, g):
                        def _elem_viols(x, i):
                            # build the (valid, viols) pair ONCE/element
                            v, viols = elem_pair(cn, x, i)
                            return F.when(g(i) & ~v, viols) \
                                .otherwise(_empty_viols())
                        return _elem_viols

                    per_elem = F.transform(ctx.col, _mk(child_node, gate))
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
                v, viols = self._node(child_node, ectx, depth + 1, scope)
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
                v, viols = self._node(child_node, ectx, depth + 1, scope)
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

        self._unevaluated(node, ctx, depth, checks, elem_pair, scope)

    # -- unevaluated* (SURVEY.md §7.3; reference: elements/
    # unevaluated_items.rb, unevaluated_properties.rb; evaluated tokens
    # merge only from VALID in-place applications, result.rb:47-63) ------------

    def _unevaluated(self, node: SchemaNode, ctx: _Ctx, depth: int,
                     checks, elem_pair, scope: tuple = ()):
        kw = node.kw
        if "unevaluatedProperties" in kw:
            if isinstance(ctx.dtype, T.MapType):
                raise TypedCompileError(
                    "unevaluatedProperties over MapType needs the generic "
                    f"path (unbounded key space) at {node.location}")
            if isinstance(ctx.dtype, T.StructType):
                sub = kw["unevaluatedProperties"]
                ev = self._eval_props(node, ctx, depth, include_self=False, scope=scope)
                fields = {f.name: f.dataType for f in ctx.dtype.fields}
                for name, fdt in fields.items():
                    applies = self._present(ctx, name) & ~ev[name]
                    v, sviols = self._child_check(
                        sub, ctx, name, ctx.col.getField(name), fdt, depth,
                        scope)
                    valid = F.when(applies, v).otherwise(F.lit(True))
                    if ctx.collect:
                        viols = F.when(applies & ~v, F.concat(
                            sviols, self._emit(
                                ctx, "unevaluatedProperties",
                                "validation.keyword.unevaluatedProperties."
                                "invalid"))).otherwise(_empty_viols())
                    else:
                        viols = _empty_viols()
                    checks.append((valid, viols))
        if "unevaluatedItems" in kw and isinstance(ctx.dtype, T.ArrayType):
            sub = kw["unevaluatedItems"]
            pred = self._eval_items_pred(node, ctx, depth,
                                         include_self=False, scope=scope)
            valid = _forall_idx(
                ctx.col, lambda x, i: pred(x, i) | elem_pair(sub, x, i)[0])
            valid = F.when(ctx.col.isNull(), F.lit(True)).otherwise(valid)
            viols = self._emit(ctx, "unevaluatedItems",
                               "validation.keyword.unevaluatedItems.invalid",
                               ~valid)
            checks.append((valid, viols))

    def _eval_props(self, node: SchemaNode, ctx: _Ctx, depth: int,
                    include_self: bool = True, scope: tuple = ()) -> dict:
        """Per-field 'evaluated' Columns at this instance location for
        schema object ``node``: a field is evaluated iff some applicator
        in the node's in-place application graph applied a schema to it
        AND that application validated (annotation semantics — failed
        schemas contribute nothing)."""
        if depth > self.max_ref_depth:
            raise TypedCompileError(
                f"$ref nesting exceeds {self.max_ref_depth} computing "
                f"evaluated-property masks at {node.location}")
        sres = node.scope_resource
        if sres is not None and (not scope or scope[-1] is not sres):
            scope = scope + (sres,)
        fields = {f.name: f.dataType for f in ctx.dtype.fields}
        ev = {name: F.lit(False) for name in fields}
        if not isinstance(node.value, dict):
            return ev
        kw = node.kw

        def add(name, col):
            ev[name] = ev[name] | col

        def child_valid(sub_node, name):
            cctx = _Ctx(ctx.col.getField(name), fields[name], ctx.ptr,
                        ctx.span_index, False)
            return self._node(sub_node, cctx, depth + 1, scope)[0]

        props = kw.get("properties", {})
        pprops = kw.get("patternProperties", ())
        for name in fields:
            if name in props:
                add(name, child_valid(props[name], name))
            for _p, rx, sub_node in pprops:
                if rx.search(name):
                    add(name, child_valid(sub_node, name))
        if "additionalProperties" in kw:
            for name in fields:
                if name in props or any(rx.search(name)
                                        for _p, rx, _n in pprops):
                    continue
                add(name, child_valid(kw["additionalProperties"], name))
        if include_self and "unevaluatedProperties" in kw:
            for name in fields:
                add(name, child_valid(kw["unevaluatedProperties"], name))

        def branch(sub_node, gate=None):
            bv = self._node(sub_node, ctx, depth + 1, scope)[0]
            g = bv if gate is None else (gate & bv)
            bev = self._eval_props(sub_node, ctx, depth + 1, scope=scope)
            for name in fields:
                add(name, bev[name] & g)

        if "ref" in kw:
            branch(kw["ref"])
        if "dynamic_ref" in kw:
            branch(self._dynamic_target(node, scope))
        for k in ("allOf", "anyOf", "oneOf"):
            for sub_node in kw.get(k, ()):
                branch(sub_node)
        if "if" in kw:
            if_valid = self._node(kw["if"], ctx, depth + 1, scope)[0]
            branch(kw["if"])
            if "then" in kw:
                branch(kw["then"], gate=if_valid)
            if "else" in kw:
                branch(kw["else"], gate=~if_valid)
        for dep_kw in ("dependentSchemas", "dependencies_schema"):
            for k, sub_node in kw.get(dep_kw, {}).items():
                branch(sub_node, gate=self._present(ctx, k))
        return ev

    def _eval_items_pred(self, node: SchemaNode, ctx: _Ctx, depth: int,
                         include_self: bool = True, scope: tuple = ()):
        """(x, i) -> 'evaluated' Column for array elements, composed
        across the node's in-place application graph with the same
        validity gating as ``_eval_props``."""
        if depth > self.max_ref_depth:
            raise TypedCompileError(
                f"$ref nesting exceeds {self.max_ref_depth} computing "
                f"evaluated-item masks at {node.location}")
        sres = node.scope_resource
        if sres is not None and (not scope or scope[-1] is not sres):
            scope = scope + (sres,)
        if not isinstance(node.value, dict):
            return lambda x, i: F.lit(False)
        kw = node.kw
        elem_dt = ctx.dtype.elementType
        preds = []

        def elem_valid(sub_node, x, i):
            ectx = _Ctx(x, elem_dt, ctx.ptr, ctx.span_index, False)
            return self._node(sub_node, ectx, depth + 1, scope)[0]

        for items_kw in ("items_schema", "items_rest"):
            if items_kw in kw:
                start = len(kw.get("prefixItems", ())) \
                    if items_kw == "items_rest" else 0
                sub_node = kw[items_kw]
                preds.append(lambda x, i, s=sub_node, st=start:
                             (i >= F.lit(st)) & elem_valid(s, x, i))
        for seq_kw in ("prefixItems", "items_tuple"):
            for j, sub_node in enumerate(kw.get(seq_kw, ())):
                preds.append(lambda x, i, s=sub_node, jj=j:
                             (i == F.lit(jj)) & elem_valid(s, x, i))
        if "additionalItems" in kw and "items_tuple" in kw:
            n = len(kw["items_tuple"])
            sub_node = kw["additionalItems"]
            preds.append(lambda x, i, s=sub_node:
                         (i >= F.lit(n)) & elem_valid(s, x, i))
        if "contains" in kw:
            sub_node = kw["contains"]
            preds.append(lambda x, i, s=sub_node: elem_valid(s, x, i))
        if include_self and "unevaluatedItems" in kw:
            sub_node = kw["unevaluatedItems"]
            preds.append(lambda x, i, s=sub_node: elem_valid(s, x, i))

        def branch(sub_node, gate=None):
            bv = self._node(sub_node, ctx, depth + 1, scope)[0]
            g = bv if gate is None else (gate & bv)
            bpred = self._eval_items_pred(sub_node, ctx, depth + 1, scope=scope)
            preds.append(lambda x, i, p=bpred, gg=g: p(x, i) & gg)

        if "ref" in kw:
            branch(kw["ref"])
        if "dynamic_ref" in kw:
            branch(self._dynamic_target(node, scope))
        for k in ("allOf", "anyOf", "oneOf"):
            for sub_node in kw.get(k, ()):
                branch(sub_node)
        if "if" in kw:
            if_valid = self._node(kw["if"], ctx, depth + 1, scope)[0]
            branch(kw["if"])
            if "then" in kw:
                branch(kw["then"], gate=if_valid)
            if "else" in kw:
                branch(kw["else"], gate=~if_valid)

        def combined(x, i):
            out = F.lit(False)
            for p in preds:
                out = out | p(x, i)
            return out

        return combined


def _deep_eq(col: Column, dt: T.DataType, v) -> Column:
    """JSON deep equality of a typed column against a literal JSON
    value (enum/const over composite types; reference canon semantics:
    elements/enum.rb, const.rb — 1 == 1.0, key-order-insensitive).
    Shape-incompatible literals are statically False. JSON ``null``
    literals can never match: on the typed path SQL NULL models
    ABSENT (documented deviation), so a null-valued member is
    unobservable."""
    if v is None:
        return F.lit(False)
    if isinstance(v, (bool, int, float, str)):
        if not _literal_matches(v, dt):
            return F.lit(False)
        return F.coalesce(col == F.lit(v), F.lit(False))
    if isinstance(v, list):
        if not isinstance(dt, T.ArrayType):
            return F.lit(False)
        ok = F.coalesce(F.size(col) == len(v), F.lit(False))
        for i, x in enumerate(v):
            ok = ok & F.coalesce(
                _deep_eq(F.element_at(col, i + 1), dt.elementType, x),
                F.lit(False))
        return ok
    if isinstance(v, dict):
        if isinstance(dt, T.MapType):
            ok = F.coalesce(
                F.array_sort(F.map_keys(col))
                == F.array(*[F.lit(k) for k in sorted(v)]), F.lit(False))
            for k, x in v.items():
                ok = ok & F.coalesce(
                    _deep_eq(F.element_at(col, F.lit(k)),
                             dt.valueType, x), F.lit(False))
            return ok
        if not isinstance(dt, T.StructType):
            return F.lit(False)
        fields = {f.name: f.dataType for f in dt.fields}
        if any(k not in fields for k in v):
            return F.lit(False)
        ok = F.lit(True)
        for f in dt.fields:
            g = col.getField(f.name)
            if f.name in v:
                ok = ok & F.coalesce(_deep_eq(g, f.dataType, v[f.name]),
                                     F.lit(False))
            else:
                ok = ok & g.isNull()
        return ok
    return F.lit(False)


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
