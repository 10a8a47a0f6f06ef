"""Schema compiler: JSON Schema → driver-compiled validator.

The analog of the reference's keyword-interpreter core — each keyword is a
``Schema::Element`` with a ``:validate`` action, composed per-draft into a
``Dialect`` that invokes actions in dependency order (reference:
lib/jsi/schema/element.rb:5-67, lib/jsi/schema/dialect.rb:10-102,
lib/jsi/schema.rb:864-890). Differences by design (Spark-first):

- Compilation happens ONCE on the driver; the compiled node graph is a
  plain-Python closure tree shipped (pickled) to executors inside Arrow-
  vectorized pandas UDFs (``jsi_spark.functions``) — executors never touch
  the registry, mirroring "instance-independent applicator memoization"
  (lib/jsi/schema.rb:684-711) taken to its limit.
- ``$ref`` cycles are guarded per instance location via a visited set,
  like the reference's ``visited_refs`` (lib/jsi/schema.rb:867,734).
- Evaluation-annotation tracking (``evaluated_tokens``) merges only from
  *valid* subschema results (lib/jsi/validation/result.rb:47-63), with
  ``if`` contributing annotations when it is valid
  (lib/jsi/schema/elements/if_then_else.rb:50-52).
- "Invalid application" semantics: when no anyOf/oneOf/contains branch
  validates, errors from ALL branches surface
  (lib/jsi/schema/elements/some_of.rb:69-74,131-137, contains.rb:23-30).

Keyword evaluation order per node: ``$ref`` first (exclusive in drafts
04/06/07 per elements/ref.rb:9-20), assertions, in-place applicators,
child applicators, ``unevaluated*`` last (elements/unevaluated_items.rb:8-13).
"""

from __future__ import annotations

import math
import re
from decimal import Decimal
from fractions import Fraction
from urllib.parse import urldefrag, urljoin

from jsi_spark.compile.dialects import (
    DIALECTS, DRAFT202012, Dialect, detect_dialect,
)
from jsi_spark.schema.pointer import Pointer, escape_token
from jsi_spark.schema.registry import Registry, ResolutionError, Resource
from jsi_spark.validation.result import Error, Result


class SchemaCompileError(ValueError):
    pass


class UnsupportedPatternError(SchemaCompileError):
    """A schema regex needs a module not available in this environment
    (see compile_regex: \\p{...} escapes need the third-party `regex`
    module on driver and executors)."""


# --------------------------------------------------------------------------
# JSON value semantics (reference: lib/jsi/schema/elements/type.rb:8-16
# duck-typed type tests; numeric equality 1 == 1.0 per Ruby ==, booleans
# distinct from numbers)
# --------------------------------------------------------------------------

def is_number(v) -> bool:
    return isinstance(v, (int, float)) and not isinstance(v, bool)


def check_type(t: str, v, integer_disallows_0_fraction: bool) -> bool:
    if t == "null":
        return v is None
    if t == "boolean":
        return isinstance(v, bool)
    if t == "object":
        return isinstance(v, dict)
    if t == "array":
        return isinstance(v, list)
    if t == "string":
        return isinstance(v, str)
    if t == "number":
        return is_number(v)
    if t == "integer":
        # reference: lib/jsi/schema/cxt.rb:51-55 internal_integer? —
        # floats with zero fraction are integers except in draft-04
        # (lib/jsi/schema/draft04.rb:114-118)
        if isinstance(v, bool):
            return False
        if isinstance(v, int):
            return True
        if isinstance(v, float):
            return (not integer_disallows_0_fraction) and v.is_integer()
        return False
    return False


def canon_key(v):
    """Hashable canonical form giving JSON deep-equality (1 == 1.0,
    True != 1, key-order-insensitive objects) — used for enum/const/
    uniqueItems (reference: elements/enum.rb, const.rb,
    array_validation.rb:57-81)."""
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, (int, float)):
        if isinstance(v, float) and not math.isfinite(v):
            return ("n", repr(v))
        return ("n", Fraction(v))
    if isinstance(v, str):
        return ("s", v)
    if v is None:
        return ("z",)
    if isinstance(v, list):
        return ("l", tuple(canon_key(x) for x in v))
    if isinstance(v, dict):
        return ("d", tuple(sorted((k, canon_key(x)) for k, x in v.items())))
    raise TypeError(f"not a JSON value: {type(v)}")


def compile_regex(pattern: str):
    """Schema regexes with ECMA-262-aligned predefined classes: Python's
    default makes \\d/\\w/\\s match the full unicode categories, but
    ECMA-262 (the spec's regex dialect), Java's (the typed path's
    ``rlike``), and Ruby's (the reference) keep them ASCII — without
    re.ASCII the generic and typed paths return DIFFERENT verdicts for
    e.g. pattern "^\\d+$" against "٣". Explicit classes ([0-9],
    [\\u00C0-\\u00FF], unicode literals) are unaffected by the flag.
    The official suite skips the residual divergences the flag can't
    align (the reference's own skip list, suite_test.rb:137-160).

    Unicode property escapes (\\p{L} / \\P{N} ...): Python's ``re``
    rejects them outright, but ECMA-262 (u-flag), Java (the typed
    path's ``rlike``) and Ruby (the reference) all accept them as
    Unicode category classes — a schema using them must not crash the
    generic path while the typed path validates it fine. Fall back to
    the ``regex`` module (default Unicode flags) for exactly those
    patterns. Known residual corner: a pattern mixing \\p{...} WITH
    predefined classes gets unicode \\d/\\w/\\s on the fallback path
    (official-suite skip-list territory, same bucket as above)."""
    try:
        return re.compile(pattern, re.ASCII)
    except re.error:
        if r"\p" in pattern or r"\P" in pattern:
            # OPTIONAL third-party dependency: the fallback needs the
            # `regex` module on the DRIVER *and* every executor Python
            # (compiled patterns ship inside the generic-path UDF
            # closure; the --py-files zip carries only jsi_spark).
            # Degrade at compile time with a named error rather than a
            # ModuleNotFoundError mid-job on an executor.
            try:
                import regex as _regex
            except ImportError as exc:
                raise UnsupportedPatternError(
                    f"pattern {pattern!r} uses unicode property escapes "
                    "(\\p{...}), which Python's re rejects; install the "
                    "third-party 'regex' module on the driver and all "
                    "executor Pythons to validate it on the generic "
                    "path (the typed path handles it natively via Java "
                    "rlike)") from exc
            return _regex.compile(pattern)
        raise


def is_multiple_of(v, q) -> bool:
    """reference: lib/jsi/schema/elements/numeric.rb:5-35 — modulo first,
    exact decimal (BigDecimal analog) fallback for float imprecision."""
    try:
        if not (isinstance(v, float) or isinstance(q, float)):
            return v % q == 0
        if math.fmod(v, q) == 0.0:
            return True
    except (ZeroDivisionError, ValueError):
        return False
    try:
        return Fraction(Decimal(str(v))) % Fraction(Decimal(str(q))) == 0
    except (ValueError, ZeroDivisionError, ArithmeticError):
        return False


# --------------------------------------------------------------------------
# Builder: per-(schema node, instance node) result accumulation
# --------------------------------------------------------------------------

class _Builder:
    __slots__ = ("result", "iptr", "collect", "node")

    def __init__(self, node: "SchemaNode", iptr: str, collect: bool):
        self.node = node
        self.iptr = iptr
        self.collect = collect
        self.result = Result()

    def fail(self, key: str, keyword: str | None, nested=(), iptr=None):
        self.result.valid = False
        if self.collect:
            self.result.errors.append(Error(
                key, keyword, self.iptr if iptr is None else iptr,
                self.node.location, tuple(nested)))

    def merge_valid(self, sub: Result):
        """Merge evaluation annotations from a *valid* in-place result
        (reference: lib/jsi/validation/result.rb:47-63)."""
        if sub.evaluated_items:
            self.result.evaluated_items |= sub.evaluated_items
        if sub.evaluated_props:
            self.result.evaluated_props |= sub.evaluated_props


# --------------------------------------------------------------------------
# Compiled schema node
# --------------------------------------------------------------------------

class SchemaNode:
    """One schema object/boolean, compiled. Created via
    ``CompiledSchema._node_for`` which caches by (resource uri, pointer) so
    cyclic ``$ref`` graphs compile without recursion."""

    def __init__(self, engine: "CompiledSchema", resource: Resource,
                 ptr: Pointer, dialect: Dialect):
        self.engine = engine
        self.resource = resource
        self.ptr = ptr
        self.key = (resource.uri, str(ptr))
        self.value = ptr.evaluate(resource.document)
        if isinstance(self.value, dict) and "$schema" in self.value:
            dialect = detect_dialect(self.value, dialect)
        self.dialect = dialect
        self.location = f"{resource.uri}#{ptr.fragment()}"
        # filled by _compile():
        self.kw: dict = {}
        self.scope_resource: Resource | None = None
        self.base_uri: str = resource.uri

    # -- compilation --------------------------------------------------------

    def _compile(self):
        v = self.value
        if isinstance(v, bool):
            return
        if not isinstance(v, dict):
            raise SchemaCompileError(
                f"schema at {self.location} is {type(v).__name__}, "
                "expected object or boolean")
        d = self.dialect
        kws = d.keywords
        kw = self.kw
        self._compile_base_uri()

        def sub(*path) -> SchemaNode:
            return self.engine._node_for(
                self.resource, self.ptr.child(*path), self.dialect)

        # $ref / $dynamicRef resolve at compile time against base_uri
        if "$ref" in v and isinstance(v["$ref"], str):
            kw["ref"] = self.engine._node_for_uri(
                urljoin(self.base_uri, v["$ref"]), self.dialect)
        if "$dynamicRef" in kws and isinstance(v.get("$dynamicRef"), str):
            target_uri = urljoin(self.base_uri, v["$dynamicRef"])
            frag = urldefrag(target_uri)[1]
            node = self.engine._node_for_uri(target_uri, self.dialect)
            # dynamic only when the initially-resolved target is itself a
            # $dynamicAnchor of the same name (2020-12 §8.2.3.2; reference:
            # lib/jsi/schema/elements/dynamic_ref.rb:5-68)
            if (frag and not frag.startswith("/")
                    and node.resource.dynamic_anchors.get(frag) == node.ptr):
                kw["dynamic_ref"] = (frag, node)
            else:
                kw["ref"] = kw.get("ref", node)

        if "type" in v and "type" in kws:
            ts = v["type"]
            kw["type"] = tuple(ts) if isinstance(ts, list) else (ts,)
        if "enum" in v and "enum" in kws and isinstance(v["enum"], list):
            kw["enum"] = frozenset(canon_key(x) for x in v["enum"])
        if "const" in v and "const" in kws:
            kw["const"] = canon_key(v["const"])

        # numeric
        if is_number(v.get("multipleOf")):
            kw["multipleOf"] = v["multipleOf"]
        if d.exclusive_minmax_boolean:
            # draft-04 boolean exclusive forms
            # (reference: elements/numeric_draft04.rb:5-75)
            if is_number(v.get("maximum")):
                kw["maximum"] = (v["maximum"], v.get("exclusiveMaximum") is True)
            if is_number(v.get("minimum")):
                kw["minimum"] = (v["minimum"], v.get("exclusiveMinimum") is True)
        else:
            if is_number(v.get("maximum")):
                kw["maximum"] = (v["maximum"], False)
            if is_number(v.get("minimum")):
                kw["minimum"] = (v["minimum"], False)
            if is_number(v.get("exclusiveMaximum")):
                kw["exclusiveMaximum"] = v["exclusiveMaximum"]
            if is_number(v.get("exclusiveMinimum")):
                kw["exclusiveMinimum"] = v["exclusiveMinimum"]

        # string
        if isinstance(v.get("maxLength"), int):
            kw["maxLength"] = v["maxLength"]
        if isinstance(v.get("minLength"), int):
            kw["minLength"] = v["minLength"]
        if isinstance(v.get("pattern"), str):
            # unanchored search, like Ruby Regexp#match
            # (reference: elements/pattern.rb:5-33; ECMA-262 caveat
            # README.md:181 — we use Python `re`, documented deviation)
            kw["pattern"] = (v["pattern"], compile_regex(v["pattern"]))

        # array assertions
        for k in ("maxItems", "minItems"):
            if isinstance(v.get(k), int):
                kw[k] = v[k]
        if v.get("uniqueItems") is True:
            kw["uniqueItems"] = True

        # object assertions
        for k in ("maxProperties", "minProperties"):
            if isinstance(v.get(k), int):
                kw[k] = v[k]
        if isinstance(v.get("required"), list):
            kw["required"] = tuple(v["required"])
        if ("dependentRequired" in kws
                and isinstance(v.get("dependentRequired"), dict)):
            kw["dependentRequired"] = {
                k: tuple(names) for k, names in v["dependentRequired"].items()
                if isinstance(names, list)}

        # dependencies: array form = dependentRequired, dict/bool form =
        # dependent schema (reference: elements/dependencies.rb:61-93)
        if "dependencies" in kws and isinstance(v.get("dependencies"), dict):
            dep_req, dep_sch = {}, {}
            for k, spec in v["dependencies"].items():
                if isinstance(spec, list):
                    dep_req[k] = tuple(spec)
                elif isinstance(spec, (dict, bool)):
                    dep_sch[k] = sub("dependencies", k)
            if dep_req:
                kw["dependencies_required"] = dep_req
            if dep_sch:
                kw["dependencies_schema"] = dep_sch
        if ("dependentSchemas" in kws
                and isinstance(v.get("dependentSchemas"), dict)):
            kw["dependentSchemas"] = {
                k: sub("dependentSchemas", k) for k in v["dependentSchemas"]}

        # in-place applicators (reference: elements/some_of.rb, not.rb,
        # if_then_else.rb)
        for k in ("allOf", "anyOf", "oneOf"):
            if isinstance(v.get(k), list) and v[k]:
                kw[k] = tuple(sub(k, str(i)) for i in range(len(v[k])))
        if "not" in v and isinstance(v["not"], (dict, bool)):
            kw["not"] = sub("not")
        if "if" in kws and isinstance(v.get("if"), (dict, bool)):
            kw["if"] = sub("if")
            if isinstance(v.get("then"), (dict, bool)):
                kw["then"] = sub("then")
            if isinstance(v.get("else"), (dict, bool)):
                kw["else"] = sub("else")

        # child applicators: objects (reference: elements/properties.rb,
        # property_names.rb)
        if isinstance(v.get("properties"), dict):
            kw["properties"] = {k: sub("properties", k)
                                for k in v["properties"]}
        if isinstance(v.get("patternProperties"), dict):
            kw["patternProperties"] = tuple(
                (p, compile_regex(p), sub("patternProperties", p))
                for p in v["patternProperties"])
        if isinstance(v.get("additionalProperties"), (dict, bool)):
            kw["additionalProperties"] = sub("additionalProperties")
        if ("propertyNames" in kws
                and isinstance(v.get("propertyNames"), (dict, bool))):
            kw["propertyNames"] = sub("propertyNames")

        # child applicators: arrays (reference: elements/items.rb:5-92,
        # items_prefixed.rb:5-96, contains.rb, contains_minmax.rb)
        if d.items_tuple_form:
            items = v.get("items")
            if isinstance(items, list):
                kw["items_tuple"] = tuple(
                    sub("items", str(i)) for i in range(len(items)))
                if isinstance(v.get("additionalItems"), (dict, bool)):
                    kw["additionalItems"] = sub("additionalItems")
            elif isinstance(items, (dict, bool)):
                kw["items_schema"] = sub("items")
        else:
            if isinstance(v.get("prefixItems"), list) and v["prefixItems"]:
                kw["prefixItems"] = tuple(
                    sub("prefixItems", str(i))
                    for i in range(len(v["prefixItems"])))
            if isinstance(v.get("items"), (dict, bool)):
                kw["items_rest"] = sub("items")
        if "contains" in kws and isinstance(v.get("contains"), (dict, bool)):
            kw["contains"] = sub("contains")
            if "minContains" in kws:
                mn = v.get("minContains")
                mx = v.get("maxContains")
                kw["minContains"] = mn if isinstance(mn, int) else 1
                if isinstance(mx, int):
                    kw["maxContains"] = mx

        # unevaluated* — evaluated-annotation dependent, runs last
        # (reference: elements/unevaluated_items.rb:5-53,
        # unevaluated_properties.rb:5-53)
        if ("unevaluatedItems" in kws
                and isinstance(v.get("unevaluatedItems"), (dict, bool))):
            kw["unevaluatedItems"] = sub("unevaluatedItems")
        if ("unevaluatedProperties" in kws
                and isinstance(v.get("unevaluatedProperties"), (dict, bool))):
            kw["unevaluatedProperties"] = sub("unevaluatedProperties")

        # registered custom keywords (plugin vocabulary surface,
        # compile/plugins.py; reference lib/jsi/schema.rb:560-604)
        from jsi_spark.compile import plugins

        for name, ck in plugins.registered().items():
            if name in v:
                kw[f"custom:{name}"] = (name, v[name],
                                        ck.compile_fn(v[name]))

    def _compile_base_uri(self):
        """Effective base URI at this node: walk from the resource root
        along the pointer, joining every ``$id`` (reference: elements/
        id.rb:5-29 establishes base URI)."""
        base = self.resource.uri
        node = self.resource.document
        dialect = self.dialect
        chain = [node]
        for tok in self.ptr.tokens:
            node = node[tok] if isinstance(node, dict) else node[int(tok)]
            chain.append(node)
        for i, n in enumerate(chain):
            if isinstance(n, dict):
                idv = n.get(dialect.id_keyword)
                if isinstance(idv, str) and not idv.startswith("#"):
                    base = urldefrag(urljoin(base, idv)).url
                    if i > 0:
                        # embedded resource root: dynamic scope pushes it
                        res = self.engine.registry.resources.get(base)
                        if i == len(chain) - 1 and res is not None:
                            self.scope_resource = res
        self.base_uri = base
        if len(self.ptr) == 0:
            self.scope_resource = self.resource

    # -- validation ----------------------------------------------------------

    def validate(self, instance, iptr: str = "", scope: tuple = (),
                 refs_seen: frozenset = frozenset(),
                 collect: bool = True) -> Result:
        # $ref-cycle guard per instance location (reference visited_refs,
        # lib/jsi/schema.rb:867,734)
        if self.key in refs_seen:
            return Result()
        refs_seen = refs_seen | {self.key}

        sres = self.scope_resource
        if sres is not None and (not scope or scope[-1] is not sres):
            scope = scope + (sres,)

        r = _Builder(self, iptr, collect)
        if self.value is True or self.value == {}:
            return r.result
        if self.value is False:
            # reference: elements/self.rb:5-22 — false schema always fails
            r.fail("validation.false_schema", None)
            return r.result

        kw = self.kw

        # --- $ref (exclusive in drafts <= 07: siblings ignored,
        #     elements/ref.rb:9-20) ---
        if "ref" in kw:
            sub = kw["ref"].validate(instance, iptr, scope, refs_seen, collect)
            if sub.valid:
                r.merge_valid(sub)
            else:
                r.fail("validation.keyword.$ref.invalid", "$ref", sub.errors)
            if self.dialect.ref_exclusive:
                return r.result
        if "dynamic_ref" in kw:
            anchor, static_node = kw["dynamic_ref"]
            target = static_node
            for res in scope:  # outermost-first
                p = res.dynamic_anchors.get(anchor)
                if p is not None:
                    target = self.engine._node_for(res, p, self.dialect)
                    break
            sub = target.validate(instance, iptr, scope, refs_seen, collect)
            if sub.valid:
                r.merge_valid(sub)
            else:
                r.fail("validation.keyword.$dynamicRef.invalid",
                       "$dynamicRef", sub.errors)

        self._validate_assertions(instance, r)
        if not collect and not r.result.valid:
            return r.result
        self._validate_inplace(instance, iptr, scope, refs_seen, collect, r)
        if not collect and not r.result.valid:
            return r.result
        if isinstance(instance, dict):
            self._validate_object_children(instance, iptr, scope, collect, r)
        elif isinstance(instance, list):
            self._validate_array_children(instance, iptr, scope, collect, r)
        self._validate_unevaluated(instance, iptr, scope, collect, r)
        return r.result

    # -- assertion keywords (row-local; reference §2.1) -----------------------

    def _validate_assertions(self, v, r: _Builder):
        kw = self.kw
        d = self.dialect
        if "type" in kw:
            if not any(check_type(t, v, d.integer_disallows_0_fraction)
                       for t in kw["type"]):
                r.fail("validation.keyword.type.not_match", "type")
        if "enum" in kw:
            try:
                if canon_key(v) not in kw["enum"]:
                    r.fail("validation.keyword.enum.none_equal", "enum")
            except TypeError:
                r.fail("validation.keyword.enum.none_equal", "enum")
        if "const" in kw:
            try:
                if canon_key(v) != kw["const"]:
                    r.fail("validation.keyword.const.not_equal", "const")
            except TypeError:
                r.fail("validation.keyword.const.not_equal", "const")

        if is_number(v):
            if "multipleOf" in kw and not is_multiple_of(v, kw["multipleOf"]):
                r.fail("validation.keyword.multipleOf.not_multiple",
                       "multipleOf")
            if "maximum" in kw:
                lim, excl = kw["maximum"]
                if excl:
                    if not v < lim:
                        r.fail("validation.keyword.maximum."
                               "with_exclusiveMaximum.greater_or_equal",
                               "maximum")
                elif not v <= lim:
                    r.fail("validation.keyword.maximum.greater", "maximum")
            if "minimum" in kw:
                lim, excl = kw["minimum"]
                if excl:
                    if not v > lim:
                        r.fail("validation.keyword.minimum."
                               "with_exclusiveMinimum.less_or_equal",
                               "minimum")
                elif not v >= lim:
                    r.fail("validation.keyword.minimum.less", "minimum")
            if "exclusiveMaximum" in kw and not v < kw["exclusiveMaximum"]:
                r.fail("validation.keyword.exclusiveMaximum.greater_or_equal",
                       "exclusiveMaximum")
            if "exclusiveMinimum" in kw and not v > kw["exclusiveMinimum"]:
                r.fail("validation.keyword.exclusiveMinimum.less_or_equal",
                       "exclusiveMinimum")

        if isinstance(v, str):
            if "maxLength" in kw and len(v) > kw["maxLength"]:
                r.fail("validation.keyword.maxLength.length_greater",
                       "maxLength")
            if "minLength" in kw and len(v) < kw["minLength"]:
                r.fail("validation.keyword.minLength.length_less", "minLength")
            if "pattern" in kw and kw["pattern"][1].search(v) is None:
                r.fail("validation.keyword.pattern.not_match", "pattern")

        if isinstance(v, list):
            if "maxItems" in kw and len(v) > kw["maxItems"]:
                r.fail("validation.keyword.maxItems.size_greater", "maxItems")
            if "minItems" in kw and len(v) < kw["minItems"]:
                r.fail("validation.keyword.minItems.size_less", "minItems")
            if "uniqueItems" in kw and len(v) > 1:
                try:
                    seen = {canon_key(x) for x in v}
                    unique = len(seen) == len(v)
                except TypeError:
                    unique = False
                if not unique:
                    r.fail("validation.keyword.uniqueItems.not_unique",
                           "uniqueItems")

        if isinstance(v, dict):
            if "maxProperties" in kw and len(v) > kw["maxProperties"]:
                r.fail("validation.keyword.maxProperties."
                       "properties_count_greater", "maxProperties")
            if "minProperties" in kw and len(v) < kw["minProperties"]:
                r.fail("validation.keyword.minProperties."
                       "properties_count_less", "minProperties")
            if "required" in kw:
                missing = [k for k in kw["required"] if k not in v]
                if missing:
                    r.fail("validation.keyword.required."
                           "missing_property_names", "required")
            if "dependentRequired" in kw:
                for k, names in kw["dependentRequired"].items():
                    if k in v and any(n not in v for n in names):
                        r.fail("validation.keyword.dependentRequired."
                               "missing_property_names", "dependentRequired")
            if "dependencies_required" in kw:
                for k, names in kw["dependencies_required"].items():
                    if k in v and any(n not in v for n in names):
                        r.fail("validation.keyword.dependencies."
                               "dependent_required.missing_property_names",
                               "dependencies")

        for key, entry in kw.items():
            if key.startswith("custom:"):
                name, _sval, check = entry
                try:
                    ok = bool(check(v))
                except Exception:
                    ok = False
                if not ok:
                    r.fail(f"validation.keyword.{name}.invalid", name)

    # -- in-place applicators (reference §2.2) --------------------------------

    def _validate_inplace(self, v, iptr, scope, refs_seen, collect,
                          r: _Builder):
        kw = self.kw

        def run(node: SchemaNode) -> Result:
            return node.validate(v, iptr, scope, refs_seen, collect)

        if "allOf" in kw:
            subs = [run(n) for n in kw["allOf"]]
            bad = [s for s in subs if not s.valid]
            for s in subs:
                if s.valid:
                    r.merge_valid(s)
            if bad:
                r.fail("validation.keyword.allOf.not_all_valid", "allOf",
                       [e for s in bad for e in s.errors])
        if "anyOf" in kw:
            subs = [run(n) for n in kw["anyOf"]]
            ok = [s for s in subs if s.valid]
            for s in ok:
                r.merge_valid(s)
            if not ok:
                # invalid application: all branches' errors surface
                # (reference: some_of.rb:69-74)
                r.fail("validation.keyword.anyOf.not_any_valid", "anyOf",
                       [e for s in subs for e in s.errors])
        if "oneOf" in kw:
            subs = [run(n) for n in kw["oneOf"]]
            ok = [s for s in subs if s.valid]
            for s in ok:
                r.merge_valid(s)
            if len(ok) == 0:
                r.fail("validation.keyword.oneOf.not_any_valid", "oneOf",
                       [e for s in subs for e in s.errors])
            elif len(ok) > 1:
                # distinct error key for multiple-valid
                # (reference: some_of.rb:155-173)
                r.fail("validation.keyword.oneOf.multiple_valid", "oneOf")
        if "not" in kw:
            sub = run(kw["not"])
            if sub.valid:
                r.fail("validation.keyword.not.valid", "not")
        if "if" in kw:
            cond = run(kw["if"])
            if cond.valid:
                # `if` contributes annotations when valid
                # (reference: if_then_else.rb:50-52)
                r.merge_valid(cond)
                if "then" in kw:
                    sub = run(kw["then"])
                    if sub.valid:
                        r.merge_valid(sub)
                    else:
                        r.fail("validation.keyword.then.invalid", "then",
                               sub.errors)
            else:
                if "else" in kw:
                    sub = run(kw["else"])
                    if sub.valid:
                        r.merge_valid(sub)
                    else:
                        r.fail("validation.keyword.else.invalid", "else",
                               sub.errors)
        if "dependencies_schema" in kw and isinstance(v, dict):
            for k, node in kw["dependencies_schema"].items():
                if k in v:
                    sub = run(node)
                    if sub.valid:
                        r.merge_valid(sub)
                    else:
                        r.fail("validation.keyword.dependencies."
                               "dependent_schema.invalid", "dependencies",
                               sub.errors)
        if "dependentSchemas" in kw and isinstance(v, dict):
            for k, node in kw["dependentSchemas"].items():
                if k in v:
                    sub = run(node)
                    if sub.valid:
                        r.merge_valid(sub)
                    else:
                        r.fail("validation.keyword.dependentSchemas.invalid",
                               "dependentSchemas", sub.errors)

    # -- child applicators: objects (reference §2.3) ---------------------------

    def _validate_object_children(self, v: dict, iptr, scope, collect,
                                  r: _Builder):
        kw = self.kw
        matched: set[str] = set()

        def child(node: SchemaNode, key: str, val) -> Result:
            return node.validate(val, iptr + "/" + escape_token(key),
                                 scope, frozenset(), collect)

        if "properties" in kw:
            for k, node in kw["properties"].items():
                if k in v:
                    matched.add(k)
                    sub = child(node, k, v[k])
                    if sub.valid:
                        r.result.evaluated_props.add(k)
                    else:
                        r.fail("validation.keyword.properties.invalid",
                               "properties", sub.errors,
                               iptr=iptr + "/" + escape_token(k))
        if "patternProperties" in kw:
            for pat, rx, node in kw["patternProperties"]:
                for k in v:
                    if rx.search(k) is not None:
                        matched.add(k)
                        sub = child(node, k, v[k])
                        if sub.valid:
                            r.result.evaluated_props.add(k)
                        else:
                            r.fail("validation.keyword.patternProperties."
                                   "invalid", "patternProperties", sub.errors,
                                   iptr=iptr + "/" + escape_token(k))
        if "additionalProperties" in kw:
            node = kw["additionalProperties"]
            for k in v:
                if k not in matched:
                    sub = child(node, k, v[k])
                    if sub.valid:
                        r.result.evaluated_props.add(k)
                    else:
                        r.fail("validation.keyword.additionalProperties."
                               "invalid", "additionalProperties", sub.errors,
                               iptr=iptr + "/" + escape_token(k))
        if "propertyNames" in kw:
            node = kw["propertyNames"]
            for k in v:
                sub = node.validate(k, iptr, scope, frozenset(), collect)
                if not sub.valid:
                    r.fail("validation.keyword.propertyNames.invalid",
                           "propertyNames", sub.errors)

    # -- child applicators: arrays ---------------------------------------------

    def _validate_array_children(self, v: list, iptr, scope, collect,
                                 r: _Builder):
        kw = self.kw

        def child(node: SchemaNode, i: int) -> Result:
            return node.validate(v[i], f"{iptr}/{i}", scope, frozenset(),
                                 collect)

        if "items_tuple" in kw:
            nodes = kw["items_tuple"]
            for i in range(min(len(nodes), len(v))):
                sub = child(nodes[i], i)
                if sub.valid:
                    r.result.evaluated_items.add(i)
                else:
                    r.fail("validation.keyword.items.array.invalid", "items",
                           sub.errors, iptr=f"{iptr}/{i}")
            if "additionalItems" in kw:
                for i in range(len(nodes), len(v)):
                    sub = child(kw["additionalItems"], i)
                    if sub.valid:
                        r.result.evaluated_items.add(i)
                    else:
                        r.fail("validation.keyword.additionalItems.invalid",
                               "additionalItems", sub.errors,
                               iptr=f"{iptr}/{i}")
        elif "items_schema" in kw:
            for i in range(len(v)):
                sub = child(kw["items_schema"], i)
                if sub.valid:
                    r.result.evaluated_items.add(i)
                else:
                    r.fail("validation.keyword.items.schema.invalid", "items",
                           sub.errors, iptr=f"{iptr}/{i}")

        prefix_len = 0
        if "prefixItems" in kw:
            nodes = kw["prefixItems"]
            prefix_len = len(nodes)
            for i in range(min(len(nodes), len(v))):
                sub = child(nodes[i], i)
                if sub.valid:
                    r.result.evaluated_items.add(i)
                else:
                    r.fail("validation.keyword.prefixItems.invalid",
                           "prefixItems", sub.errors, iptr=f"{iptr}/{i}")
        if "items_rest" in kw:
            for i in range(prefix_len, len(v)):
                sub = child(kw["items_rest"], i)
                if sub.valid:
                    r.result.evaluated_items.add(i)
                else:
                    r.fail("validation.keyword.items.after_prefixItems."
                           "invalid" if prefix_len else
                           "validation.keyword.items.invalid",
                           "items", sub.errors, iptr=f"{iptr}/{i}")

        if "contains" in kw:
            node = kw["contains"]
            results = [child(node, i) for i in range(len(v))]
            matched = [i for i, s in enumerate(results) if s.valid]
            r.result.evaluated_items.update(matched)
            mn = kw.get("minContains")
            if mn is None:
                # draft-06/07 contains: at least one
                # (reference: contains.rb:5-58)
                if not matched:
                    r.fail("validation.keyword.contains.none", "contains",
                           [e for s in results for e in s.errors])
            else:
                # 2020-12 (reference: contains_minmax.rb:41-87);
                # minContains=0 ⇒ always satisfied
                if len(matched) < mn:
                    key = ("validation.keyword.contains.none" if mn >= 1
                           and not matched else
                           "validation.keyword.contains."
                           "fewer_than_minContains")
                    if mn > 0:
                        r.fail(key, "contains",
                               [e for s in results for e in s.errors])
                if "maxContains" in kw and len(matched) > kw["maxContains"]:
                    r.fail("validation.keyword.maxContains."
                           "more_than_maxContains", "maxContains")

    # -- unevaluated* (runs last; reference §2.3 unevaluated_*) -----------------

    def _validate_unevaluated(self, v, iptr, scope, collect, r: _Builder):
        kw = self.kw
        if "unevaluatedItems" in kw and isinstance(v, list):
            node = kw["unevaluatedItems"]
            ev = r.result.evaluated_items
            for i in range(len(v)):
                if i in ev:
                    continue
                sub = node.validate(v[i], f"{iptr}/{i}", scope, frozenset(),
                                    collect)
                if sub.valid:
                    r.result.evaluated_items.add(i)
                else:
                    r.fail("validation.keyword.unevaluatedItems.invalid",
                           "unevaluatedItems", sub.errors, iptr=f"{iptr}/{i}")
        if "unevaluatedProperties" in kw and isinstance(v, dict):
            node = kw["unevaluatedProperties"]
            ev = r.result.evaluated_props
            for k in v:
                if k in ev:
                    continue
                sub = node.validate(v[k], iptr + "/" + escape_token(k), scope,
                                    frozenset(), collect)
                if sub.valid:
                    r.result.evaluated_props.add(k)
                else:
                    r.fail("validation.keyword.unevaluatedProperties.invalid",
                           "unevaluatedProperties", sub.errors,
                           iptr=iptr + "/" + escape_token(k))


# --------------------------------------------------------------------------
# Engine
# --------------------------------------------------------------------------

class CompiledSchema:
    """A schema compiled against a registry; the driver-side artifact.

    Analog of ``JSI.new_schema`` (reference: lib/jsi/schema.rb:248-309 +
    schema_set.rb:101-134) with the node graph taking the place of
    memoized schema classes.
    """

    def __init__(self, schema, registry: Registry | None = None,
                 dialect: Dialect | None = None, uri: str | None = None):
        self.registry = registry or Registry()
        if dialect is None:
            dialect = detect_dialect(schema, self.registry.default_dialect)
        self.dialect = dialect
        base = self.registry.register(schema, uri=uri, dialect=dialect)
        self.root_resource = self.registry.resources[base]
        self._nodes: dict[tuple, SchemaNode] = {}
        self.root = self._node_for(self.root_resource, Pointer(), dialect)

    # node cache: insert before compiling so $ref cycles terminate
    def _node_for(self, resource: Resource, ptr: Pointer,
                  dialect: Dialect) -> SchemaNode:
        key = (resource.uri, str(ptr))
        node = self._nodes.get(key)
        if node is None:
            node = SchemaNode(self, resource, ptr, dialect)
            self._nodes[key] = node
            node._compile()
        return node

    def _node_for_uri(self, uri: str, dialect: Dialect) -> SchemaNode:
        try:
            resource, ptr, _ = self.registry.resolve(uri)
        except ResolutionError as e:
            raise SchemaCompileError(str(e)) from e
        return self._node_for(resource, ptr, resource.dialect or dialect)

    def validate(self, instance, collect: bool = True) -> Result:
        return self.root.validate(instance, collect=collect)

    def is_valid(self, instance) -> bool:
        return self.root.validate(instance, collect=False).valid


def compile_schema(schema, registry: Registry | None = None,
                   dialect: Dialect | str | None = None,
                   uri: str | None = None,
                   validate_schema: bool = True) -> CompiledSchema:
    """Compile a JSON Schema (dict or boolean) for repeated validation.

    ``dialect`` may be a Dialect or a name in {'draft4','draft6','draft7',
    'draft2020-12'}; default: detected from ``$schema``, falling back to
    2020-12 (reference default-metaschema behavior, lib/jsi.rb:159-182).

    ``validate_schema`` (default on) first validates the schema DOCUMENT
    against its dialect's meta-schema (schema-as-instance, the
    reference's MetaSchemaNode behavior) and raises
    ``jsi_spark.schema.metaschema.SchemaDocumentError`` with
    keyword-level errors for malformed schemas.
    """
    if isinstance(dialect, str):
        dialect = DIALECTS[dialect]
    if validate_schema:
        from jsi_spark.schema.metaschema import check_schema_document

        check_schema_document(
            schema, dialect if isinstance(dialect, Dialect) else None)
    return CompiledSchema(schema, registry=registry, dialect=dialect, uri=uri)
