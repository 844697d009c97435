"""OTTL-lite: lexer + recursive-descent parser + vectorized evaluator.

A from-scratch, columnar re-expression of the OpenTelemetry
Transformation Language subset used by transformprocessor /
filterprocessor / routingconnector.  Reference semantics (not code):

- grammar: ``editor(args...) [where <bool expr>]`` —
  /root/reference/pkg/ottl/grammar.go:15-19 (ParsedStatement),
  boolean expressions :106-180, math :194-266.
- comparison coercion (mixed int/float compared as float, nil
  comparisons false, strings bytewise): pkg/ottl/LANGUAGE.md:261-286.
- error modes ignore/silent/propagate: pkg/ottl/parser.go:306-392.

Execution model difference (the point of this project): OTTL
interprets each statement per record against a mutable object tree;
here a statement COMPILES to vectorized pyarrow.compute kernels over
whole Arrow record batches, evaluated inside ``Dataset.map_batches``.

Path model: the engine runs over flat Arrow tables.  OTTL paths map
to columns:

    text / body               -> column "text"
    attributes["k"]           -> column "attr_k"   (promoted typed column)
    resource.attributes["k"]  -> column "res_k"
    cache["k"]                -> column "cache_k"  (dropped at stage end)
    anything else             -> column of the same (dotted->underscored) name
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any, Callable

import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------- lexer

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<string>"(?:[^"\\]|\\.)*")
  | (?P<hex>0[xX][0-9a-fA-F]+)
  | (?P<float>-?\d+\.\d*(?:[eE][+-]?\d+)?|-?\d+[eE][+-]?\d+)
  | (?P<int>-?\d+)
  | (?P<op>==|!=|<=|>=|&&|\|\||[<>+\-*/%(),\[\]\.{}:=])
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
    """,
    re.VERBOSE,
)

_KEYWORDS = {"and", "or", "not", "where", "true", "false", "nil"}

# pdata enum symbols the OTTL grammar resolves to int64 (contexts'
# EnumSymbol tables: ottllog severity numbers, ottlspan kind/status,
# ottlmetric aggregation temporality)
OTTL_ENUMS: dict[str, int] = {"SEVERITY_NUMBER_UNSPECIFIED": 0}
for _i, _lvl in enumerate(["TRACE", "DEBUG", "INFO", "WARN", "ERROR",
                           "FATAL"]):
    for _j in range(4):
        OTTL_ENUMS[f"SEVERITY_NUMBER_{_lvl}" + (str(_j + 1) if _j else "")] \
            = _i * 4 + _j + 1
OTTL_ENUMS.update({
    "SPAN_KIND_UNSPECIFIED": 0, "SPAN_KIND_INTERNAL": 1,
    "SPAN_KIND_SERVER": 2, "SPAN_KIND_CLIENT": 3, "SPAN_KIND_PRODUCER": 4,
    "SPAN_KIND_CONSUMER": 5,
    "STATUS_CODE_UNSET": 0, "STATUS_CODE_OK": 1, "STATUS_CODE_ERROR": 2,
    "AGGREGATION_TEMPORALITY_UNSPECIFIED": 0,
    "AGGREGATION_TEMPORALITY_DELTA": 1,
    "AGGREGATION_TEMPORALITY_CUMULATIVE": 2,
    "FLAG_NONE": 0, "FLAG_SAMPLED": 1,
})

# declared parameter order per function that accepts OTTL named
# arguments (`name=expr`); named args slot into their position, holes
# fill with nil — each function's default handling treats None as unset
_NAMED_PARAMS: dict[str, list[str]] = {
    "ParseCSV": ["target", "header", "delimiter", "headerDelimiter",
                 "mode"],
    "ParseKeyValue": ["target", "delimiter", "pair_delimiter"],
    "ToKeyValueString": ["target", "delimiter", "pair_delimiter",
                         "sort_output"],
    "ExtractGrokPatterns": ["target", "pattern", "namedCapturesOnly",
                            "patternDefinitions"],
    "Decode": ["target", "encoding"],
    "Substring": ["target", "start", "length"],
    "Sort": ["target", "order"],
    "flatten": ["target", "prefix", "depth", "resolveConflicts"],
    "append": ["target", "value", "values"],
    "limit": ["target", "limit", "priority_keys"],
    "truncate_all": ["target", "limit"],
    "replace_pattern": ["target", "regex_pattern", "replacement",
                        "function", "replacementFormat"],
    "replace_all_patterns": ["target", "mode", "regex_pattern",
                             "replacement", "function",
                             "replacementFormat"],
}


def _merge_named_args(fname: str, args: list, kwargs: dict) -> list:
    if not kwargs:
        return args
    order = _NAMED_PARAMS.get(fname)
    if order is None:
        raise SyntaxError(f"{fname} does not accept named arguments")
    slots: dict[int, Node] = dict(enumerate(args))
    for name, node in kwargs.items():
        try:
            idx = order.index(name)
        except ValueError:
            raise SyntaxError(f"unknown named argument {name!r} for {fname}")
        if idx in slots:
            raise SyntaxError(f"argument {name!r} given twice in {fname}")
        slots[idx] = node
    return [slots.get(i, Literal(None)) for i in range(max(slots) + 1)]


@dataclass
class Tok:
    kind: str  # 'string' | 'int' | 'float' | 'op' | 'ident' | 'kw' | 'eof'
    val: Any
    pos: int


def tokenize(src: str) -> list[Tok]:
    toks: list[Tok] = []
    pos = 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            raise SyntaxError(f"bad token at {pos}: {src[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        v: Any = m.group()
        if kind == "string":
            v = v[1:-1].encode().decode("unicode_escape")
        elif kind == "hex":
            # OTTL bytes literal (0x0102... — grammar.go Bytes); odd
            # nibble counts pad left like Go's hex.DecodeString rejects,
            # but OTTL only ever writes even-length ids
            h = v[2:]
            v = bytes.fromhex("0" + h if len(h) % 2 else h)
            kind = "bytes"
        elif kind == "int":
            v = int(v)
        elif kind == "float":
            v = float(v)
        elif kind == "ident" and v in _KEYWORDS:
            kind = "kw"
        toks.append(Tok(kind, v, m.start()))
    toks.append(Tok("eof", None, len(src)))
    return toks


# ---------------------------------------------------------------- AST

NULL_MEANS_FALSE = True


class Node:
    def eval(self, ctx: "ExprContext") -> Any:  # pa array | python scalar
        raise NotImplementedError


@dataclass
class Literal(Node):
    value: Any  # str | int | float | bool | None | list

    def eval(self, ctx):
        if isinstance(self.value, list):
            return [v.eval(ctx) if isinstance(v, Node) else v for v in self.value]
        return self.value


# metric-level fields addressable from the metric context and (via the
# explicit ``metric.`` prefix) from the datapoint context —
# contexts/internal/metric.go:35-47
_METRIC_FIELDS = {"name", "description", "unit", "type",
                  "aggregation_temporality", "is_monotonic"}


@dataclass
class Path(Node):
    """A field path; resolves to one column of the batch.

    ``context`` selects the statement context (transformprocessor
    ContextStatements.Context, internal/common/config.go:14-21).  The
    engine runs over FLATTENED tables — one row per log record /
    datapoint with metric-level fields as ``metric_*`` columns — so
    context addressing is a column-naming map, not an object tree:

    - context 'metric': bare ``name``/``unit``/``type``/... resolve to
      ``metric_<field>`` (contexts/internal/metric.go:35-47).
    - context 'datapoint': ``metric.X`` is the upward reference to the
      enclosing metric (ottldatapoint/datapoint.go:198) ->
      ``metric_X``; bare datapoint fields (``value_double``, ``count``,
      ``time_unix_nano``, ...) resolve to same-named columns and
      ``attributes["k"]`` to ``attr_k`` as in the log context.
    - context None (legacy/log): ``log./span./datapoint./metric.``
      prefixes strip, i.e. ``datapoint.X == X``.
    """

    segments: tuple[str, ...]
    context: str | None = None

    @property
    def column(self) -> str:
        s = self.segments
        if self.context == "resource":
            # ottlresource context (contexts/ottlresource/resource.go):
            # bare attributes/fields address the RESOURCE, i.e. res_*
            if s[0] == "resource" and len(s) > 1:
                s = s[1:]
            if s[0] == "cache":
                return "cache_" + "_".join(s[1:])
            if s[0] == "attributes":
                return "res_" + "_".join(s[1:])
            return "res_" + "_".join(s)
        if self.context == "scope":
            # ottlscope context: name/version/attributes of the
            # instrumentation scope -> scope_* columns
            if s[0] == "instrumentation_scope" and len(s) > 1:
                s = s[1:]
            if s[0] == "cache":
                return "cache_" + "_".join(s[1:])
            if s[0] == "attributes":
                return "scope_attr_" + "_".join(s[1:])
            if s[0] == "resource":
                rest = s[1:]
                if rest and rest[0] == "attributes":
                    rest = rest[1:]
                return "res_" + "_".join(rest) if rest else "res"
            return "scope_" + "_".join(s)
        if self.context in ("metric", "datapoint"):
            if s[0] == "metric" and len(s) > 1:
                return "metric_" + "_".join(s[1:])
            if s[0] == "datapoint" and len(s) > 1:
                s = s[1:]
            if self.context == "metric" and s[0] in _METRIC_FIELDS:
                return "metric_" + "_".join(s)
        # context prefixes (transformprocessor statement contexts,
        # internal/common/config.go:14-20): log.X / span.X / datapoint.X == X
        elif s[0] in ("log", "span", "spanevent", "datapoint", "metric") and len(s) > 1:
            s = s[1:]
        if s[0] in ("body", "text"):
            rest = s[1:]
            return "_".join(("text",) + rest) if rest else "text"
        if s[0] == "attributes":
            return "attr_" + "_".join(s[1:])
        if s[0] == "resource":
            rest = s[1:]
            if rest and rest[0] == "attributes":
                rest = rest[1:]
            return "res_" + "_".join(rest) if rest else "res"
        if s[0] == "cache":
            return "cache_" + "_".join(s[1:])
        if s[0] == "instrumentation_scope":
            return "scope_" + "_".join(s[1:])
        return "_".join(s)

    def eval(self, ctx):
        col = ctx.get_col(self.column)
        if col is None:
            return pa.nulls(ctx.n)
        return col


@dataclass
class MapLiteral(Node):
    """OTTL map literal {"k": expr, ...} -> struct array (grammar.go
    mapValue production)."""

    items: list[tuple[str, Node]]

    def eval(self, ctx):
        arrays, names = [], []
        for k, node in self.items:
            v = as_array(node.eval(ctx), ctx.n)
            if isinstance(v, pa.ChunkedArray):
                v = v.combine_chunks()
            arrays.append(v)
            names.append(k)
        return pc.make_struct(*arrays, field_names=names)


@dataclass
class Call(Node):
    name: str
    args: list[Node]

    def eval(self, ctx):
        from .registry import get_function

        kind, fn = get_function(self.name)
        if kind != "converter":
            raise TypeError(f"{self.name} is an editor, not usable in an expression")
        return fn(ctx, self.args)


@dataclass
class Index(Node):
    """Postfix ["key"] / [int] on an expression result (struct field / list item)."""

    base: Node
    key: Any

    def eval(self, ctx):
        v = as_array(self.base.eval(ctx), ctx.n)
        if isinstance(self.key, str):
            if pa.types.is_struct(v.type):
                return pc.struct_field(v, self.key)
            if pa.types.is_map(v.type):
                # map lookup: rebuild per-row; rare path
                py = v.to_pylist()
                return pa.array([dict(x or {}).get(self.key) for x in py])
            raise TypeError(f"cannot index {v.type} with string key")
        if pa.types.is_list(v.type) or pa.types.is_large_list(v.type):
            # out-of-bounds -> null (OTTL errors per record; ignore-mode
            # equivalent), via a null-padded fixed-size slice
            sliced = pc.list_slice(v, self.key, self.key + 1,
                                   return_fixed_size_list=True)
            return pc.list_element(sliced, 0)
        raise TypeError(f"cannot index {v.type} with int")


@dataclass
class Unary(Node):
    op: str  # 'not' | '-'
    operand: Node

    def eval(self, ctx):
        v = self.operand.eval(ctx)
        if self.op == "not":
            arr = as_bool(v, ctx.n)
            return pc.invert(arr)
        if isinstance(v, (int, float)):
            return -v
        return pc.negate(as_array(v, ctx.n))


_CMP = {"==": "equal", "!=": "not_equal", "<": "less", "<=": "less_equal",
        ">": "greater", ">=": "greater_equal"}
_MATH = {"+": "add", "-": "subtract", "*": "multiply", "/": "divide", "%": "mod"}


@dataclass
class Binary(Node):
    op: str
    left: Node
    right: Node

    def eval(self, ctx):
        op = self.op
        if op in ("and", "or"):
            l = as_bool(self.left.eval(ctx), ctx.n)
            r = as_bool(self.right.eval(ctx), ctx.n)
            return pc.and_(l, r) if op == "and" else pc.or_(l, r)
        l, r = self.left.eval(ctx), self.right.eval(ctx)
        if op in _CMP:
            return compare(l, r, op, ctx.n)
        # math
        if isinstance(l, (int, float)) and isinstance(r, (int, float)):
            return {"+": lambda: l + r, "-": lambda: l - r, "*": lambda: l * r,
                    "/": lambda: l / r, "%": lambda: l % r}[op]()
        la, ra = as_array(l, ctx.n), as_array(r, ctx.n)
        if op == "+" and pa.types.is_string(la.type):
            return pc.binary_join_element_wise(la, as_array(r, ctx.n).cast(pa.string()), "")
        if op == "%":
            # Go-style truncated modulo: a - trunc(a/b)*b
            q = pc.divide(la, ra)  # integer divide truncates for ints
            if pa.types.is_floating(q.type):
                q = pc.trunc(q)
            return pc.subtract(la, pc.multiply(q, ra))
        fn = getattr(pc, _MATH[op])
        try:
            return fn(la, ra)
        except pa.ArrowNotImplementedError:
            return fn(la.cast(pa.float64()), ra.cast(pa.float64()))


# ------------------------------------------------------------ eval helpers


def as_array(v: Any, n: int) -> pa.ChunkedArray | pa.Array:
    """Broadcast python scalars to length-n arrays; pass arrays through."""
    if isinstance(v, (pa.Array, pa.ChunkedArray)):
        return v
    if v is None:
        return pa.nulls(n)
    if isinstance(v, bool):
        return pa.array([v] * n, type=pa.bool_())
    if isinstance(v, int):
        return pa.array([v] * n, type=pa.int64())
    if isinstance(v, float):
        return pa.array([v] * n, type=pa.float64())
    if isinstance(v, str):
        return pa.repeat(pa.scalar(v), n) if n else pa.array([], type=pa.string())
    if isinstance(v, pa.Scalar):  # e.g. Duration(...) literals
        return pa.repeat(v, n) if n else pa.array([], type=v.type)
    raise TypeError(f"cannot broadcast {type(v)}")


def as_bool(v: Any, n: int) -> pa.ChunkedArray | pa.Array:
    """Boolean mask with OTTL nil semantics: null comparisons are false."""
    arr = as_array(v, n)
    if not pa.types.is_boolean(arr.type):
        raise TypeError(f"expected boolean expression, got {arr.type}")
    return pc.fill_null(arr, False)


def compare(l: Any, r: Any, op: str, n: int):
    """OTTL comparison: mixed int/float as double; nil -> false (== nil true);
    incompatible types -> false for ==, true for !=, false for orderings
    (LANGUAGE.md:261-286)."""
    kernel = getattr(pc, _CMP[op])
    # nil literal comparisons -> is_null checks
    if l is None or r is None:
        other = r if l is None else l
        arr = as_array(other, n)
        isnull = pc.is_null(arr)
        if op == "==":
            return isnull
        if op == "!=":
            return pc.invert(isnull)
        return pa.array([False] * n, type=pa.bool_())
    la, ra = as_array(l, n), as_array(r, n)
    lt, rt = la.type, ra.type
    num = lambda t: pa.types.is_integer(t) or pa.types.is_floating(t)
    try:
        if num(lt) and num(rt) and lt != rt:
            la, ra = la.cast(pa.float64()), ra.cast(pa.float64())
        out = kernel(la, ra)
        # null-operand semantics (compare.go invalidComparison +
        # LANGUAGE.md table): nil vs value -> false for ==/orderings,
        # TRUE for !=; nil vs nil -> true for ==, false for !=
        if op in ("==", "!="):
            both_null = pc.and_(pc.is_null(la), pc.is_null(ra))
            eq_null = op == "=="
            out = pc.if_else(both_null, pa.scalar(eq_null), out)
            return pc.fill_null(out, not eq_null)
        return pc.fill_null(out, False)
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
        const = op == "!="  # incompatible types: != true, everything else false
        return pa.array([const] * n, type=pa.bool_())


# ---------------------------------------------------------------- context


class ExprContext:
    """Wraps one Arrow batch during statement evaluation.

    Mirrors ottllog.TransformContext (record+resource+cache in one
    bundle — reference pkg/ottl/contexts/ottllog/log.go:34-41) except
    the "record" is a whole columnar batch.
    """

    def __init__(self, table: pa.Table):
        self.table = table
        self.n = table.num_rows

    def get_col(self, name: str):
        if name in self.table.column_names:
            return self.table.column(name)
        return None

    def set_col(self, name: str, value: Any, mask=None) -> None:
        arr = as_array(value, self.n)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if mask is not None:
            existing = self.get_col(name)
            if existing is None:
                existing = pa.nulls(self.n, type=arr.type)
            else:
                if isinstance(existing, pa.ChunkedArray):
                    existing = existing.combine_chunks()
                if existing.type != arr.type:
                    try:
                        existing = existing.cast(arr.type)
                    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                        existing = pa.nulls(self.n, type=arr.type)
            arr = pc.if_else(mask, arr, existing)
        if name in self.table.column_names:
            i = self.table.column_names.index(name)
            self.table = self.table.set_column(i, name, arr)
        else:
            self.table = self.table.append_column(name, arr)

    def drop_cols(self, names: list[str]) -> None:
        keep = [c for c in self.table.column_names if c not in set(names)]
        self.table = self.table.select(keep)

    def attr_cols(self) -> list[str]:
        return [c for c in self.table.column_names if c.startswith("attr_")]


# ---------------------------------------------------------------- parser


class Parser:
    def __init__(self, src: str, context: str | None = None):
        if context not in (None, "log", "span", "spanevent", "metric",
                           "datapoint", "resource", "scope"):
            raise ValueError(f"unknown statement context {context!r}")
        self.toks = tokenize(src)
        self.i = 0
        self.context = context

    def peek(self) -> Tok:
        return self.toks[self.i]

    def next(self) -> Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind: str, val: Any = None) -> Tok:
        t = self.next()
        if t.kind != kind or (val is not None and t.val != val):
            raise SyntaxError(f"expected {val or kind}, got {t.val!r} at {t.pos}")
        return t

    def at_op(self, *vals: str) -> bool:
        t = self.peek()
        return t.kind == "op" and t.val in vals

    def at_kw(self, *vals: str) -> bool:
        t = self.peek()
        return t.kind == "kw" and t.val in vals

    # expr := or_expr
    def parse_expr(self) -> Node:
        return self._or()

    def _or(self) -> Node:
        left = self._and()
        while self.at_kw("or") or self.at_op("||"):
            self.next()
            left = Binary("or", left, self._and())
        return left

    def _and(self) -> Node:
        left = self._not()
        while self.at_kw("and") or self.at_op("&&"):
            self.next()
            left = Binary("and", left, self._not())
        return left

    def _not(self) -> Node:
        if self.at_kw("not"):
            self.next()
            return Unary("not", self._not())
        return self._cmp()

    def _cmp(self) -> Node:
        left = self._add()
        if self.at_op("==", "!=", "<", "<=", ">", ">="):
            op = self.next().val
            return Binary(op, left, self._add())
        return left

    def _add(self) -> Node:
        left = self._mul()
        while self.at_op("+", "-"):
            op = self.next().val
            left = Binary(op, left, self._mul())
        return left

    def _mul(self) -> Node:
        left = self._unary()
        while self.at_op("*", "/", "%"):
            op = self.next().val
            left = Binary(op, left, self._unary())
        return left

    def _unary(self) -> Node:
        if self.at_op("-"):
            self.next()
            return Unary("-", self._unary())
        return self._postfix()

    def _postfix(self) -> Node:
        node = self._primary()
        while True:
            if self.at_op("["):
                # postfix index on non-path expressions
                if isinstance(node, Path):
                    self.next()
                    t = self.next()
                    if t.kind not in ("string", "int"):
                        raise SyntaxError(f"bad index at {t.pos}")
                    self.expect("op", "]")
                    if t.kind == "string":
                        node = Path(node.segments + (t.val,), node.context)
                    else:
                        node = Index(node, t.val)
                else:
                    self.next()
                    t = self.next()
                    if t.kind not in ("string", "int"):
                        raise SyntaxError(f"bad index at {t.pos}")
                    self.expect("op", "]")
                    node = Index(node, t.val)
            elif self.at_op(".") and isinstance(node, Path):
                self.next()
                t = self.expect("ident")
                node = Path(node.segments + (t.val,), node.context)
            else:
                return node

    def _primary(self) -> Node:
        t = self.peek()
        if t.kind in ("string", "int", "float", "bytes"):
            self.next()
            return Literal(t.val)
        if t.kind == "kw" and t.val in ("true", "false"):
            self.next()
            return Literal(t.val == "true")
        if t.kind == "kw" and t.val == "nil":
            self.next()
            return Literal(None)
        if self.at_op("("):
            self.next()
            node = self.parse_expr()
            self.expect("op", ")")
            return node
        if self.at_op("["):
            self.next()
            items: list[Node] = []
            if not self.at_op("]"):
                items.append(self.parse_expr())
                while self.at_op(","):
                    self.next()
                    items.append(self.parse_expr())
            self.expect("op", "]")
            return Literal(items)
        if t.kind == "op" and t.val == "{":
            self.next()
            entries: list[tuple[str, Node]] = []
            if not (self.peek().kind == "op" and self.peek().val == "}"):
                while True:
                    k = self.expect("string").val
                    self.expect("op", ":")
                    entries.append((k, self.parse_expr()))
                    if self.at_op(","):
                        self.next()
                        continue
                    break
            self.expect("op", "}")
            return MapLiteral(entries)
        if t.kind == "ident":
            self.next()
            if self.at_op("("):
                self.next()
                args, kwargs = self._call_args(t.val)
                return Call(t.val, _merge_named_args(t.val, args, kwargs))
            if t.val in OTTL_ENUMS:
                # pdata enum symbol (ottl grammar Enum; e.g.
                # SEVERITY_NUMBER_TRACE == 1) — resolves to its int
                return Literal(OTTL_ENUMS[t.val])
            return Path((t.val,), self.context)
        raise SyntaxError(f"unexpected {t.val!r} at {t.pos}")

    def _call_args(self, fname: str):
        """Positional + OTTL named arguments (`name=expr`,
        grammar.go argument := (ident "=")? expr)."""
        args: list[Node] = []
        kwargs: dict[str, Node] = {}
        if not self.at_op(")"):
            while True:
                t = self.peek()
                nxt = self.toks[self.i + 1] if self.i + 1 < len(self.toks) \
                    else None
                if (t.kind == "ident" and nxt is not None
                        and nxt.kind == "op" and nxt.val == "="):
                    self.next()
                    self.next()
                    if kwargs and t.val in kwargs:
                        raise SyntaxError(f"duplicate named arg {t.val!r}")
                    kwargs[t.val] = self.parse_expr()
                else:
                    if kwargs:
                        raise SyntaxError(
                            "positional argument after named argument "
                            f"in {fname} at {t.pos}")
                    args.append(self.parse_expr())
                if self.at_op(","):
                    self.next()
                    continue
                break
        self.expect("op", ")")
        return args, kwargs


@dataclass
class Statement:
    """editor(args...) [where cond] — compiled once, applied per batch."""

    editor: str
    args: list[Node]
    where: Node | None
    source: str

    def _apply_once(self, table: pa.Table, gate=None) -> pa.Table:
        from .registry import get_function

        ctx = ExprContext(table)
        mask = None
        if self.where is not None:
            mask = as_bool(self.where.eval(ctx), ctx.n)
            if isinstance(mask, pa.ChunkedArray):
                mask = mask.combine_chunks()
        if gate is not None:
            # ContextStatements.Conditions gate: AND into the where mask
            mask = gate if mask is None else pc.and_(pc.fill_null(mask, False),
                                                     gate)
        kind, fn = get_function(self.editor)
        if kind != "editor":
            raise TypeError(f"{self.editor} is not an editor")
        fn(ctx, self.args, mask)
        return ctx.table

    def apply(self, table: pa.Table, error_mode: str = "propagate",
              gate=None) -> pa.Table:
        try:
            return self._apply_once(table, gate=gate)
        except Exception:
            if error_mode not in ("ignore", "silent"):
                raise
            # per-RECORD ignore semantics (parser.go:338-341 skips only the
            # failing record): binary split-retry so one bad value leaves
            # the rest of the batch transformed; a failing half keeps its
            # original columns and the permissive concat null-pads any
            # column the succeeding half added.
            if table.num_rows <= 1:
                return table
            # data-INDEPENDENT errors (unknown function, bad arguments)
            # fail identically on an empty slice — probe once instead of
            # recursing through O(2n) failing sub-applies
            try:
                self._apply_once(table.slice(0, 0))
            except Exception:
                return table
            mid = table.num_rows // 2
            g1 = gate.slice(0, mid) if gate is not None else None
            g2 = gate.slice(mid) if gate is not None else None
            halves = [self.apply(table.slice(0, mid), error_mode, gate=g1),
                      self.apply(table.slice(mid), error_mode, gate=g2)]
            try:
                return pa.concat_tables(halves, promote_options="permissive")
            except (pa.ArrowInvalid, pa.ArrowTypeError):
                return table


def parse_statement(src: str, context: str | None = None) -> Statement:
    p = Parser(src, context=context)
    t = p.expect("ident")
    p.expect("op", "(")
    pos_args, kwargs = p._call_args(t.val)
    args = _merge_named_args(t.val, pos_args, kwargs)
    where = None
    if p.at_kw("where"):
        p.next()
        where = p.parse_expr()
    if p.peek().kind != "eof":
        bad = p.peek()
        raise SyntaxError(f"trailing input at {bad.pos}: {bad.val!r}")
    return Statement(t.val, args, where, src)


def parse_condition(src: str, context: str | None = None) -> Callable[[pa.Table], pa.Array]:
    """Compile a boolean OTTL expression to mask(table) -> BooleanArray."""
    p = Parser(src, context=context)
    node = p.parse_expr()
    if p.peek().kind != "eof":
        bad = p.peek()
        raise SyntaxError(f"trailing input at {bad.pos}: {bad.val!r}")

    def mask(table: pa.Table):
        ctx = ExprContext(table)
        m = as_bool(node.eval(ctx), ctx.n)
        return m.combine_chunks() if isinstance(m, pa.ChunkedArray) else m

    mask.source = src  # type: ignore[attr-defined]
    return mask
