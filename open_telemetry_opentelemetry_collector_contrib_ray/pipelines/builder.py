"""Declarative pipeline builder: a config list of steps -> a Dataset plan.

Analog of the collector's YAML pipeline config + stanza operator lists
(/root/reference/cmd/otelcontribcol/builder-config.yaml; stanza
operators register by type in a global registry,
pkg/stanza/operator/registry.go + config.go init() pattern).

A pipeline is a list of step dicts: {"type": <registered step>, ...params}.
`STEP_REGISTRY` is the user extension surface — register_step() adds
custom step types, exactly like operator.Register in stanza.

Example:

    steps = [
        {"type": "regex_parser", "pattern": "...", "if": 'role == "tool"'},
        {"type": "severity_parser", "parse_from": "attr_level"},
        {"type": "lookup_enrich", "lookup": {...}, "key_col": "tool"},
        {"type": "transform", "statements": ['set(attributes["x"], 1)']},
        {"type": "filter", "drop": ['attributes["x"] == nil']},
        {"type": "router", "routes": [["errors", '...cond...']], "default": "default"},
    ]
    ds = build_pipeline(read_transcripts(sf), steps)
"""

from __future__ import annotations

from typing import Any, Callable

from ..stages.enrich import AttributesStage, LookupEnricher, ResourceStamper
from ..stages.parse import (
    CsvParser,
    GrokParser,
    JsonArrayParser,
    JsonParser,
    KeyValueParser,
    RegexParser,
    ScopeParser,
    SeverityParser,
    UriParser,
    TimeParser,
    TraceParser,
)
from ..stages.route import Route, RouteIdStage
from ..stages.sample import HashBucketStage, ProbabilisticSampler
from ..stages.transform import FilterStage, KeepStage, TransformStage

STEP_REGISTRY: dict[str, Callable[[dict], Any]] = {}


def register_step(name: str):
    """User extension surface: add a step type (stanza operator.Register)."""

    def deco(factory: Callable[[dict], Any]):
        STEP_REGISTRY[name] = factory
        return factory

    return deco


def _opts(cfg: dict) -> dict:
    """map_batches kwargs carried on any step config."""
    out: dict = {}
    if "batch_size" in cfg:
        out["batch_size"] = cfg["batch_size"]
    if "concurrency" in cfg:
        c = cfg["concurrency"]
        out["concurrency"] = tuple(c) if isinstance(c, list) else c
    if "num_cpus" in cfg:
        out["num_cpus"] = cfg["num_cpus"]
    return out


register_step("regex_parser")(lambda c: RegexParser(
    c["pattern"], parse_from=c.get("parse_from", "text"),
    on_error=c.get("on_error", "send"), if_condition=c.get("if")))
register_step("grok_parser")(lambda c: GrokParser(
    c["pattern"], definitions=c.get("definitions"),
    named_captures_only=c.get("named_captures_only", True),
    parse_from=c.get("parse_from", "text"), on_error=c.get("on_error", "send"),
    if_condition=c.get("if")))
register_step("json_parser")(lambda c: JsonParser(
    parse_from=c.get("parse_from", "text"), on_error=c.get("on_error", "send"),
    keys=c.get("keys")))
register_step("keyvalue_parser")(lambda c: KeyValueParser(
    c["keys"], parse_from=c.get("parse_from", "text"),
    kv_sep=c.get("kv_sep", "="), pair_sep=c.get("pair_sep", " ")))
register_step("csv_parser")(lambda c: CsvParser(
    c["header"], parse_from=c.get("parse_from", "text"),
    delimiter=c.get("delimiter", ",")))
register_step("time_parser")(lambda c: TimeParser(
    c["parse_from"], layout_type=c.get("layout_type", "strptime"),
    layout=c.get("layout", "%Y-%m-%dT%H:%M:%SZ"), out=c.get("out", "time")))
register_step("jsonarray_parser")(lambda c: JsonArrayParser(
    parse_from=c.get("parse_from", "text"), header=c.get("header"),
    prefix=c.get("prefix", "attr_"), on_error=c.get("on_error", "send")))
register_step("trace_parser")(lambda c: TraceParser(
    trace_id_from=c.get("trace_id_from", "attr_trace_id"),
    span_id_from=c.get("span_id_from", "attr_span_id"),
    flags_from=c.get("flags_from", "attr_trace_flags")))
register_step("scope_parser")(lambda c: ScopeParser(c["parse_from"]))
register_step("uri_parser")(lambda c: UriParser(
    parse_from=c.get("parse_from", "text"), prefix=c.get("prefix", "attr_"),
    on_error=c.get("on_error", "send")))
register_step("severity_parser")(lambda c: SeverityParser(
    parse_from=c.get("parse_from", "attr_level")))
register_step("transform")(lambda c: TransformStage(
    c["statements"], error_mode=c.get("error_mode", "propagate"),
    context=c.get("context"), conditions=c.get("conditions")))
register_step("attributes")(lambda c: AttributesStage(
    c["actions"], include=c.get("include"), exclude=c.get("exclude")))
register_step("lookup_enrich")(lambda c: LookupEnricher(
    c["lookup"], key_col=c.get("key_col", "tool"), defaults=c.get("defaults")))
register_step("resource_stamp")(lambda c: ResourceStamper(c["resource"]))
register_step("filter")(lambda c: FilterStage(c["drop"]))
register_step("keep")(lambda c: KeepStage(c["condition"]))
register_step("sampler")(lambda c: ProbabilisticSampler(
    c["percentage"], attribute_source=c.get("attribute_source", "conv_id"),
    invert=c.get("invert", False)))
register_step("hash_bucket")(lambda c: HashBucketStage(
    source=c.get("source", "conv_id"), num_buckets=c.get("num_buckets", 64)))
register_step("router")(lambda c: RouteIdStage(
    [Route(*r) if isinstance(r, (list, tuple)) else Route(r["name"], r["condition"])
     for r in c["routes"]],
    default=c.get("default", "default"),
    error_mode=c.get("error_mode", "ignore")))


from ..stages.enrich import RedactionStage  # noqa: E402

register_step("redaction")(lambda c: RedactionStage(
    allowed_keys=c.get("allowed_keys"),
    blocked_value_patterns=c.get("blocked_values"),
    mask=c.get("mask", "****"), summary=c.get("summary", True)))


# stanza transformer operators (pkg/stanza/operator/transformer/{add,copy,
# move,remove,retain}) — thin sugar over OTTL-lite statements
def _stanza_transformer(c: dict):
    kind = c["type"]
    if kind == "add":
        stmts = [f'set({c["field"]}, {_lit(c["value"])})']
    elif kind == "copy":
        stmts = [f'set({c["to"]}, {c["from"]})']
    elif kind == "move":
        stmts = [f'set({c["to"]}, {c["from"]})']
        src = c["from"]
        if src.startswith("attributes["):
            key = src[len('attributes["'):-2]
            stmts.append(f'delete_key(attributes, "{key}")')
    elif kind == "remove":
        field = c["field"]
        if field.startswith("attributes["):
            key = field[len('attributes["'):-2]
            stmts = [f'delete_key(attributes, "{key}")']
        else:
            raise ValueError("remove supports attributes[...] fields")
    elif kind == "retain":
        keys = ", ".join(f'"{k}"' for k in c["fields"])
        stmts = [f"keep_keys(attributes, [{keys}])"]
    else:  # pragma: no cover
        raise ValueError(kind)
    return TransformStage(stmts, error_mode=c.get("error_mode", "propagate"))


def _lit(v) -> str:
    if isinstance(v, str):
        return '"' + v.replace('"', '\\"') + '"'
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


for _name in ("add", "copy", "move", "remove", "retain"):
    STEP_REGISTRY[_name] = _stanza_transformer


def _field_col(field: str) -> str:
    """stanza field path -> promoted column name."""
    if field.startswith('attributes["'):
        return "attr_" + field[len('attributes["'):-2]
    if field.startswith('resource["'):
        return "res_" + field[len('resource["'):-2]
    if field in ("body", "text"):
        return "text"
    return field


@register_step("assign_keys")
def _assign_keys(c: dict):
    """stanza assign_keys transformer
    (pkg/stanza/operator/transformer/assignkeys/transformer.go:30-58):
    a list-valued field + keys -> one attr column per key, positionally.
    Short lists null-pad (the reference errors; on_error=send analog)."""
    import pyarrow.compute as pc

    col = _field_col(c["field"])
    keys = list(c["keys"])
    prefix = c.get("prefix", "attr_")

    def stage(t):
        src = t.column(col)
        out = t
        for i, k in enumerate(keys):
            vals = pc.list_element(
                pc.list_slice(src, i, i + 1, return_fixed_size_list=True), 0)
            out = out.append_column(prefix + k, vals)
        return out

    return stage


@register_step("unquote")
def _unquote(c: dict):
    """stanza unquote transformer
    (pkg/stanza/operator/transformer/unquote/transformer.go:30-43,
    strconv.Unquote semantics): double-quoted strings unescape,
    backquoted strings strip raw, single-quoted single runes unwrap;
    anything else is left unchanged (on_error=send analog)."""
    import json as _json

    import pyarrow as pa

    col = _field_col(c["field"])

    def unquote_one(s):
        if s is None or len(s) < 2:
            return s
        if s[0] == s[-1] == '"':
            try:
                v = _json.loads(s)
                return v if isinstance(v, str) else s
            except ValueError:
                return s
        if s[0] == s[-1] == "`" and "`" not in s[1:-1]:
            return s[1:-1]
        if s[0] == s[-1] == "'" and len(s[1:-1]) == 1:
            return s[1:-1]
        return s

    def stage(t):
        vals = pa.array([unquote_one(s) for s in t.column(col).to_pylist()],
                        type=pa.string())
        return t.set_column(t.column_names.index(col), col, vals)

    return stage


@register_step("noop")
def _noop(c: dict):
    """stanza noop transformer — identity passthrough."""
    return lambda t: t


class DatasetStep:
    """Marker for steps that transform the whole Dataset plan (shuffle
    ops like recombine) rather than mapping per batch: the factory
    returns DatasetStep(fn) and build_pipeline calls fn(ds)."""

    def __init__(self, fn):
        self.fn = fn


def build_pipeline(ds, steps: list[dict]):
    """Apply a config list of steps to a Dataset.  Per-batch steps run as
    map_batches over zero-copy Arrow (per-step batch_size/concurrency/
    num_cpus pass straight through to the scheduler); DatasetStep
    factories (recombine and other shuffle ops) rewrite the plan."""
    for cfg in steps:
        kind = cfg["type"]
        if kind not in STEP_REGISTRY:
            raise KeyError(f"unknown pipeline step type {kind!r}; "
                           f"registered: {sorted(STEP_REGISTRY)}")
        stage = STEP_REGISTRY[kind](cfg)
        if isinstance(stage, DatasetStep):
            ds = stage.fn(ds)
        else:
            ds = ds.map_batches(stage, batch_format="pyarrow", **_opts(cfg))
    return ds


# ----- late registrations: parser/transformer tail that needs the classes
# and Dataset-level machinery above

from ..stages.parse import ContainerParser, SyslogParser  # noqa: E402

register_step("container_parser")(lambda c: ContainerParser(
    parse_from=c.get("parse_from", "text"),
    on_error=c.get("on_error", "send")))
def _syslog_step(c: dict):
    """stanza syslog_parser: protocol rfc3164 (default) or rfc5424 with
    the RFC6587 framing knobs (syslog/config.go)."""
    if c.get("protocol", "rfc3164") == "rfc5424":
        from ..stages.parse import Rfc5424SyslogParser

        return Rfc5424SyslogParser(
            parse_from=c.get("parse_from", "text"),
            on_error=c.get("on_error", "send"),
            enable_octet_counting=c.get("enable_octet_counting", False),
            max_octets=c.get("max_octets", 0),
            non_transparent_framing_trailer=c.get(
                "non_transparent_framing_trailer"),
            allow_skip_pri_header=c.get("allow_skip_pri_header", False))
    return SyslogParser(parse_from=c.get("parse_from", "text"))


register_step("syslog_parser")(_syslog_step)


@register_step("flatten")
def _flatten_step(c: dict):
    """stanza flatten transformer (pkg/stanza/operator/transformer/
    flatten): lift a nested map field's children up one level and drop
    the field.  In promoted-column land the nested map is a struct
    column or a JSON-string column."""
    import json as _json

    import pyarrow as pa

    col = _field_col(c["field"])
    prefix = c.get("prefix", "attr_")

    def stage(t: pa.Table) -> pa.Table:
        src = t.column(col)
        if pa.types.is_struct(src.type):
            sub = src.combine_chunks() if isinstance(src, pa.ChunkedArray) else src
            for f in src.type:
                t = t.append_column(prefix + f.name, sub.field(f.name))
            return t.drop_columns([col])
        # JSON-string column: parse once per batch, expand scalar keys
        rows = [(_json.loads(s) if s else {}) for s in src.to_pylist()]
        keys: dict[str, None] = {}
        for r in rows:
            if isinstance(r, dict):
                for k in r:
                    keys.setdefault(k)
        for k in keys:
            vals = [r.get(k) if isinstance(r, dict) else None for r in rows]
            if any(isinstance(v, (dict, list)) for v in vals):
                vals = [None if v is None else _json.dumps(v, sort_keys=True)
                        for v in vals]
            t = t.append_column(prefix + k, pa.array(vals))
        return t.drop_columns([col])

    return stage


@register_step("recombine")
def _recombine_step(c: dict):
    """stanza recombine (ordered multiline stitch) as a declarative step —
    a Dataset-level shuffle op, so it registers as a DatasetStep."""
    from ..stages.aggregate import recombine

    return DatasetStep(lambda ds: recombine(
        ds,
        group_col=c.get("group_col", "conv_id"),
        order_col=c.get("order_col", "turn_idx"),
        text_col=c.get("combine_field", "text"),
        sep=c.get("combine_with", "\n"),
        n_buckets=c.get("n_buckets", 64),
        max_batch_size=c.get("max_batch_size")))


@register_step("recombine_multiline")
def _recombine_multiline_step(c: dict):
    """stanza recombine boundary mode (is_first_entry / is_last_entry
    within a source_identifier) — recombine/config.go:38-61."""
    from ..stages.aggregate import recombine_multiline

    return DatasetStep(lambda ds: recombine_multiline(
        ds,
        source_col=c.get("source_identifier", "source"),
        order_col=c.get("order_col", "seq"),
        text_col=c.get("combine_field", "text"),
        is_first_entry=c.get("is_first_entry"),
        is_last_entry=c.get("is_last_entry"),
        sep=c.get("combine_with", "\n"),
        max_batch_size=c.get("max_batch_size"),
        n_buckets=c.get("n_buckets", 64)))


@register_step("metric_transform")
def _metric_transform_step(c: dict):
    """transformprocessor ContextStatements (internal/common/config.go:
    34-38): OTTL statements compiled in the metric / datapoint context."""
    return TransformStage(c["statements"],
                          error_mode=c.get("error_mode", "propagate"),
                          context=c.get("context", "datapoint"),
                          conditions=c.get("conditions"))


@register_step("extract_count_metric")
def _extract_count_metric_step(c: dict):
    from ..stages.metrics import extract_count_metric

    return DatasetStep(lambda ds: extract_count_metric(
        ds, monotonic=c.get("monotonic", False)))


@register_step("extract_sum_metric")
def _extract_sum_metric_step(c: dict):
    from ..stages.metrics import extract_sum_metric

    return DatasetStep(lambda ds: extract_sum_metric(
        ds, monotonic=c.get("monotonic", False)))


@register_step("copy_metric")
def _copy_metric_step(c: dict):
    from ..stages.metrics import copy_metric

    return DatasetStep(lambda ds: copy_metric(
        ds, c["name"], c["new_name"], unit=c.get("unit"),
        description=c.get("description")))


@register_step("aggregate_on_attributes")
def _aggregate_on_attributes_step(c: dict):
    from ..stages.metrics import aggregate_on_attributes

    return DatasetStep(lambda ds: aggregate_on_attributes(
        ds, fn=c.get("aggregation_function", "sum"),
        attributes=c.get("attributes"),
        value_col=c.get("value_col", "value_double")))


@register_step("dedup")
def _dedup_step(c: dict):
    """logdedup as a declarative step (Dataset-level shuffle op)."""
    from ..stages.aggregate import dedup_exact

    return DatasetStep(lambda ds: dedup_exact(
        ds, c["key_cols"], ts_col=c.get("ts_col", "ts"),
        order_col=c.get("order_col", "turn_idx")))


@register_step("tail_sample")
def _tail_sample_step(c: dict):
    """tailsampling policy set as a declarative step."""
    from ..stages.tailsampling import tail_sample

    return DatasetStep(lambda ds: tail_sample(
        ds, c["policies"], group_col=c.get("group_col", "conv_id"),
        ts_col=c.get("ts_col", "ts")))


@register_step("sliding_window")
def _sliding_window_step(c: dict):
    """sliding-window aggregate as a declarative step."""
    from ..stages.aggregate import sliding_window_agg

    return DatasetStep(lambda ds: sliding_window_agg(
        ds, c.get("ts_col", "ts"),
        [tuple(s) for s in c["specs"]],
        window_us=c["window_us"], slide_us=c["slide_us"],
        keys=c.get("keys", [])))


@register_step("window")
def _window_step(c: dict):
    """SQL window functions as a declarative step (Dataset-level
    shuffle op): specs are dicts mirroring stages/window.py WindowSpec,
    e.g. {"kind": "lag", "col": "value", "out": "prev"}."""
    from ..stages.window import WindowSpec, grouped_window

    specs = [WindowSpec(**s) for s in c["specs"]]
    return DatasetStep(lambda ds: grouped_window(
        ds, c["keys"], c["order_by"], specs,
        n_buckets=c.get("n_buckets", 64)))


@register_step("skew_join")
def _skew_join_step(c: dict):
    """Skew-aware salted join as a declarative step; `right` is a
    Dataset supplied by the caller config (programmatic configs) or a
    parquet path."""
    from ..stages.join import skew_join

    def run(ds):
        right = c["right"]
        if isinstance(right, str):
            import ray.data

            right = ray.data.read_parquet(right)
        return skew_join(ds, right, on=c["on"], how=c.get("how", "inner"),
                         n_salt=c.get("n_salt", 8),
                         hot_keys=c.get("hot_keys"),
                         n_buckets=c.get("n_buckets", 32))

    return DatasetStep(run)


@register_step("bpe_count")
def _bpe_count_step(c: dict):
    """BPE token counting as a declarative step: merges learned ahead of
    time (config key `merges`, a list of [a, b] pairs from bpe_train) are
    broadcast once; the step is a map-only actor pool."""
    from ..stages.bpe import BpeEncoder

    merges = [tuple(p) for p in c["merges"]]
    return DatasetStep(lambda ds: ds.map_batches(
        BpeEncoder, fn_constructor_kwargs=dict(
            merges_ref=merges, text_col=c.get("text_col", "text"),
            out_col=c.get("out_col", "n_bpe_tokens")),
        batch_format="pyarrow",
        concurrency=tuple(c.get("concurrency", (1, 8)))))

@register_step("shuffle")
def _shuffle_step(c: dict):
    """Deterministic training-data shuffle as a declarative step
    (Dataset-level range-sort op); see stages/sample.py
    deterministic_shuffle."""
    from ..stages.sample import deterministic_shuffle

    return DatasetStep(lambda ds: deterministic_shuffle(
        ds, key_col=c.get("key_col", "doc_id"), seed=c.get("seed", 0),
        out_col=c.get("out_col", "shuffle_key")))


@register_step("budget_sample")
def _budget_sample_step(c: dict):
    """Token-budget-capped mixture sampling as a declarative step."""
    from ..stages.sample import budget_sample

    return DatasetStep(lambda ds: budget_sample(
        ds, budgets=dict(c["budgets"]), token_col=c["token_col"],
        source_col=c.get("source_col", "source"),
        key_col=c.get("key_col", "doc_id"), seed=c.get("seed", 0),
        default_budget=c.get("default_budget"),
        n_buckets=c.get("n_buckets", 64)))


@register_step("classifier")
def _classifier_step(c: dict):
    """Hashed linear classifier scoring as a declarative step (map-only
    actor pool; weights from config or the deterministic table)."""
    import numpy as np

    from ..stages.classifier import classify_docs, deterministic_weights

    w = (np.asarray(c["weights"], dtype=np.int64) if "weights" in c
         else deterministic_weights(c.get("n_buckets", 1024)))
    return DatasetStep(lambda ds: classify_docs(
        ds, weights=w, text_col=c.get("text_col", "text"),
        bias=c.get("bias", 0), threshold=c.get("threshold", 0)))


@register_step("dedup_against")
def _dedup_against_step(c: dict):
    """Incremental-corpus dedup as a declarative step; `ref` is a
    Dataset (programmatic configs) or a parquet path."""
    from ..stages.dedup import dedup_against

    def run(ds):
        ref = c["ref"]
        if isinstance(ref, str):
            import ray.data

            ref = ray.data.read_parquet(ref)
        return dedup_against(ds, ref, text_col=c.get("text_col", "text"),
                             n_buckets=c.get("n_buckets", 32))

    return DatasetStep(run)

@register_step("fuzzy_dedup_against")
def _fuzzy_dedup_against_step(c: dict):
    """Cross-corpus MinHash near-dup removal; `ref` is a Dataset
    (programmatic configs) or a parquet path."""
    from ..stages.dedup import minhash_dedup_against

    def run(ds):
        ref = c["ref"]
        if isinstance(ref, str):
            import ray.data

            ref = ray.data.read_parquet(ref)
        return minhash_dedup_against(
            ds, ref, id_col=c.get("id_col", "doc_id"),
            text_col=c.get("text_col", "text"),
            num_perm=c.get("num_perm", 128), bands=c.get("bands", 32),
            shingle_w=c.get("shingle_w", 3),
            threshold=c.get("threshold", 0.7),
            n_buckets=c.get("n_buckets", 32))

    return DatasetStep(run)


@register_step("fuzzy_match")
def _fuzzy_match_step(c: dict):
    """Blocked fuzzy matching: prefix blocking + exact Levenshtein
    verify -> (id_a, id_b, dist) pairs."""
    from ..stages.linkage import blocked_levenshtein_pairs

    def run(ds):
        return blocked_levenshtein_pairs(
            ds, id_col=c.get("id_col", "doc_id"),
            text_col=c.get("text_col", "text"),
            block_chars=c.get("block_chars", 16),
            cmp_chars=c.get("cmp_chars", 200),
            max_dist=c.get("max_dist", 20),
            n_buckets=c.get("n_buckets", 32),
            max_block=c.get("max_block", 256))

    return DatasetStep(run)


@register_step("linear_stats")
def _linear_stats_step(c: dict):
    """Per-group Pearson corr + OLS slope from exact int64 sufficient
    statistics (x/y must already be integer columns)."""
    from ..stages.aggregate import grouped_linear_stats

    def run(ds):
        import ray.data

        tbl = grouped_linear_stats(ds, c["keys"], c["x"], c["y"])
        return ray.data.from_arrow(tbl)

    return DatasetStep(run)


@register_step("gopher_filter")
def _gopher_filter_step(c: dict):
    """Gopher/MassiveText document-quality gates (flag or drop)."""
    from ..stages.textfilters import GopherQualityFilter

    return GopherQualityFilter(
        text_col=c.get("text_col", "text"),
        min_words=c.get("min_words", 50),
        max_words=c.get("max_words", 100_000),
        min_mean_word_len=c.get("min_mean_word_len", 3),
        max_mean_word_len=c.get("max_mean_word_len", 10),
        min_stop_hits=c.get("min_stop_hits", 2),
        mode=c.get("mode", "flag"))


@register_step("html_extract")
def _html_extract_step(c: dict):
    """HTML -> readable text extraction (web-crawl preprocessing)."""
    from ..stages.textfilters import HtmlExtractor

    return HtmlExtractor(html_col=c.get("html_col", "text"),
                         out_col=c.get("out_col"),
                         separator=c.get("separator", " "),
                         collapse_ws=c.get("collapse_ws", True),
                         count_links=c.get("count_links", False),
                         numeric_entities=c.get("numeric_entities", False))


@register_step("normalize_text")
def _normalize_text_step(c: dict):
    """Unicode NFC + lowercase + whitespace-collapse normalization."""
    from ..stages.textfilters import TextNormalizer

    return TextNormalizer(text_col=c.get("text_col", "text"),
                          out_col=c.get("out_col"),
                          lowercase=c.get("lowercase", True),
                          collapse_ws=c.get("collapse_ws", True))


@register_step("chunk")
def _chunk_step(c: dict):
    """RAG-style overlapping character chunking (flat expansion)."""
    from ..stages.textfilters import chunk_documents

    return DatasetStep(lambda ds: chunk_documents(
        ds, chunk_size=c["chunk_size"], overlap=c.get("overlap", 0),
        id_col=c.get("id_col", "doc_id"),
        text_col=c.get("text_col", "text"),
        keep_cols=c.get("keep_cols", ())))


@register_step("funnel")
def _funnel_step(c: dict):
    """Sequential conversion funnel per key."""
    from ..stages.aggregate import funnel

    return DatasetStep(lambda ds: funnel(
        ds, stages=[tuple(s) for s in c["stages"]],
        key_col=c.get("key_col", "user_id"),
        type_col=c.get("type_col", "event_type"),
        ts_col=c.get("ts_col", "ts"),
        n_buckets=c.get("n_buckets", 64)))


@register_step("retention")
def _retention_step(c: dict):
    """Cohort retention table per key."""
    from ..stages.aggregate import retention_cohorts

    return DatasetStep(lambda ds: retention_cohorts(
        ds, key_col=c.get("key_col", "user_id"),
        ts_col=c.get("ts_col", "ts"),
        period_us=c.get("period_us", 604_800_000_000),
        n_buckets=c.get("n_buckets", 64)))
