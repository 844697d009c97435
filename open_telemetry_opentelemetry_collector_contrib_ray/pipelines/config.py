"""Collector-style YAML config front-end.

The reference's user surface is a YAML file wiring receivers →
processors → exporters into named service pipelines (the collector
service config; component set assembled per
/root/reference/cmd/otelcontribcol/builder-config.yaml).  This module
accepts the same shape and compiles it onto the step registry:

    receivers:
      parquet/transcripts:            # type "parquet", name "transcripts"
        table: transcripts            # table under the data dir
        columns: [conv_id, turn_idx, role, text, tool, ts]
    processors:
      regex_parser/tool:
        pattern: '...'
        if: 'role == "tool"'
      filter/errors:
        drop: ['attributes["status"] == nil']
    exporters:
      parquet/out:
        path: /tmp/out                # written partitioned, zstd
        partition_cols: [route_id]
      collect: {}                     # return the Dataset instead of writing
    service:
      pipelines:
        logs:
          receivers: [parquet/transcripts]
          processors: [regex_parser/tool, filter/errors]
          exporters: [collect]

Component ids follow the collector convention `type` or `type/name`;
the type half of a processor id must be a registered step type
(`pipelines/builder.py STEP_REGISTRY`), and every remaining key of the
processor config is passed to that step factory.  Multiple receivers
union; multiple exporters each consume the same plan (Datasets are
lazy — each exporter triggers its own execution, like the reference's
fanoutconsumer).

This is config assembly only — semantics live in the step registry.
"""

from __future__ import annotations

import os
from typing import Any

from .builder import build_pipeline


def load_config(src: str) -> dict:
    """Parse a YAML string or file path into a config dict (safe_load)."""
    import yaml

    if "\n" not in src and os.path.exists(src):
        with open(src) as f:
            return yaml.safe_load(f)
    return yaml.safe_load(src)


def _ctype(component_id: str) -> str:
    """'regex_parser/tool' -> 'regex_parser' (collector id convention)."""
    return component_id.split("/", 1)[0]


def _lookup(section: dict, component_id: str, kind: str) -> dict:
    if component_id not in section:
        raise KeyError(f"{kind} {component_id!r} referenced by a pipeline "
                       f"but not declared; declared: {sorted(section)}")
    return section[component_id] or {}


def _read_receiver(cfg: dict, component_id: str, data_dir: str):
    import ray.data

    rtype = _ctype(component_id)
    if rtype == "parquet":
        table = cfg.get("table", "transcripts")
        cols = cfg.get("columns")
        if table == "transcripts":
            # transcripts are the synthesized corpus keyed by the sf dir
            from ..sources.transcripts import read_transcripts

            return read_transcripts(data_dir, columns=cols)
        return ray.data.read_parquet(
            os.path.join(data_dir, f"{table}.parquet"), columns=cols)
    if rtype == "generate":
        from ..sources.transcripts import synth_transcripts

        n = int(cfg.get("count", 1000))
        return ray.data.from_arrow(synth_transcripts(n))
    if rtype == "otlp_json":
        from ..sources.otlpjson import read_otlp_json

        return read_otlp_json(cfg["path"],
                              time_col=cfg.get("time_col", "ts"),
                              body_col=cfg.get("body_col", "text"))
    if rtype == "otlp_proto":
        from ..sources.otlpproto import read_otlp_proto

        return read_otlp_proto(cfg["path"],
                               time_col=cfg.get("time_col", "ts"),
                               body_col=cfg.get("body_col", "text"))
    if rtype == "otlp_traces_json":
        from ..sources.otlpjson import read_otlp_traces_json

        return read_otlp_traces_json(cfg["path"])
    if rtype == "otlp_metrics_json":
        from ..sources.otlpjson import read_otlp_metrics_json

        return read_otlp_metrics_json(
            cfg["path"], time_col=cfg.get("time_col", "time_unix_nano"))
    if rtype == "jsonl":
        # line-delimited JSON (the fluentd/filebeat interchange format)
        return ray.data.read_json(cfg["path"])
    if rtype == "csv":
        return ray.data.read_csv(cfg["path"])
    if rtype == "text":
        # raw log lines -> one `text` column (filelog tail analog; chain
        # regex/container/syslog parser steps behind it)
        ds = ray.data.read_text(cfg["path"])
        return ds.map_batches(
            lambda t: t.rename_columns(["text"]), batch_format="pyarrow")
    if rtype == "filelog":
        # full fileconsumer parity: include/exclude globs, encoding,
        # multiline line_start/line_end patterns, trim, gzip, file
        # attributes, header metadata sub-pipeline (sources/textlog.py
        # read_log_files)
        from ..sources.textlog import read_log_files

        kw = {k: v for k, v in cfg.items() if k not in ("type", "include")}
        return read_log_files(cfg["include"], **kw)
    raise KeyError(f"unknown receiver type {rtype!r} "
                   "(supported: parquet, generate, otlp_json, otlp_proto, "
                   "otlp_traces_json, otlp_metrics_json, jsonl, csv, "
                   "text, filelog)")


def run_config(config: dict | str, data_dir: str = "/root/testdata/sf0.001",
               pipeline: str | None = None) -> dict[str, Any]:
    """Execute the config's service pipelines.  Returns
    {pipeline_name: {exporter_id: Dataset | written path}}.

    `pipeline` restricts execution to one named pipeline.
    """
    if isinstance(config, str):
        config = load_config(config)
    receivers = config.get("receivers", {})
    processors = config.get("processors", {})
    exporters = config.get("exporters", {})
    pipelines = (config.get("service", {}) or {}).get("pipelines", {})
    if not pipelines:
        raise KeyError("config has no service.pipelines section")

    results: dict[str, Any] = {}
    for name, spec in pipelines.items():
        if pipeline is not None and name != pipeline:
            continue
        spec = spec or {}
        # receivers: union of all declared sources
        ds = None
        for rid in spec.get("receivers", []):
            part = _read_receiver(_lookup(receivers, rid, "receiver"), rid, data_dir)
            ds = part if ds is None else ds.union(part)
        if ds is None:
            raise KeyError(f"pipeline {name!r} declares no receivers")
        # processors: step dicts in declared order
        steps = []
        for pid in spec.get("processors", []):
            cfg = dict(_lookup(processors, pid, "processor"))
            cfg["type"] = _ctype(pid)
            steps.append(cfg)
        ds = build_pipeline(ds, steps)
        # exporters: each consumes the (lazy) plan
        out: dict[str, Any] = {}
        for eid in spec.get("exporters", ["collect"]):
            ecfg = _lookup(exporters, eid, "exporter") if exporters else {}
            etype = _ctype(eid)
            if etype == "collect":
                out[eid] = ds
            elif etype == "parquet":
                path = ecfg["path"]
                kw = {}
                if ecfg.get("partition_cols"):
                    kw["partition_cols"] = list(ecfg["partition_cols"])
                ds.write_parquet(path, compression=ecfg.get("compression", "zstd"),
                                 **kw)
                out[eid] = path
            elif etype == "otlp_json":
                from ..sources.otlpjson import write_otlp_json

                wkw = {k: v for k, v in ecfg.items() if k != "path"}
                write_otlp_json(ds, ecfg["path"], **wkw)
                out[eid] = ecfg["path"]
            elif etype == "otlp_proto":
                from ..sources.otlpproto import write_otlp_proto

                wkw = {k: v for k, v in ecfg.items() if k != "path"}
                write_otlp_proto(ds, ecfg["path"], **wkw)
                out[eid] = ecfg["path"]
            elif etype == "otlp_traces_json":
                from ..sources.otlpjson import write_otlp_traces_json

                wkw = {k: v for k, v in ecfg.items() if k != "path"}
                write_otlp_traces_json(ds, ecfg["path"], **wkw)
                out[eid] = ecfg["path"]
            elif etype == "otlp_metrics_json":
                from ..sources.otlpjson import write_otlp_metrics_json

                wkw = {k: v for k, v in ecfg.items() if k != "path"}
                write_otlp_metrics_json(ds, ecfg["path"], **wkw)
                out[eid] = ecfg["path"]
            elif etype == "jsonl":
                ds.write_json(ecfg["path"])
                out[eid] = ecfg["path"]
            elif etype == "csv":
                ds.write_csv(ecfg["path"])
                out[eid] = ecfg["path"]
            else:
                raise KeyError(f"unknown exporter type {etype!r} "
                               "(supported: parquet, otlp_json, otlp_proto, "
                               "otlp_traces_json, otlp_metrics_json, "
                               "jsonl, csv, collect)")
        results[name] = out
    return results
