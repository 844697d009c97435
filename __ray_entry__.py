"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module:
nothing here (or in the library) initialises or shuts down Ray.

- ``entry()``: flagship parse->enrich->route->aggregate pipeline on
  /root/testdata/sf0.001 transcripts; returns per-sink grouped counts.
- ``queries()``: one callable per implemented operator/pipeline from
  SURVEY.md §2 (see pipelines/queries.py for the catalog).
- ``oracle_sql()``: DuckDB-equivalent SQL per query.  Transcript
  queries read the deterministic synthesized corpus from
  /tmp/graft_transcripts/<sf>/ — ``queries()`` pre-generates the
  sf0.01 corpus so the oracle's read_parquet path always exists.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    from open_telemetry_opentelemetry_collector_contrib_ray.pipelines import (
        flagship_sink_counts,
    )

    return flagship_sink_counts("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from open_telemetry_opentelemetry_collector_contrib_ray.pipelines import queries as q
    from open_telemetry_opentelemetry_collector_contrib_ray.sources import (
        ensure_transcripts,
    )

    from open_telemetry_opentelemetry_collector_contrib_ray.sources.textlog import (
        synth_container_log_file,
        synth_journald_export,
        synth_wineventlog,
        synth_log_file,
    )

    # the oracle SQL reads these paths; make sure they exist before any compare
    ensure_transcripts("/root/testdata/sf0.01")
    synth_log_file()
    synth_container_log_file()
    synth_journald_export()
    synth_wineventlog()
    q._evolve_fixture("/root/testdata/sf0.01")
    return q.queries()


def oracle_sql() -> dict[str, str]:
    from open_telemetry_opentelemetry_collector_contrib_ray.pipelines import queries as q

    return q.oracle_sql()
