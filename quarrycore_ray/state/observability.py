"""Prometheus-format observability export for the lineage metrics.

Reference parity: the reference exposes Prometheus counters/histograms
(`/root/reference/src/quarrycore/observability/metrics.py` —
`quarrycore_documents_processed_total`, `processing_duration_seconds`
histogram, per-stage labels) through `prometheus_client`. That library
isn't in this environment, and a batch dataflow engine doesn't hold a
long-lived process per se — so this module renders the SAME metric
shapes from the per-partition lineage rows (`state/metrics.py`) in the
public Prometheus text exposition format (version 0.0.4), via the two
standard batch-friendly transports:

- `export_prometheus_textfile`: atomic write of a `.prom` file — the
  node_exporter *textfile collector* convention for batch jobs.
- `start_metrics_http_server`: a stdlib one-thread pull endpoint
  serving `/metrics`, for a live scrape during a long run.

Metric names keep the reference's `quarrycore_` prefix and stage
labels; durations are exported as a proper cumulative histogram
(le-bucketed, `+Inf` == `_count`, `_sum` in seconds).
"""

from __future__ import annotations

import os
import threading

import pyarrow as pa

#: histogram buckets in seconds (prometheus_client defaults — the
#: reference's processing_duration_seconds uses the same default set)
DURATION_BUCKETS = (
    0.005, 0.01, 0.025, 0.05, 0.075, 0.1, 0.25, 0.5, 0.75,
    1.0, 2.5, 5.0, 7.5, 10.0,
)


def _fmt(v: float) -> str:
    return repr(float(v)) if v != int(v) else str(int(v))


def prometheus_text(metrics: pa.Table) -> str:
    """Render lineage rows as Prometheus text exposition format."""
    stages = sorted(set(metrics["stage"].to_pylist()))
    by_stage: dict[str, dict[str, float]] = {}
    walls: dict[str, list[float]] = {}
    for i in range(metrics.num_rows):
        s = metrics["stage"][i].as_py()
        agg = by_stage.setdefault(
            s,
            {"rows_in": 0, "rows_out": 0, "partitions": 0,
             "candidate_pairs": 0, "dropped_pairs_skew_cap": 0},
        )
        agg["rows_in"] += metrics["rows_in"][i].as_py()
        agg["rows_out"] += metrics["rows_out"][i].as_py()
        agg["partitions"] += 1
        agg["candidate_pairs"] += metrics["candidate_pairs"][i].as_py()
        agg["dropped_pairs_skew_cap"] += metrics[
            "dropped_pairs_skew_cap"
        ][i].as_py()
        walls.setdefault(s, []).append(metrics["wall_ms"][i].as_py() / 1000.0)

    out: list[str] = []

    def counter(name: str, help_: str, key: str) -> None:
        out.append(f"# HELP {name} {help_}")
        out.append(f"# TYPE {name} counter")
        for s in stages:
            out.append(
                f'{name}{{stage="{s}"}} {_fmt(by_stage[s][key])}'
            )

    counter(
        "quarrycore_rows_in_total",
        "Rows entering each pipeline stage.",
        "rows_in",
    )
    counter(
        "quarrycore_rows_out_total",
        "Rows leaving each pipeline stage.",
        "rows_out",
    )
    counter(
        "quarrycore_partitions_total",
        "Partition tasks executed per stage.",
        "partitions",
    )
    counter(
        "quarrycore_candidate_pairs_total",
        "LSH candidate pairs emitted per stage.",
        "candidate_pairs",
    )
    counter(
        "quarrycore_dropped_pairs_skew_cap_total",
        "Candidate pairs dropped by the hot-bucket skew cap.",
        "dropped_pairs_skew_cap",
    )

    name = "quarrycore_processing_duration_seconds"
    out.append(
        f"# HELP {name} Per-partition stage wall time "
        "(reference observability/metrics.py parity)."
    )
    out.append(f"# TYPE {name} histogram")
    for s in stages:
        vals = walls[s]
        cum = 0
        for b in DURATION_BUCKETS:
            cum = sum(1 for v in vals if v <= b)
            out.append(f'{name}_bucket{{stage="{s}",le="{_fmt(b)}"}} {cum}')
        out.append(f'{name}_bucket{{stage="{s}",le="+Inf"}} {len(vals)}')
        out.append(f'{name}_sum{{stage="{s}"}} {repr(float(sum(vals)))}')
        out.append(f'{name}_count{{stage="{s}"}} {len(vals)}')
    return "\n".join(out) + "\n"


def export_prometheus_textfile(
    path: str, metrics: pa.Table | None = None
) -> str:
    """Write the rendered metrics atomically (tmp + rename — the
    textfile-collector contract: scrapers must never see a torn file).
    Drains the live metrics actor when no table is given. Returns the
    rendered text."""
    if metrics is None:
        from .metrics import drain_metrics

        metrics = drain_metrics()
    text = prometheus_text(metrics)
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(text)
    os.rename(tmp, path)
    return text


class _MetricsServer:
    def __init__(self, httpd, thread):
        self._httpd = httpd
        self._thread = thread
        self.port: int = httpd.server_address[1]

    def stop(self) -> None:
        self._httpd.shutdown()
        self._thread.join(timeout=5)
        self._httpd.server_close()


def start_metrics_http_server(
    port: int = 0, host: str = "127.0.0.1"
) -> _MetricsServer:
    """Serve `/metrics` from the live metrics actor on a stdlib HTTP
    thread (pull model, one scrape = one drain-free render: the actor
    buffer is COPIED, not drained, so a scrape never loses rows for the
    end-of-job parquet export). `port=0` picks a free port; read it
    from the returned handle."""
    from http.server import BaseHTTPRequestHandler, HTTPServer

    import ray

    from .metrics import get_metrics_actor, metrics_table

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 - stdlib API
            if self.path.rstrip("/") not in ("", "/metrics"):
                self.send_response(404)
                self.end_headers()
                return
            actor = get_metrics_actor()
            rows = ray.get(actor.peek.remote())
            body = prometheus_text(metrics_table(rows)).encode()
            self.send_response(200)
            self.send_header(
                "Content-Type", "text/plain; version=0.0.4; charset=utf-8"
            )
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):  # silence request logging
            pass

    httpd = HTTPServer((host, port), Handler)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    return _MetricsServer(httpd, thread)
