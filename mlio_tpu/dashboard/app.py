"""Dashboard web server: REST API + static UI (stdlib http.server).

Rebuild of /root/reference/dashboard/app.py:37-349 (Flask+Dash). Flask/Dash
aren't in this environment, so the server is a stdlib ThreadingHTTPServer
with the same REST surface:

    GET  /api/models                 — registered result sets
    GET  /api/results                — all results
    GET  /api/profile/<id>          — one result set
    GET  /api/compare?ids=a,b        — comparison summary
    GET  /api/recommendations/<id>  — rule-based recommendations
    POST /api/upload                 — register a result JSON
    GET  /                           — static single-page UI

Results are persisted as JSON files in ``results_dir`` (parity: the result
registry app.py:60-125).
"""
from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Any, Dict, List, Optional
from urllib.parse import parse_qs, urlparse

STATIC_DIR = Path(__file__).parent / "static"


class Dashboard:
    """(parity: Dashboard dashboard/app.py:37-316)."""

    def __init__(self, results_dir: str = "benchmark_results",
                 host: str = "127.0.0.1", port: int = 8050):
        self.results_dir = Path(results_dir)
        self.results_dir.mkdir(parents=True, exist_ok=True)
        self.host = host
        self.port = port
        self._registry: Dict[str, Dict[str, Any]] = {}
        self._server: Optional[ThreadingHTTPServer] = None
        self.reload_results()

    # -- registry ------------------------------------------------------------

    def reload_results(self) -> None:
        """(parity: result reload app.py:318-349)."""
        self._registry = {}
        for f in sorted(self.results_dir.glob("*.json")):
            try:
                self._registry[f.stem] = json.loads(f.read_text())
            except Exception:
                continue

    def register_result(self, name: str, payload: Dict[str, Any]) -> None:
        self._registry[name] = payload
        (self.results_dir / f"{name}.json").write_text(
            json.dumps(payload, indent=2, default=float))

    def list_models(self) -> List[str]:
        return sorted(self._registry)

    def get_result(self, name: str) -> Optional[Dict[str, Any]]:
        return self._registry.get(name)

    def compare(self, names: List[str]) -> Dict[str, Any]:
        """Comparison summary math (parity: app.py:200-280)."""
        summary = {}
        for name in names:
            res = self._registry.get(name)
            if not res:
                continue
            entries = res.get("results", [])
            means = [e.get("mean_ms") for e in entries if e.get("mean_ms")]
            tps = [e.get("tokens_per_sec") for e in entries
                   if e.get("tokens_per_sec")]
            summary[name] = {
                "num_entries": len(entries),
                "best_mean_ms": min(means) if means else None,
                "best_tokens_per_sec": max(tps) if tps else None,
            }
        base = next(iter(summary.values()), None)
        if base and base["best_mean_ms"]:
            for name, s in summary.items():
                if s["best_mean_ms"]:
                    s["speedup_vs_first"] = base["best_mean_ms"] / s["best_mean_ms"]
        return summary

    def charts(self, name: str) -> List[Dict[str, Any]]:
        """Build every applicable chart spec for one result set (rendered
        client-side by static/dashboard.js — parity with the reference's
        interactive single-page app, dashboard.js:1-1995)."""
        from mlio_tpu.dashboard import visualizations as viz
        from mlio_tpu.profiling.bottleneck import BottleneckAnalyzer

        res = self._registry.get(name) or {}
        entries = res.get("results", [])
        charts: List[Dict[str, Any]] = []

        times = [e["mean_ms"] for e in entries if e.get("mean_ms")]
        if times:
            charts.append(viz.create_timeline_visualization(
                times, title="Latency across runs"))

        byv: Dict[str, List[Dict]] = {}
        for e in entries:
            byv.setdefault(e.get("variant", e.get("runner", "run")),
                           []).append(e)

        tps = {v: max(e.get("tokens_per_sec", 0.0) for e in es)
               for v, es in byv.items()
               if any(e.get("tokens_per_sec") for e in es)}
        if tps:
            charts.append(viz.create_op_breakdown(
                tps, title="Peak throughput by variant (tok/s)"))

        if len(byv) > 1 and times:
            named = {v: [e["mean_ms"] for e in es if e.get("mean_ms")]
                     for v, es in byv.items()}
            named = {v: ts for v, ts in named.items() if ts}
            if named:
                charts.append(viz.create_comparative_timeline(
                    {v: [t / 1e3 for t in ts] for v, ts in named.items()}))

        sp = {f"{e.get('variant', '?')} b{e.get('batch', '?')}"
              f"s{e.get('seq_len', '?')}": e["speedup"]
              for e in entries if e.get("speedup")}
        if sp:
            charts.append(viz.create_speedup_comparison(sp))

        mem = {v: max(e.get("peak_bytes", e.get("memory_bytes", 0.0))
                      for e in es) for v, es in byv.items()
               if any(e.get("peak_bytes") or e.get("memory_bytes")
                      for e in es)}
        if mem:
            charts.append(viz.create_memory_comparison(mem))

        eff = {v: max(e.get("roofline_fraction", 0.0) for e in es)
               for v, es in byv.items()
               if any(e.get("roofline_fraction") for e in es)}
        if eff:
            charts.append(viz.create_kernel_efficiency_chart(eff))

        devs = sorted({(e.get("devices"), e.get("tokens_per_sec"))
                       for e in entries
                       if e.get("devices") and e.get("tokens_per_sec")})
        if len(devs) > 1:
            charts.append(viz.create_parallel_scaling_chart(
                [d for d, _ in devs], [t for _, t in devs]))

        # parameter sensitivity: throughput vs batch (and vs seq) when the
        # result sweeps them
        for param in ("batch", "seq_len"):
            pts = sorted({(e.get(param), e.get("tokens_per_sec"))
                          for e in entries
                          if e.get(param) and e.get("tokens_per_sec")})
            if len(pts) > 1:
                charts.append(viz.create_parameter_sensitivity(
                    param, [p for p, _ in pts], [t for _, t in pts],
                    title=f"Throughput vs {param}"))

        table = res.get("op_table", {})
        if table.get("ops"):
            charts.append(viz.create_op_explorer(
                table["ops"], title="Op explorer (device time)"))
            charts.append(viz.create_op_breakdown(
                {o["name"]: o["total_us"] for o in table["ops"][:12]},
                title="Device time by op (us)"))

        if res.get("memory_trace"):
            charts.append(viz.create_memory_visualization(
                res["memory_trace"]))

        if res.get("impact"):
            charts.append(viz.create_optimization_impact(res["impact"]))

        flops = max((e.get("flops", 0.0) for e in entries), default=0.0)
        byts = max((e.get("bytes_accessed", 0.0) for e in entries),
                   default=0.0)
        if times and (flops or byts):
            rep = BottleneckAnalyzer().analyze(
                wall_time_s=min(times) / 1e3, flops=flops,
                bytes_accessed=byts)
            charts.append(viz.create_bottleneck_visualization(
                json.loads(rep.to_json())))
        return charts

    def compare_charts(self, names: List[str]) -> List[Dict[str, Any]]:
        """Cross-result comparison charts (parity: the reference UI's
        comparative views)."""
        from mlio_tpu.dashboard import visualizations as viz

        summary = self.compare(names)
        charts: List[Dict[str, Any]] = []
        sp = {n: s["speedup_vs_first"] for n, s in summary.items()
              if s.get("speedup_vs_first")}
        if sp:
            charts.append(viz.create_speedup_comparison(
                sp, title="Speedup vs first result set"))
        named = {}
        for n in names:
            res = self._registry.get(n) or {}
            ts = [e["mean_ms"] / 1e3 for e in res.get("results", [])
                  if e.get("mean_ms")]
            if ts:
                named[n] = ts
        if named:
            charts.append(viz.create_comparative_timeline(named))
        tps = {n: s["best_tokens_per_sec"] for n, s in summary.items()
               if s.get("best_tokens_per_sec")}
        if tps:
            charts.append(viz.create_op_breakdown(
                tps, title="Best throughput by result set (tok/s)"))
        tabs = [(n, (self._registry.get(n) or {}).get("op_table", {})
                 .get("ops")) for n in names]
        tabs = [(n, ops) for n, ops in tabs if ops]
        if tabs:
            charts.append(viz.create_breakdown_comparison(
                [ops for _, ops in tabs], [n for n, _ in tabs]))
        return charts

    def recommendations(self, name: str) -> List[Dict[str, Any]]:
        from mlio_tpu.dashboard.recommendation import (
            generate_optimization_recommendations,
            recommendations_to_json,
        )
        from mlio_tpu.profiling.bottleneck import BottleneckAnalyzer

        res = self._registry.get(name) or {}
        entries = res.get("results", [])
        wall_ms = min((e.get("mean_ms") for e in entries
                       if e.get("mean_ms")), default=1.0)
        flops = max((e.get("flops", 0.0) for e in entries), default=0.0)
        byts = max((e.get("bytes_accessed", 0.0) for e in entries), default=0.0)
        rep = BottleneckAnalyzer().analyze(
            wall_time_s=wall_ms / 1e3, flops=flops, bytes_accessed=byts)
        return recommendations_to_json(
            generate_optimization_recommendations(rep, res.get("config", {})))

    # -- server --------------------------------------------------------------

    def _make_handler(dashboard):
        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _send(self, payload, status=200, ctype="application/json"):
                body = (json.dumps(payload, default=float).encode()
                        if ctype == "application/json" else payload)
                self.send_response(status)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                url = urlparse(self.path)
                parts = [p for p in url.path.split("/") if p]
                if not parts:  # index
                    page = (STATIC_DIR / "index.html").read_bytes()
                    return self._send(page, ctype="text/html")
                if parts[0] == "static" and len(parts) == 2:
                    f = STATIC_DIR / parts[1]
                    if f.exists():
                        ctype = ("text/css" if f.suffix == ".css"
                                 else "application/javascript")
                        return self._send(f.read_bytes(), ctype=ctype)
                    return self._send({"error": "not found"}, 404)
                if parts[:2] == ["api", "models"]:
                    return self._send(dashboard.list_models())
                if parts[:2] == ["api", "results"]:
                    return self._send(dashboard._registry)
                if parts[:2] == ["api", "profile"] and len(parts) == 3:
                    res = dashboard.get_result(parts[2])
                    return self._send(res if res else {"error": "not found"},
                                      200 if res else 404)
                if parts[:2] == ["api", "compare"]:
                    ids = parse_qs(url.query).get("ids", [""])[0].split(",")
                    return self._send(dashboard.compare([i for i in ids if i]))
                if parts[:2] == ["api", "recommendations"] and len(parts) == 3:
                    return self._send(dashboard.recommendations(parts[2]))
                if parts[:2] == ["api", "charts"] and len(parts) == 3:
                    return self._send(dashboard.charts(parts[2]))
                if parts[:2] == ["api", "compare-charts"]:
                    ids = parse_qs(url.query).get("ids", [""])[0].split(",")
                    return self._send(
                        dashboard.compare_charts([i for i in ids if i]))
                return self._send({"error": "not found"}, 404)

            def do_POST(self):
                url = urlparse(self.path)
                if url.path == "/api/upload":
                    length = int(self.headers.get("Content-Length", 0))
                    data = json.loads(self.rfile.read(length) or b"{}")
                    name = data.get("name", "uploaded")
                    dashboard.register_result(name, data)
                    return self._send({"ok": True, "name": name})
                return self._send({"error": "not found"}, 404)

        return Handler

    def run_server(self, blocking: bool = True) -> "Dashboard":
        """(parity: app.py run_server; the CLI blocks on it, main.py:272)."""
        self._server = ThreadingHTTPServer((self.host, self.port),
                                           self._make_handler())
        if blocking:
            self._server.serve_forever()
        else:
            t = threading.Thread(target=self._server.serve_forever,
                                 daemon=True)
            t.start()
        return self

    def shutdown(self) -> None:
        if self._server:
            self._server.shutdown()
            self._server.server_close()
            self._server = None


def create_dashboard(results_dir: str = "benchmark_results",
                     host: str = "127.0.0.1", port: int = 8050) -> Dashboard:
    """(parity: create_dashboard dashboard/app.py:318-349)."""
    return Dashboard(results_dir=results_dir, host=host, port=port)
