"""Visualization builders: chart-spec dicts rendered by the static JS UI.

Rebuild of /root/reference/dashboard/visualizations.py:18-963 (13 Plotly
builders). Plotly isn't available in this environment, so each builder
returns a JSON-serializable chart spec ({type, title, series/bars/...}) that
static/js/dashboard.js renders as inline SVG — same separation the reference
has between figure-building and the web layer.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence


def _chart(kind: str, title: str, **kw) -> Dict[str, Any]:
    return {"type": kind, "title": title, **kw}


def create_timeline_visualization(wall_times_ms: Sequence[float],
                                  title: str = "Step timeline") -> Dict:
    """(parity: visualizations.py:18-90)."""
    return _chart("line", title, x=list(range(len(wall_times_ms))),
                  series=[{"name": "latency_ms", "y": list(wall_times_ms)}],
                  x_label="step", y_label="ms")


def create_op_breakdown(costs: Dict[str, float],
                        title: str = "Cost breakdown") -> Dict:
    """(parity: visualizations.py:92-170)."""
    items = sorted(costs.items(), key=lambda kv: -abs(kv[1]))[:12]
    return _chart("bar", title, labels=[k for k, _ in items],
                  values=[float(v) for _, v in items])


def create_memory_visualization(samples: List[Dict],
                                title: str = "Device memory") -> Dict:
    """(parity: visualizations.py:172-250)."""
    t0 = samples[0]["t"] if samples else 0
    return _chart("line", title,
                  x=[round(s["t"] - t0, 3) for s in samples],
                  series=[
                      {"name": "in_use_gb",
                       "y": [s["bytes_in_use"] / 1e9 for s in samples]},
                      {"name": "peak_gb",
                       "y": [s["peak_bytes_in_use"] / 1e9 for s in samples]},
                  ], x_label="s", y_label="GB")


def create_kernel_efficiency_chart(kernels: Dict[str, float],
                                   title: str = "Kernel efficiency") -> Dict:
    """Fraction-of-roofline per kernel (parity: visualizations.py:252-330)."""
    return _chart("bar", title, labels=list(kernels),
                  values=[float(v) for v in kernels.values()],
                  y_label="fraction of roofline", y_max=1.0)


def create_parallel_scaling_chart(device_counts: Sequence[int],
                                  throughputs: Sequence[float],
                                  title: str = "Parallel scaling") -> Dict:
    """(parity: visualizations.py:332-420)."""
    ideal = [throughputs[0] * n / device_counts[0] for n in device_counts] \
        if throughputs else []
    return _chart("line", title, x=list(device_counts),
                  series=[{"name": "measured", "y": list(throughputs)},
                          {"name": "ideal", "y": ideal, "dash": True}],
                  x_label="devices", y_label="tokens/s")


def create_comparative_timeline(named_times: Dict[str, Sequence[float]],
                                title: str = "Comparative timeline") -> Dict:
    """(parity: visualizations.py:422-500)."""
    series = [{"name": k, "y": [v * 1e3 for v in vs]}
              for k, vs in named_times.items()]
    n = max((len(s["y"]) for s in series), default=0)
    return _chart("line", title, x=list(range(n)), series=series,
                  x_label="step", y_label="ms")


def create_speedup_comparison(speedups: Dict[str, float],
                              title: str = "Speedup vs baseline") -> Dict:
    """(parity: visualizations.py:502-570)."""
    return _chart("bar", title, labels=list(speedups),
                  values=[float(v) for v in speedups.values()],
                  y_label="x", baseline=1.0)


def create_memory_comparison(mem_bytes: Dict[str, float],
                             title: str = "Memory comparison") -> Dict:
    """(parity: visualizations.py:572-640)."""
    return _chart("bar", title, labels=list(mem_bytes),
                  values=[float(v) / 1e9 for v in mem_bytes.values()],
                  y_label="GB")


def create_op_explorer(rows: List[Dict[str, Any]],
                       title: str = "Op explorer") -> Dict:
    """Sortable table data (parity: interactive explorer
    visualizations.py:642-750)."""
    cols = sorted({k for r in rows for k in r})
    return _chart("table", title, columns=cols,
                  rows=[[r.get(c) for c in cols] for r in rows])


def create_bottleneck_visualization(report_json: Dict,
                                    title: str = "Bottlenecks") -> Dict:
    """(parity: visualizations.py:752-840)."""
    bs = report_json.get("bottlenecks", [])
    return _chart("bar", title, labels=[b["kind"] for b in bs],
                  values=[b["severity"] for b in bs],
                  annotations=[b["detail"] for b in bs], y_max=1.0)


def create_parameter_sensitivity(param_name: str, values: Sequence,
                                 metrics: Sequence[float],
                                 title: Optional[str] = None) -> Dict:
    """(parity: visualizations.py:842-900)."""
    return _chart("line", title or f"Sensitivity: {param_name}",
                  x=list(values),
                  series=[{"name": param_name, "y": list(metrics)}],
                  x_label=param_name, y_label="metric")


def create_optimization_impact(impacts: Dict[str, Dict[str, float]],
                               title: str = "Optimization impact") -> Dict:
    """Grouped throughput/latency/memory impact bars
    (parity: visualizations.py:902-963)."""
    metrics = sorted({m for d in impacts.values() for m in d})
    return _chart("grouped_bar", title, groups=list(impacts),
                  metrics=metrics,
                  values=[[impacts[g].get(m, 0.0) for m in metrics]
                          for g in impacts])


def create_breakdown_comparison(op_tables: List[List[Dict[str, Any]]],
                                labels: Sequence[str],
                                title: str = "Operation breakdown comparison",
                                ) -> Dict:
    """Stacked per-category device-time bars, one bar per result set
    (parity: visualizations.py:640-714 — the reference groups each
    profile's operations by category and stacks the durations)."""
    def categorize(name: str) -> str:
        n = name.lower()
        for cat, keys in (
                ("matmul", ("dot", "conv", "gemm", "einsum")),
                ("attention", ("attention", "flash", "softmax", "paged")),
                ("norm", ("norm", "rms")),
                ("collective", ("all-reduce", "all-gather", "psum",
                                "permute", "reduce-scatter", "all-to-all")),
                ("data-movement", ("copy", "transpose", "dynamic-update",
                                   "slice", "broadcast", "reshape",
                                   "gather", "scatter", "pad"))):
            if any(k in n for k in keys):
                return cat
        return "other"

    cats: set = set()
    breakdowns: List[Dict[str, float]] = []
    for ops in op_tables:
        d: Dict[str, float] = {}
        for o in ops or []:
            c = categorize(str(o.get("name", "")))
            d[c] = d.get(c, 0.0) + float(o.get("total_us", 0.0)) / 1e3
        cats.update(d)
        breakdowns.append(d)
    metrics = sorted(cats)
    return _chart("grouped_bar", title, groups=list(labels),
                  metrics=metrics,
                  values=[[round(b.get(m, 0.0), 4) for m in metrics]
                          for b in breakdowns],
                  stacked=True, y_label="ms")


ALL_BUILDERS = [
    create_timeline_visualization,
    create_op_breakdown,
    create_memory_visualization,
    create_kernel_efficiency_chart,
    create_parallel_scaling_chart,
    create_comparative_timeline,
    create_speedup_comparison,
    create_memory_comparison,
    create_op_explorer,
    create_bottleneck_visualization,
    create_parameter_sensitivity,
    create_optimization_impact,
    create_breakdown_comparison,
]
