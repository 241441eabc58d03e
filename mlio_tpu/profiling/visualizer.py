"""Profile visualization: matplotlib timeline/breakdown/memory plots.

Rebuild of /root/reference/profiling/profile_visualizer.py:26-401 (the Dash
interactive variant :403-523 is replaced by the stdlib dashboard in
mlio_tpu/dashboard which consumes the same JSON).
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_step_timeline(wall_times_s: Sequence[float], path,
                       title: str = "Step latency") -> str:
    """(parity: plot_timeline profile_visualizer.py:26-120)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(8, 3))
    t = np.asarray(wall_times_s) * 1e3
    ax.plot(t, marker="o", lw=1)
    ax.set_xlabel("step")
    ax.set_ylabel("latency (ms)")
    ax.set_title(f"{title} (p50 {np.percentile(t, 50):.2f} ms, "
                 f"p99 {np.percentile(t, 99):.2f} ms)")
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return str(path)


def plot_cost_breakdown(costs: Dict[str, float], path,
                        title: str = "Cost breakdown") -> str:
    """(parity: plot_op_breakdown profile_visualizer.py:122-210)."""
    plt = _plt()
    items = sorted(costs.items(), key=lambda kv: -abs(kv[1]))[:12]
    fig, ax = plt.subplots(figsize=(8, 4))
    names = [k for k, _ in items]
    vals = [v for _, v in items]
    ax.barh(names[::-1], vals[::-1])
    ax.set_title(title)
    ax.set_xlabel("value")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return str(path)


def plot_memory_trace(samples: List[Dict], path,
                      title: str = "Device memory") -> str:
    """(parity: plot_memory profile_visualizer.py:212-300)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(8, 3))
    if samples:
        t0 = samples[0]["t"]
        ax.plot([s["t"] - t0 for s in samples],
                [s["bytes_in_use"] / 1e9 for s in samples], label="in use")
        ax.plot([s["t"] - t0 for s in samples],
                [s["peak_bytes_in_use"] / 1e9 for s in samples],
                label="peak", ls="--")
    ax.set_xlabel("time (s)")
    ax.set_ylabel("GB")
    ax.set_title(title)
    ax.legend()
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return str(path)


def plot_op_breakdown(op_table, path, k: int = 15,
                      title: str = "Per-op device time") -> str:
    """Top-k measured ops as a horizontal bar chart (parity: the kernel
    breakdown view, profile_visualizer.py:122-210, now from MEASURED per-op
    time instead of cost-model estimates)."""
    plt = _plt()
    ops = op_table.top(k)
    fig, ax = plt.subplots(figsize=(9, max(3, 0.35 * len(ops) + 1)))
    names = [o.name[:48] for o in ops][::-1]
    vals = [o.total_us / 1e3 for o in ops][::-1]
    bars = ax.barh(names, vals)
    for bar, o in zip(bars, ops[::-1]):
        ax.text(bar.get_width(), bar.get_y() + bar.get_height() / 2,
                f" {o.pct:.1f}%", va="center", fontsize=8)
    ax.set_xlabel("device time (ms)")
    ax.set_title(f"{title} (total {op_table.total_us / 1e3:.2f} ms)")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return str(path)


def plot_op_comparison(table_a, table_b, path, k: int = 12,
                       label_a: str = "A", label_b: str = "B") -> str:
    """Side-by-side per-op comparison of two captures (parity: the
    comparative views, profile_visualizer.py:523-660): grouped bars of the
    union of each table's top ops, annotated with the speedup."""
    plt = _plt()
    a = {o.name: o.total_us for o in table_a.top(k)}
    b = {o.name: o.total_us for o in table_b.top(k)}
    names = list(dict.fromkeys(list(a) + list(b)))[:k]
    ya = [a.get(n, 0.0) / 1e3 for n in names]
    yb = [b.get(n, 0.0) / 1e3 for n in names]
    x = np.arange(len(names))
    fig, ax = plt.subplots(figsize=(10, 4.5))
    ax.bar(x - 0.2, ya, width=0.4, label=label_a)
    ax.bar(x + 0.2, yb, width=0.4, label=label_b)
    for i, n in enumerate(names):
        if a.get(n) and b.get(n):
            ax.text(i, max(ya[i], yb[i]),
                    f"{a[n] / b[n]:.2f}x", ha="center", fontsize=8)
    ax.set_xticks(x)
    ax.set_xticklabels([n[:24] for n in names], rotation=35, ha="right",
                       fontsize=8)
    ax.set_ylabel("device time (ms)")
    ax.set_title(f"Per-op comparison ({label_a} vs {label_b}; "
                 "labels = A/B speedup)")
    ax.legend()
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return str(path)


def plot_op_timeline(planes, path, max_events: int = 400,
                     title: str = "Device op timeline") -> str:
    """Gantt-style per-line event timeline from parsed xplane planes
    (parity: the interactive timeline, profile_visualizer.py:403-520)."""
    plt = _plt()
    from mlio_tpu.profiling.xplane import _is_device_plane

    rows = []
    cand = [p for p in planes if _is_device_plane(p)] or \
        [p for p in planes if "CPU" in p.name]
    for plane in cand:
        for line in plane.lines:
            evs = [(ev.offset_ps / 1e9,
                    max(ev.duration_ps, 1) / 1e9,
                    plane.event_display.get(ev.metadata_id)
                    or plane.event_names.get(ev.metadata_id, "?"))
                   for ev in line.events[:max_events] if ev.duration_ps > 0]
            if evs:
                rows.append((f"{plane.name[-18:]}/{line.name[:18]}", evs))
    fig, ax = plt.subplots(figsize=(10, max(2.5, 0.5 * len(rows) + 1)))
    cmap = plt.get_cmap("tab20")
    name_color = {}
    for y, (label, evs) in enumerate(rows):
        for off, dur, name in evs:
            c = name_color.setdefault(name, cmap(len(name_color) % 20))
            ax.barh(y, dur, left=off, height=0.6, color=c)
    ax.set_yticks(range(len(rows)))
    ax.set_yticklabels([r[0] for r in rows], fontsize=7)
    ax.set_xlabel("time (ms)")
    ax.set_title(title)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return str(path)


def save_all(profile_results, out_dir, memory_samples=None,
             op_table=None) -> List[str]:
    """(parity: save_all_visualizations profile_visualizer.py:330-401)."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    paths = [
        plot_step_timeline(profile_results.wall_times_s, out / "timeline.png"),
        plot_cost_breakdown(profile_results.cost, out / "cost_breakdown.png"),
    ]
    if memory_samples:
        paths.append(plot_memory_trace(memory_samples, out / "memory.png"))
    if op_table is not None:
        paths.append(plot_op_breakdown(op_table, out / "op_breakdown.png"))
    return paths
