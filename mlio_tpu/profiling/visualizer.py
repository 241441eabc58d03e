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


def save_all(profile_results, out_dir, memory_samples=None) -> List[str]:
    """(parity: save_all_visualizations profile_visualizer.py:330-401)."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    paths = [
        plot_step_timeline(profile_results.wall_times_s, out / "timeline.png"),
        plot_cost_breakdown(profile_results.cost, out / "cost_breakdown.png"),
    ]
    if memory_samples:
        paths.append(plot_memory_trace(memory_samples, out / "memory.png"))
    return paths
