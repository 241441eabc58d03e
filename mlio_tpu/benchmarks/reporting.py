"""Benchmark reporting: comparison tables, plots, markdown/HTML/JSON export.

Rebuild of /root/reference/benchmarks/reporting.py (BenchmarkReport :20-489,
ReportGenerator :491-899).
"""
from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Dict, List, Optional


class BenchmarkReport:
    """(parity: BenchmarkReport reporting.py:20-489)."""

    def __init__(self, results: List[Dict[str, Any]], name: str = "benchmark"):
        self.results = results
        self.name = name

    def to_dataframe(self):
        import pandas as pd

        return pd.DataFrame(self.results)

    def comparison_table(self):
        """Per (batch, seq) comparison with speedup columns
        (parity: reporting.py:120-210)."""
        import pandas as pd

        df = self.to_dataframe()
        if df.empty or "variant" not in df:
            return df
        rows = []
        for (b, s), grp in df.groupby(["batch", "seq_len"]):
            base = grp[grp.variant == "baseline"]
            base_ms = float(base.mean_ms.iloc[0]) if len(base) else None
            for _, r in grp.iterrows():
                row = {"batch": b, "seq_len": s, "variant": r["variant"],
                       "mean_ms": r.get("mean_ms"),
                       "p99_ms": r.get("p99_ms"),
                       "tokens_per_sec": r.get("tokens_per_sec")}
                if base_ms and r.get("mean_ms"):
                    row["speedup"] = base_ms / r["mean_ms"]
                rows.append(row)
        return pd.DataFrame(rows)

    def summary_text(self) -> str:
        """(parity: reporting.py:60-118)."""
        lines = [f"Benchmark report: {self.name}",
                 time.strftime("%Y-%m-%d %H:%M:%S"), "=" * 50]
        df = self.comparison_table()
        if hasattr(df, "to_string"):
            lines.append(df.to_string(index=False))
        return "\n".join(lines)

    def plot(self, out_dir) -> List[str]:
        """Latency/throughput/speedup plots (parity: reporting.py:212-352)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        out = Path(out_dir)
        out.mkdir(parents=True, exist_ok=True)
        paths = []
        df = self.comparison_table()
        if hasattr(df, "empty") and not df.empty and "variant" in df:
            fig, ax = plt.subplots(figsize=(8, 4))
            for v, grp in df.groupby("variant"):
                label = f"{v}"
                xs = [f"b{b}s{s}" for b, s in zip(grp.batch, grp.seq_len)]
                ax.plot(xs, grp.mean_ms, marker="o", label=label)
            ax.set_ylabel("mean latency (ms)")
            ax.set_title(self.name)
            ax.legend()
            ax.grid(alpha=0.3)
            fig.tight_layout()
            p = out / f"{self.name}_latency.png"
            fig.savefig(p, dpi=110)
            plt.close(fig)
            paths.append(str(p))
        return paths

    def to_markdown(self, path=None) -> str:
        """(parity: reporting.py:354-388)."""
        df = self.comparison_table()
        md = [f"# Benchmark report: {self.name}", ""]
        try:
            md.append(df.to_markdown(index=False))
        except Exception:
            md.append("```\n" + df.to_string(index=False) + "\n```")
        text = "\n".join(md)
        if path:
            Path(path).write_text(text)
        return text

    def to_html(self, path=None) -> str:
        """(parity: reporting.py:389-430)."""
        df = self.comparison_table()
        html = (f"<html><head><title>{self.name}</title></head><body>"
                f"<h1>{self.name}</h1>{df.to_html(index=False)}</body></html>")
        if path:
            Path(path).write_text(html)
        return html

    def to_json(self, path=None) -> str:
        payload = json.dumps({"name": self.name, "results": self.results},
                             indent=2, default=float)
        if path:
            Path(path).write_text(payload)
        return payload


class ReportGenerator:
    """Aggregate stored JSON results into reports
    (parity: ReportGenerator reporting.py:491-899)."""

    def __init__(self, results_dir: str = "benchmark_results"):
        self.results_dir = Path(results_dir)

    def load_all(self) -> Dict[str, List[Dict[str, Any]]]:
        out = {}
        for f in sorted(self.results_dir.glob("*.json")):
            try:
                data = json.loads(f.read_text())
                out[f.stem] = data.get("results", data)
            except Exception:
                continue
        return out

    def optimization_report(self, path=None) -> str:
        """(parity: reporting.py:520-640)."""
        all_results = self.load_all()
        md = ["# Optimization report", ""]
        for name, results in all_results.items():
            rep = BenchmarkReport(results, name=name)
            md.append(f"## {name}")
            md.append(rep.to_markdown())
            md.append("")
        text = "\n".join(md)
        if path:
            Path(path).write_text(text)
        return text

    def generate_readme(self, path=None) -> str:
        """(parity: README generator reporting.py:820-899)."""
        all_results = self.load_all()
        md = ["# Benchmark results", "",
              f"{len(all_results)} result sets in `{self.results_dir}`.", ""]
        for name, results in all_results.items():
            md.append(f"- **{name}**: {len(results)} entries")
        text = "\n".join(md)
        if path:
            Path(path).write_text(text)
        return text
