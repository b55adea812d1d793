"""Eval report sinks: Precision@K table → CSV / console / optional PNGs.

Parity with the reference's only published artifacts — the two matplotlib
figures and the console table of its eval harness (``Hybrid_Recom_vecdb.py:
294-331``): ``plot_precision_k`` (Precision@K line chart per model),
``plot_runtime_total`` (total-runtime bar chart), ``print_results``.
Driver-side by design: the metrics table is |models| × |ks| rows (a dozen),
so ``collect()`` here is the correct plan at any corpus scale — everything
upstream of it stays distributed.

matplotlib is not in the test container, so the PNG path is import-gated
(skipped with a notice, never an error); the CSVs always write.
"""

from __future__ import annotations

import csv
import os

from pyspark.sql import DataFrame


def _rows(metrics: DataFrame | list) -> list:
    if isinstance(metrics, DataFrame):
        return metrics.collect()
    return list(metrics)


def write_eval_report(metrics: DataFrame | list, out_dir: str,
                      runtimes: dict[str, float] | None = None,
                      num_queries: int | None = None) -> dict[str, str]:
    """Write the eval artifacts; returns {artifact_name: path}.

    metrics:   (model, k, precision) — ``evaluate.precision_at_k`` output
    runtimes:  optional model → total seconds (ref ``total_time_*``)
    """
    os.makedirs(out_dir, exist_ok=True)
    rows = sorted(_rows(metrics), key=lambda r: (r["model"], r["k"]))
    written: dict[str, str] = {}

    path = os.path.join(out_dir, "precision_k.csv")
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["model", "k", "precision"])
        for r in rows:
            w.writerow([r["model"], r["k"], r["precision"]])
    written["precision_k.csv"] = path

    if runtimes:
        path = os.path.join(out_dir, "runtime_total.csv")
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["model", "total_time_s", "num_queries"])
            for model, secs in sorted(runtimes.items()):
                w.writerow([model, f"{secs:.4f}", num_queries or ""])
        written["runtime_total.csv"] = path

    written.update(_write_plots(rows, out_dir, runtimes, num_queries))
    return written


def _write_plots(rows: list, out_dir: str,
                 runtimes: dict[str, float] | None,
                 num_queries: int | None) -> dict[str, str]:
    try:
        import matplotlib  # noqa: PLC0415 — optional, absent in container

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt  # noqa: PLC0415
    except ImportError:
        return {}
    written: dict[str, str] = {}

    by_model: dict[str, list] = {}
    for r in rows:
        by_model.setdefault(r["model"], []).append((r["k"], r["precision"]))
    plt.figure()
    for model, pts in sorted(by_model.items()):
        ks, ps = zip(*sorted(pts))
        plt.plot(ks, ps, marker="o", label=model.capitalize())
    plt.xlabel("K")
    plt.ylabel("Precision@K")
    plt.title("Precision@K vs K (Content vs Hybrid)")
    plt.legend()
    plt.tight_layout()
    path = os.path.join(out_dir, "precision_k.png")
    plt.savefig(path, dpi=200)
    plt.close()
    written["precision_k.png"] = path

    if runtimes:
        plt.figure()
        models = sorted(runtimes)
        plt.bar([m.capitalize() for m in models], [runtimes[m] for m in models])
        label = f" for {num_queries} queries" if num_queries else ""
        plt.ylabel(f"Total time (s){label}")
        plt.title("Total Runtime Comparison (Content vs Hybrid)")
        plt.tight_layout()
        path = os.path.join(out_dir, "runtime_total.png")
        plt.savefig(path, dpi=200)
        plt.close()
        written["runtime_total.png"] = path
    return written


def print_results(metrics: DataFrame | list,
                  runtimes: dict[str, float] | None = None,
                  num_queries: int | None = None) -> str:
    """Console table mirroring ref ``print_results`` (:320-331)."""
    rows = _rows(metrics)
    models = sorted({r["model"] for r in rows})
    ks = sorted({r["k"] for r in rows})
    prec = {(r["model"], r["k"]): r["precision"] for r in rows}
    lines = ["", "=== Precision@K (" + " vs ".join(m.capitalize() for m in models) + ") ==="]
    lines.append("K\t" + "\t".join(m.capitalize() for m in models))
    for k in ks:
        lines.append(f"{k}\t" + "\t".join(f"{prec[(m, k)]:.4f}" for m in models))
    if runtimes:
        lines += ["", "=== Total time taken (same query batch) ==="]
        if num_queries is not None:
            lines.append(f"Queries: {num_queries}")
        for m in sorted(runtimes):
            lines.append(f"{m.capitalize()} total time: {runtimes[m]:.4f} s")
    out = "\n".join(lines)
    print(out)
    return out
