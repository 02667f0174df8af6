"""Evaluation visualization helper (reference
``src/evaluation/visualizations.py:22-350``: ROC / PR / threshold /
importance figures).

Spark split of labor: the heavy part — computing the curves over the
full scored table — is the distributed evaluation engine
(``operators/evaluation.py``); what remains here is DRIVER-side
rendering of the already-tiny collected aggregates (a PR curve has
|distinct thresholds| points, a sweep 9 rows, importances top-n). So
this module never touches a big DataFrame: callers pass the aggregate
DataFrames, `collect_evaluation_data` pulls them into plain lists, and
rendering is matplotlib IF INSTALLED (import-gated — the engine carries
no plotting dependency), with a CSV export fallback that always works.
"""

from __future__ import annotations

import csv
import os

from pyspark.sql import DataFrame


def collect_evaluation_data(
    pr_curve_df: DataFrame | None = None,
    sweep_df: DataFrame | None = None,
    importances: list[tuple[str, float]] | None = None,
) -> dict:
    """Collect the small evaluation aggregates into plain-python curve
    data: {'pr': [(recall, precision, threshold)...] sorted by recall,
    'sweep': [(threshold, f1, precision, recall, cost)...],
    'importance': [(name, weight)...]}."""
    out: dict = {}
    if pr_curve_df is not None:
        rows = pr_curve_df.select("recall", "precision", "threshold").collect()
        out["pr"] = sorted(
            [(r["recall"], r["precision"], r["threshold"]) for r in rows]
        )
    if sweep_df is not None:
        rows = sweep_df.select(
            "threshold", "f1", "precision", "recall", "cost"
        ).collect()
        out["sweep"] = sorted(
            [
                (r["threshold"], r["f1"], r["precision"], r["recall"], r["cost"])
                for r in rows
            ]
        )
    if importances is not None:
        out["importance"] = list(importances)
    return out


def export_evaluation_csv(data: dict, out_dir: str) -> list[str]:
    """Dependency-free export: one CSV per collected aggregate."""
    os.makedirs(out_dir, exist_ok=True)
    headers = {
        "pr": ["recall", "precision", "threshold"],
        "sweep": ["threshold", "f1", "precision", "recall", "cost"],
        "importance": ["feature", "weight"],
    }
    paths = []
    for key, rows in data.items():
        path = os.path.join(out_dir, f"{key}.csv")
        with open(path, "w", newline="") as fh:
            w = csv.writer(fh)
            w.writerow(headers[key])
            w.writerows(rows)
        paths.append(path)
    return paths


def plot_evaluation(data: dict, out_dir: str) -> list[str]:
    """Render the reference's figure set from collected curve data.
    Requires matplotlib (not a container dependency) — raises ImportError
    with a pointer to the CSV fallback otherwise."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError as exc:  # pragma: no cover - env without matplotlib
        raise ImportError(
            "matplotlib is not installed; use export_evaluation_csv() for a "
            "dependency-free export of the same curves"
        ) from exc

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    if "pr" in data:  # visualizations.py: plot_precision_recall_curve
        rec, prec = [p[0] for p in data["pr"]], [p[1] for p in data["pr"]]
        fig, ax = plt.subplots()
        ax.plot(rec, prec)
        ax.set_xlabel("recall"), ax.set_ylabel("precision")
        ax.set_title("Precision-Recall curve")
        path = os.path.join(out_dir, "pr_curve.png")
        fig.savefig(path), plt.close(fig), paths.append(path)
    if "sweep" in data:  # visualizations.py: plot_threshold_analysis
        t = [p[0] for p in data["sweep"]]
        fig, ax = plt.subplots()
        for idx, name in ((1, "f1"), (2, "precision"), (3, "recall")):
            ax.plot(t, [p[idx] for p in data["sweep"]], label=name)
        ax.set_xlabel("threshold"), ax.legend()
        ax.set_title("Threshold sweep")
        path = os.path.join(out_dir, "threshold_sweep.png")
        fig.savefig(path), plt.close(fig), paths.append(path)
    if "importance" in data:  # visualizations.py: plot_feature_importance
        names = [p[0] for p in data["importance"]][::-1]
        vals = [p[1] for p in data["importance"]][::-1]
        fig, ax = plt.subplots()
        ax.barh(names, vals)
        ax.set_title("Feature importance")
        path = os.path.join(out_dir, "importance.png")
        fig.savefig(path), plt.close(fig), paths.append(path)
    return paths
