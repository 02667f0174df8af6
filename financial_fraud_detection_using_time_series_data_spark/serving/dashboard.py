"""Static HTML monitoring dashboard — the engine's analog of the
reference's interactive app (``streamlit_app.py``, 488 LoC).

The reference renders one transaction at a time through a Streamlit
session (presets → score → gauge SVG → risk level → history stats,
``streamlit_app.py:235-380``). An analytics engine's dashboard is the
same PRESENTATION over batch aggregates: every number here is computed
Spark-side by the operators the engine already ships (score_batch,
threshold_sweep, confusion metrics, PSI drift), collected as tiny
aggregate rows, and rendered to a self-contained HTML file with inline
SVG — stdlib only, no web framework, no JS dependencies. Serving
single transactions stays on `serving/http_api.py`/the streaming plane;
this module is the reporting surface.
"""

from __future__ import annotations

import html
import math
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import drift, evaluation
from ..streaming.scoring import score_batch

# risk palette mirrors streamlit_app.py:252-264 (css colors per level)
RISK_COLORS = {
    "CRITICAL": "#ef4444",
    "HIGH": "#f97316",
    "MEDIUM": "#eab308",
    "LOW": "#3b82f6",
    "MINIMAL": "#10b981",
}
RISK_ORDER = ["CRITICAL", "HIGH", "MEDIUM", "LOW", "MINIMAL"]


def gauge_svg(score: float) -> str:
    """Half-circle arc gauge (streamlit_app.py:252-281 semantics: arc
    fraction = score, stroke colored by risk band)."""
    pct = max(0.0, min(float(score), 1.0))
    color = next(
        RISK_COLORS[lvl]
        for lvl, lo in zip(RISK_ORDER, (0.8, 0.6, 0.4, 0.2, 0.0))
        if pct >= lo
    )
    radius = 90
    circumference = math.pi * radius
    offset = circumference * (1 - pct)
    return (
        f'<svg width="240" height="140" viewBox="0 0 240 140">'
        f'<path d="M 20 130 A 90 90 0 0 1 220 130" fill="none" '
        f'stroke="#e5e7eb" stroke-width="16" stroke-linecap="round"/>'
        f'<path d="M 20 130 A 90 90 0 0 1 220 130" fill="none" '
        f'stroke="{color}" stroke-width="16" stroke-linecap="round" '
        f'stroke-dasharray="{circumference:.2f}" stroke-dashoffset="{offset:.2f}"/>'
        f'<text x="120" y="110" text-anchor="middle" font-size="28" '
        f'font-family="sans-serif">{pct:.0%}</text></svg>'
    )


def _table(rows: list[dict], columns: list[str]) -> str:
    head = "".join(f"<th>{html.escape(c)}</th>" for c in columns)
    body = "".join(
        "<tr>"
        + "".join(
            f"<td>{html.escape(str(r.get(c, '')))}" + "</td>" for c in columns
        )
        + "</tr>"
        for r in rows
    )
    return f"<table><thead><tr>{head}</tr></thead><tbody>{body}</tbody></table>"


def _bar_chart(items: list[tuple[str, int, str]], width: int = 420) -> str:
    """Inline horizontal bar chart: (label, value, color) triples."""
    if not items:
        return ""
    mx = max(v for _, v, _ in items) or 1
    rows = []
    for i, (label, v, color) in enumerate(items):
        w = int((width - 120) * v / mx)
        y = 8 + i * 26
        rows.append(
            f'<text x="0" y="{y + 12}" font-size="12" font-family="sans-serif">'
            f"{html.escape(label)}</text>"
            f'<rect x="90" y="{y}" width="{max(w, 1)}" height="16" fill="{color}"/>'
            f'<text x="{95 + w}" y="{y + 12}" font-size="12" '
            f'font-family="sans-serif">{v}</text>'
        )
    h = 16 + len(items) * 26
    return f'<svg width="{width}" height="{h}">' + "".join(rows) + "</svg>"


def dashboard_aggregates(
    df: DataFrame, amount_col: str = "value", label_col: str | None = None
) -> dict:
    """Collect the dashboard's numbers — each a Spark aggregate whose
    result is O(risk levels + thresholds + deciles), never O(rows)."""
    scored = score_batch(df, amount_col=amount_col)
    summary = scored.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("fraud_score").alias("mean_score"),
        F.min("fraud_score").alias("min_score"),
        F.max("fraud_score").alias("max_score"),
        F.sum((F.col("fraud_score") >= 0.5).cast("long")).alias("n_flagged"),
    ).collect()[0]
    risk_counts = {
        r.risk: r.n
        for r in scored.groupBy("risk").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    out = {
        "n": summary.n,
        "mean_score": float(summary.mean_score or 0.0),
        "min_score": float(summary.min_score or 0.0),
        "max_score": float(summary.max_score or 0.0),
        "n_flagged": int(summary.n_flagged or 0),
        "risk_counts": risk_counts,
        "sweep": [],
        "psi": None,
    }
    if label_col is not None:
        sweep = evaluation.threshold_sweep(scored, label_col, "fraud_score")
        out["sweep"] = [r.asDict() for r in sweep.orderBy("threshold").collect()]
    return out


def render_dashboard(
    df: DataFrame,
    out_path: str,
    amount_col: str = "value",
    label_col: str | None = None,
    reference_df: DataFrame | None = None,
    title: str = "Fraud Engine Monitor",
) -> str:
    """Render the batch-monitoring dashboard to ``out_path`` and return
    the path. Optional ``label_col`` adds the threshold-sweep section;
    optional ``reference_df`` adds a PSI drift row vs that baseline."""
    agg = dashboard_aggregates(df, amount_col, label_col)

    psi_html = ""
    if reference_df is not None:
        scored_ref = score_batch(reference_df, amount_col=amount_col)
        scored_cur = score_batch(df, amount_col=amount_col)
        psi_total = drift.psi(scored_ref, scored_cur, "fraud_score")
        psi_html = (
            f"<h2>Score drift (PSI vs reference window)</h2>"
            f"<p class='stat'>{psi_total:.4f} "
            f"{'&#9888; shift' if psi_total > 0.2 else '(stable)'}</p>"
        )

    bars = [
        (lvl, agg["risk_counts"].get(lvl, 0), RISK_COLORS[lvl]) for lvl in RISK_ORDER
    ]
    sweep_html = ""
    if agg["sweep"]:
        sweep_html = "<h2>Threshold sweep</h2>" + _table(
            agg["sweep"],
            ["threshold", "tp", "fp", "tn", "fn", "precision", "recall", "f1", "cost"],
        )

    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    doc = f"""<!doctype html>
<html><head><meta charset="utf-8"><title>{html.escape(title)}</title>
<style>
body {{ font-family: sans-serif; margin: 2rem; color: #111827; }}
table {{ border-collapse: collapse; margin: .5rem 0; }}
td, th {{ border: 1px solid #d1d5db; padding: .3rem .6rem; font-size: .85rem; }}
.stat {{ font-size: 1.4rem; font-weight: 600; }}
.cards {{ display: flex; gap: 2rem; align-items: center; flex-wrap: wrap; }}
</style></head><body>
<h1>{html.escape(title)}</h1>
<p>generated {stamp} &middot; {agg['n']} events scored</p>
<div class="cards">
  <div>{gauge_svg(agg['mean_score'])}<p>mean score</p></div>
  <div><p class="stat">{agg['n_flagged']}</p><p>flagged (&ge;0.5)</p></div>
  <div><p class="stat">{agg['min_score']:.3f} &ndash; {agg['max_score']:.3f}</p><p>score range</p></div>
</div>
<h2>Risk distribution</h2>
{_bar_chart(bars)}
{sweep_html}
{psi_html}
</body></html>"""
    with open(out_path, "w") as f:
        f.write(doc)
    return out_path
