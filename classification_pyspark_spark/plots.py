"""Driver-side figure rendering over the plot-data aggregates —
closes the reference's E9 *rendering* surface (reference
``eda.py:509-710`` tabbed EDA panels, ``model_eval.py:473-581``
evaluation figures, ``utils.py:84-112`` figure save helper, all
matplotlib) without matplotlib: every figure is a small, dependency-
free SVG string built from an ALREADY-AGGREGATED frame.

Scale posture: rendering never touches data rows. Each figure function
consumes the collected output of a ``queries_plots.py`` /
``queries_ml.py`` aggregate — frames that are bounded by construction
(20 bins, 10 deciles, 3 boxplot columns, 101 thresholds) — so the
collect is parameter-sized and the engine's distributed work stays
exactly the oracle-checked aggregate. The reference instead collects
raw columns to the driver and lets matplotlib bin them; at 100 TB that
collect is the bug, so the split here (cluster aggregates, driver
draws) is the only shape that survives.

Visual rules follow the dataviz ground rules: single-series charts use
one hue (no legend), the multi-class histogram assigns categorical
hues in fixed order with a legend, magnitude heatmaps use one hue
light->dark, marks are thin with a 2px surface gap, grid/axes are
recessive, text wears neutral ink (never the series color), and every
mark carries a native ``<title>`` tooltip.
"""

from __future__ import annotations

import html
import os
from typing import Any, Callable, Iterable

from pyspark.sql import DataFrame, SparkSession

# Validated categorical order (light mode) + neutral ink / grid tokens.
CATEGORICAL = [
    "#2a78d6", "#eb6834", "#1baf7a", "#eda100",
    "#e87ba4", "#008300", "#4a3aa7", "#e34948",
]
SEQ_HUE = "#2a78d6"  # sequential = one hue, light->dark (via opacity on white)
INK = "#262625"
INK_2 = "#6b6a64"
GRID = "#e4e3de"
SURFACE = "#ffffff"

W, H = 640, 360
ML, MR, MT, MB = 56, 16, 34, 40  # margins: left/right/top/bottom


def _esc(s: Any) -> str:
    return html.escape(str(s), quote=True)


class _Fig:
    """Tiny SVG assembly buffer with the shared frame/axis furniture."""

    def __init__(self, title: str):
        self.parts: list[str] = [
            f'<svg xmlns="http://www.w3.org/2000/svg" width="{W}" height="{H}" '
            f'viewBox="0 0 {W} {H}" font-family="system-ui, sans-serif">',
            f'<rect width="{W}" height="{H}" fill="{SURFACE}"/>',
            f'<text x="{ML}" y="20" font-size="14" fill="{INK}">{_esc(title)}</text>',
        ]

    def grid_y(self, ticks: list[float], fmt: Callable[[float], str], lo: float, hi: float):
        for t in ticks:
            y = self.sy(t, lo, hi)
            self.parts.append(
                f'<line x1="{ML}" y1="{y:.1f}" x2="{W - MR}" y2="{y:.1f}" '
                f'stroke="{GRID}" stroke-width="1"/>'
            )
            self.parts.append(
                f'<text x="{ML - 6}" y="{y + 4:.1f}" font-size="10" fill="{INK_2}" '
                f'text-anchor="end">{_esc(fmt(t))}</text>'
            )

    def x_label(self, x: float, label: str):
        self.parts.append(
            f'<text x="{x:.1f}" y="{H - MB + 16}" font-size="10" fill="{INK_2}" '
            f'text-anchor="middle">{_esc(label)}</text>'
        )

    @staticmethod
    def sy(v: float, lo: float, hi: float) -> float:
        span = (hi - lo) or 1.0
        return H - MB - (v - lo) / span * (H - MT - MB)

    @staticmethod
    def sx(v: float, lo: float, hi: float) -> float:
        span = (hi - lo) or 1.0
        return ML + (v - lo) / span * (W - ML - MR)

    def bar(self, x: float, w: float, y: float, color: str, tip: str, opacity: float = 1.0):
        """Thin bar, 4px rounded data-end, anchored to the baseline."""
        y0 = H - MB
        h = max(y0 - y, 0.0)
        r = min(4.0, w / 2, h)
        d = (
            f"M{x:.1f},{y0:.1f} V{y + r:.1f} Q{x:.1f},{y:.1f} {x + r:.1f},{y:.1f} "
            f"H{x + w - r:.1f} Q{x + w:.1f},{y:.1f} {x + w:.1f},{y + r:.1f} "
            f"V{y0:.1f} Z"
        )
        self.parts.append(
            f'<path d="{d}" fill="{color}" fill-opacity="{opacity:.3f}">'
            f"<title>{_esc(tip)}</title></path>"
        )

    def polyline(self, pts: list[tuple[float, float]], color: str, dash: str = ""):
        p = " ".join(f"{x:.1f},{y:.1f}" for x, y in pts)
        extra = f' stroke-dasharray="{dash}"' if dash else ""
        self.parts.append(
            f'<polyline points="{p}" fill="none" stroke="{color}" stroke-width="2"'
            f"{extra}/>"
        )

    def dot(self, x: float, y: float, color: str, tip: str):
        self.parts.append(
            f'<circle cx="{x:.1f}" cy="{y:.1f}" r="4" fill="{color}" stroke="{SURFACE}" '
            f'stroke-width="2"><title>{_esc(tip)}</title></circle>'
        )

    def legend(self, items: list[tuple[str, str]]):
        x = W - MR - 10
        for label, color in reversed(items):
            self.parts.append(
                f'<text x="{x}" y="20" font-size="11" fill="{INK_2}" '
                f'text-anchor="end">{_esc(label)}</text>'
            )
            x -= 7 * len(str(label)) + 6
            self.parts.append(
                f'<rect x="{x - 10}" y="12" width="9" height="9" rx="2" fill="{color}"/>'
            )
            x -= 22

    def svg(self) -> str:
        return "".join(self.parts) + "</svg>"


def _ticks(lo: float, hi: float, n: int = 4) -> list[float]:
    span = (hi - lo) or 1.0
    return [lo + span * i / n for i in range(n + 1)]


def _fmt(v: float) -> str:
    a = abs(v)
    if a >= 1_000_000:
        return f"{v / 1_000_000:.3g}M"
    if a >= 1_000:
        return f"{v / 1_000:.3g}k"
    return f"{v:.3g}"


def render_histogram(
    rows: Iterable[Any], lo_key: str, n_key: str, title: str, hi_key: str | None = None
) -> str:
    """Single-series histogram (residual_distribution,
    histogram_fixed_buckets shapes): one hue, no legend."""
    rs = sorted([r.asDict() if hasattr(r, "asDict") else dict(r) for r in rows],
                key=lambda r: r[lo_key])
    fig = _Fig(title)
    if not rs:
        return fig.svg()
    nmax = max(r[n_key] for r in rs) or 1
    fig.grid_y(_ticks(0, nmax), _fmt, 0, nmax)
    bw = (W - ML - MR) / len(rs)
    for i, r in enumerate(rs):
        x = ML + i * bw
        hi = r[hi_key] if hi_key else None
        rng = f"[{_fmt(r[lo_key])}, {_fmt(hi)})" if hi is not None else _fmt(r[lo_key])
        fig.bar(x + 1, bw - 2, fig.sy(r[n_key], 0, nmax), SEQ_HUE, f"{rng}: n={r[n_key]}")
        if i % max(len(rs) // 6, 1) == 0:
            fig.x_label(x + bw / 2, _fmt(r[lo_key]))
    return fig.svg()


def render_class_histogram(
    rows: Iterable[Any], class_key: str, bin_key: str, frac_key: str, title: str
) -> str:
    """Per-class normalized histogram: categorical hues in FIXED order
    (sorted class label), legend present, 2px gap between grouped bars."""
    rs = [r.asDict() if hasattr(r, "asDict") else dict(r) for r in rows]
    fig = _Fig(title)
    if not rs:
        return fig.svg()
    classes = sorted({r[class_key] for r in rs})
    bins = sorted({r[bin_key] for r in rs})
    fmax = max(r[frac_key] for r in rs) or 1.0
    by = {(r[class_key], r[bin_key]): r[frac_key] for r in rs}
    fig.grid_y(_ticks(0, fmax), lambda v: f"{v:.2f}", 0, fmax)
    gw = (W - ML - MR) / len(bins)
    bw = max((gw - 2) / len(classes), 1.0)
    for bi, b in enumerate(bins):
        for ci, c in enumerate(classes):
            f = by.get((c, b), 0.0)
            x = ML + bi * gw + ci * bw
            fig.bar(
                x + 1, bw - 2, fig.sy(f, 0, fmax),
                CATEGORICAL[ci % len(CATEGORICAL)], f"{c} bin {b}: {f:.4f}",
            )
        if bi % max(len(bins) // 6, 1) == 0:
            fig.x_label(ML + bi * gw + gw / 2, str(b))
    fig.legend([(c, CATEGORICAL[i % len(CATEGORICAL)]) for i, c in enumerate(classes)])
    return fig.svg()


def render_boxplot(rows: Iterable[Any], title: str) -> str:
    """Box-and-whisker per column from the boxplot_stats frame
    (q1/median/q3/whiskers + outlier counts): one hue; the whisker
    caps and median tick are strokes, the IQR box is the fill."""
    rs = sorted([r.asDict() if hasattr(r, "asDict") else dict(r) for r in rows],
                key=lambda r: r["column"])
    fig = _Fig(title)
    if not rs:
        return fig.svg()
    lo = min(r["whisker_low"] for r in rs)
    hi = max(r["whisker_high"] for r in rs)
    fig.grid_y(_ticks(lo, hi), _fmt, lo, hi)
    gw = (W - ML - MR) / len(rs)
    for i, r in enumerate(rs):
        cx = ML + i * gw + gw / 2
        bw2 = min(gw * 0.3, 40.0)
        y_q1, y_q3 = fig.sy(r["q1"], lo, hi), fig.sy(r["q3"], lo, hi)
        y_wl, y_wh = fig.sy(r["whisker_low"], lo, hi), fig.sy(r["whisker_high"], lo, hi)
        y_med = fig.sy(r["median"], lo, hi)
        tip = (
            f"{r['column']}: q1={_fmt(r['q1'])} med={_fmt(r['median'])} "
            f"q3={_fmt(r['q3'])} outliers {r['n_outlier_low']}/{r['n_outlier_high']}"
        )
        fig.parts.append(
            f'<line x1="{cx:.1f}" y1="{y_wl:.1f}" x2="{cx:.1f}" y2="{y_wh:.1f}" '
            f'stroke="{INK_2}" stroke-width="1"/>'
        )
        for yw in (y_wl, y_wh):
            fig.parts.append(
                f'<line x1="{cx - bw2 / 2:.1f}" y1="{yw:.1f}" x2="{cx + bw2 / 2:.1f}" '
                f'y2="{yw:.1f}" stroke="{INK_2}" stroke-width="1"/>'
            )
        fig.parts.append(
            f'<rect x="{cx - bw2:.1f}" y="{y_q3:.1f}" width="{2 * bw2:.1f}" '
            f'height="{max(y_q1 - y_q3, 1):.1f}" rx="2" fill="{SEQ_HUE}" '
            f'fill-opacity="0.25" stroke="{SEQ_HUE}" stroke-width="1.5">'
            f"<title>{_esc(tip)}</title></rect>"
        )
        fig.parts.append(
            f'<line x1="{cx - bw2:.1f}" y1="{y_med:.1f}" x2="{cx + bw2:.1f}" '
            f'y2="{y_med:.1f}" stroke="{SEQ_HUE}" stroke-width="2"/>'
        )
        fig.x_label(cx, r["column"])
    return fig.svg()


def render_line(
    pts: list[tuple[float, float, str]],
    title: str,
    x_name: str,
    y_name: str,
    diagonal: bool = False,
    x_range: tuple[float, float] = (0.0, 1.0),
    y_range: tuple[float, float] = (0.0, 1.0),
) -> str:
    """Single-series line (calibration curve, ROC, cumulative gain):
    2px line, >=8px markers ringed with the surface, optional gray
    dashed reference diagonal."""
    fig = _Fig(title)
    xlo, xhi = x_range
    ylo, yhi = y_range
    fig.grid_y(_ticks(ylo, yhi), _fmt, ylo, yhi)
    for t in _ticks(xlo, xhi):
        fig.x_label(fig.sx(t, xlo, xhi), _fmt(t))
    if diagonal:
        fig.polyline(
            [(fig.sx(xlo, xlo, xhi), fig.sy(ylo, ylo, yhi)),
             (fig.sx(xhi, xlo, xhi), fig.sy(yhi, ylo, yhi))],
            INK_2, dash="4 4",
        )
    coords = [(fig.sx(x, xlo, xhi), fig.sy(y, ylo, yhi)) for x, y, _ in pts]
    if coords:
        fig.polyline(coords, SEQ_HUE)
        for (cx, cy), (_, _, tip) in zip(coords, pts):
            fig.dot(cx, cy, SEQ_HUE, tip)
    fig.parts.append(
        f'<text x="{(ML + W - MR) / 2}" y="{H - 6}" font-size="11" fill="{INK_2}" '
        f'text-anchor="middle">{_esc(x_name)} vs {_esc(y_name)}</text>'
    )
    return fig.svg()


def render_heatmap(
    rows: Iterable[Any], x_key: str, y_key: str, v_key: str, title: str
) -> str:
    """2-D binned scatter (pred_vs_actual): sequential single hue,
    light->dark with magnitude, 2px surface gap between cells."""
    rs = [r.asDict() if hasattr(r, "asDict") else dict(r) for r in rows]
    fig = _Fig(title)
    if not rs:
        return fig.svg()
    xs = sorted({r[x_key] for r in rs})
    ys = sorted({r[y_key] for r in rs})
    vmax = max(r[v_key] for r in rs) or 1
    cw = (W - ML - MR) / (max(xs) + 1)
    ch = (H - MT - MB) / (max(ys) + 1)
    for r in rs:
        x = ML + r[x_key] * cw
        y = H - MB - (r[y_key] + 1) * ch
        op = 0.15 + 0.85 * (r[v_key] / vmax)
        fig.parts.append(
            f'<rect x="{x + 1:.1f}" y="{y + 1:.1f}" width="{max(cw - 2, 1):.1f}" '
            f'height="{max(ch - 2, 1):.1f}" rx="2" fill="{SEQ_HUE}" '
            f'fill-opacity="{op:.3f}">'
            f"<title>({r[x_key]}, {r[y_key]}): {r[v_key]}</title></rect>"
        )
    for t in xs[:: max(len(xs) // 6, 1)]:
        fig.x_label(ML + t * cw + cw / 2, str(t))
    for t in ys[:: max(len(ys) // 5, 1)]:
        yy = H - MB - (t + 0.5) * ch
        fig.parts.append(
            f'<text x="{ML - 6}" y="{yy + 4:.1f}" font-size="10" fill="{INK_2}" '
            f'text-anchor="end">{t}</text>'
        )
    return fig.svg()


# ---------------------------------------------------------------------------
# Suite driver: one figure per oracle-checked plot family.
# ---------------------------------------------------------------------------
def render_plot_suite(spark: SparkSession, sf_dir: str, out_dir: str) -> dict[str, str]:
    """Run every plot-data aggregate query and render one SVG per
    family into ``out_dir`` (parity surface for the reference's
    ``generate_eda_report`` / evaluation figure batch). Returns
    {figure_name: path}. Collects only the bounded aggregate frames."""
    from .queries import QUERIES

    os.makedirs(out_dir, exist_ok=True)

    def rows(name: str) -> list[Any]:
        return QUERIES[name](spark, sf_dir).collect()

    figures: dict[str, str] = {}

    def put(name: str, svg: str) -> None:
        path = os.path.join(out_dir, f"{name}.svg")
        with open(path, "w") as f:
            f.write(svg)
        figures[name] = path

    put(
        "residual_distribution",
        render_histogram(
            rows("residual_distribution"), "bin_lo", "n",
            "Residual distribution", hi_key="bin_hi",
        ),
    )
    put(
        "histogram_fixed_buckets",
        render_histogram(
            rows("histogram_fixed_buckets"), "min_v", "n",
            "Order totalprice histogram",
        ),
    )
    put(
        "class_density_histogram",
        render_class_histogram(
            rows("class_density_histogram"), "class", "bin", "frac",
            "Order totalprice density by priority class",
        ),
    )
    put("boxplot_stats_lineitem",
        render_boxplot(rows("boxplot_stats_lineitem"), "Lineitem measures"))
    cal = sorted(rows("calibration_curve"), key=lambda r: r["mean_predicted"])
    put(
        "calibration_curve",
        render_line(
            [(r["mean_predicted"], r["frac_positive"],
              f"bin {r['bin']}: pred {r['mean_predicted']:.3f} obs {r['frac_positive']:.3f}")
             for r in cal],
            "Calibration", "mean predicted", "fraction positive", diagonal=True,
        ),
    )
    roc = sorted(rows("threshold_sweep"), key=lambda r: (r["fpr"], r["recall"]))
    put(
        "roc_curve",
        render_line(
            [(r["fpr"], r["recall"], f"t={r['threshold']:.2f}")
             for r in roc],
            "ROC", "false positive rate", "recall", diagonal=True,
        ),
    )
    gain = sorted(rows("lift_gain_table"), key=lambda r: r["decile"])
    put(
        "cumulative_gain",
        render_line(
            [(r["decile"] / 10.0, r["gain"],
              f"decile {r['decile']}: gain {r['gain']:.3f} lift {r['lift']:.2f}")
             for r in gain],
            "Cumulative gain", "population fraction", "gain", diagonal=True,
        ),
    )
    put(
        "pred_vs_actual",
        render_heatmap(
            rows("pred_vs_actual_binned"), "yhat_bin", "y_bin", "n",
            "Predicted vs actual (binned)",
        ),
    )
    return figures
