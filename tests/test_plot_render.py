"""Headless smoke tests for the SVG render layer (reference E9
rendering parity: eda.py:509-710 / model_eval.py:473-581 figures —
here rendered dependency-free from the oracle-checked aggregates)."""

from __future__ import annotations

import xml.etree.ElementTree as ET

SVG = "{http://www.w3.org/2000/svg}"


def _parsed(svg: str) -> ET.Element:
    root = ET.fromstring(svg)
    assert root.tag == f"{SVG}svg"
    return root


def _count(root: ET.Element, tag: str) -> int:
    return len(root.findall(f".//{SVG}{tag}"))


def test_histogram_geometry_and_tooltips():
    from classification_pyspark_spark.plots import ML, MR, W, render_histogram

    rows = [
        {"bin_lo": 0.0, "bin_hi": 10.0, "n": 5},
        {"bin_lo": 10.0, "bin_hi": 20.0, "n": 9},
        {"bin_lo": 20.0, "bin_hi": 30.0, "n": 1},
    ]
    root = _parsed(render_histogram(rows, "bin_lo", "n", "t", hi_key="bin_hi"))
    bars = root.findall(f".//{SVG}path")
    assert len(bars) == 3
    # every bar carries a native tooltip and stays inside the viewport
    for b in bars:
        assert b.find(f"{SVG}title") is not None
        x = float(b.get("d").split(",")[0][1:])
        assert ML <= x <= W - MR


def test_class_histogram_fixed_order_legend():
    from classification_pyspark_spark.plots import CATEGORICAL, render_class_histogram

    rows = [
        {"class": c, "bin": b, "frac": 0.1 * (b + 1)}
        for c in ("URGENT", "LOW", "HIGH")
        for b in range(4)
    ]
    svg = render_class_histogram(rows, "class", "bin", "frac", "t")
    root = _parsed(svg)
    assert _count(root, "path") == 12
    # legend present (>= 2 series) and hue follows the SORTED class
    # order (fixed assignment, never cycled by arrival order)
    texts = [t.text for t in root.findall(f".//{SVG}text")]
    for c in ("HIGH", "LOW", "URGENT"):
        assert c in texts
    assert CATEGORICAL[0] in svg and CATEGORICAL[2] in svg


def test_line_and_heatmap_render():
    from classification_pyspark_spark.plots import render_heatmap, render_line

    root = _parsed(
        render_line([(0.1, 0.2, "a"), (0.5, 0.9, "b")], "t", "x", "y", diagonal=True)
    )
    assert _count(root, "polyline") == 2  # diagonal + series
    assert _count(root, "circle") == 2

    rows = [{"x": 0, "y": 0, "n": 1}, {"x": 1, "y": 1, "n": 9}]
    root = _parsed(render_heatmap(rows, "x", "y", "n", "t"))
    cells = [
        r for r in root.findall(f".//{SVG}rect") if r.find(f"{SVG}title") is not None
    ]
    assert len(cells) == 2
    ops = sorted(float(c.get("fill-opacity")) for c in cells)
    assert ops[0] < ops[1]  # magnitude -> darker (sequential, one hue)


def test_render_plot_suite_end_to_end(spark, sf_dir, tmp_path):
    from classification_pyspark_spark.plots import render_plot_suite

    figures = render_plot_suite(spark, sf_dir, str(tmp_path / "figs"))
    assert set(figures) == {
        "residual_distribution", "histogram_fixed_buckets",
        "class_density_histogram", "boxplot_stats_lineitem",
        "calibration_curve", "roc_curve", "cumulative_gain", "pred_vs_actual",
    }
    for name, path in figures.items():
        with open(path) as f:
            root = _parsed(f.read())
        marks = sum(_count(root, t) for t in ("path", "rect", "circle", "polyline"))
        assert marks > 1, name  # more than the surface rect: real marks drawn
