"""The SHIPPED demo artifacts under examples/tiny_results stay valid.

examples/tiny_results is the in-repo analogue of the reference's shipped
``results/`` + ``figures/`` trees (reference ships 4x700-row metrics.csv
+ summary.json and 17 comparison_*.png; see examples/tiny_results/README).
These artifacts are committed files, so nothing regenerates them on each
run — this fast, always-on test guards against schema bitrot: if the
evaluator or plotter schemas evolve, the shipped artifacts must be
regenerated (``run_benchmark.sh tiny``), not left stale.
"""

import csv
import json
import math
import os

SHIPPED = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "examples", "tiny_results",
)

METRICS = ["ssim", "lpips", "clip_score", "psnr", "mse", "dino_distance"]
EXPECTED_COLUMNS = [
    "image_id", "image_path", "editing_type_id", "editing_prompt",
] + METRICS


def _rows():
    with open(os.path.join(SHIPPED, "metrics.csv")) as f:
        return list(csv.DictReader(f))


def test_metrics_csv_schema_and_values():
    rows = _rows()
    assert len(rows) >= 3
    assert list(rows[0].keys()) == EXPECTED_COLUMNS
    for row in rows:
        for m in METRICS:
            v = float(row[m])  # numeric and parseable
            assert math.isfinite(v), (row["image_id"], m, v)


def test_summary_json_matches_metrics_csv():
    rows = _rows()
    with open(os.path.join(SHIPPED, "summary.json")) as f:
        summary = json.load(f)
    assert summary["total_images"] == len(rows)
    for m in METRICS:
        vals = [float(r[m]) for r in rows]
        mean = sum(vals) / len(vals)
        got = summary["overall"][m]
        assert set(got) >= {"mean", "std", "median"}
        assert abs(got["mean"] - mean) < 1e-6 + 1e-4 * abs(mean), m
    assert summary["by_category"]  # per-editing-type aggregation present


def test_comparison_figures_are_pngs():
    pngs = [p for p in os.listdir(SHIPPED) if p.endswith(".png")]
    assert len(pngs) >= 3
    for p in pngs:
        assert p.startswith("comparison_")
        with open(os.path.join(SHIPPED, p), "rb") as f:
            assert f.read(8) == b"\x89PNG\r\n\x1a\n", p
