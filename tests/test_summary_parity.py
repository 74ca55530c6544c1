"""Aggregation parity against the reference's SHIPPED benchmark artifacts.

The reference ships four 700-row ``results/*/metrics.csv`` files together
with the ``summary.json`` its evaluate.py (reference evaluate.py:202-272)
derived from them.  That pairing is a free, weight-independent golden test
of our whole summary stage: feed the shipped per-image rows through
``harness.summarize`` and the output must reproduce the shipped summary —
same key structure (overall mean/std/median, per-category count/mean/std)
and the same float values.

This closes the aggregation half of SURVEY.md §4's "shipped metrics.csv
rows are free golden values" strategy without needing model weights; the
per-image metric values themselves are covered by tests/test_metrics.py
(math goldens) and the weight-blocked bring-up parity gate.
"""

import csv
import json
import os

import pytest

from fastedit_tpu import harness

_REF_RESULTS = "/root/reference/results"
_CONFIGS = ["sdxl_fp32", "sdxl_fp16", "ssd-1b_fp32", "ssd-1b_fp16"]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(_REF_RESULTS),
    reason="reference shipped results not present on this machine",
)


def _load_rows(cfg: str):
    with open(os.path.join(_REF_RESULTS, cfg, "metrics.csv")) as f:
        rows = list(csv.DictReader(f))
    for r in rows:
        for m in harness.METRIC_NAMES:
            r[m] = float(r[m])
    return rows


def _assert_same(ours, ref, path=""):
    assert isinstance(ours, dict) == isinstance(ref, dict), path
    if isinstance(ours, dict):
        assert set(ours) == set(ref), (path, set(ours) ^ set(ref))
        for k in ours:
            _assert_same(ours[k], ref[k], f"{path}.{k}")
    elif isinstance(ours, float):
        assert ours == pytest.approx(ref, rel=1e-9, abs=1e-12), (path, ours, ref)
    else:
        assert ours == ref, (path, ours, ref)


@pytest.mark.parametrize("cfg", _CONFIGS)
def test_summarize_reproduces_shipped_summary(cfg):
    rows = _load_rows(cfg)
    ref = json.load(open(os.path.join(_REF_RESULTS, cfg, "summary.json")))
    ours = harness.summarize(rows)
    assert ours["total_images"] == ref["total_images"] == 700
    _assert_same(ours, ref)


@pytest.mark.parametrize("cfg", ["ssd-1b_fp16"])
def test_csv_roundtrip_preserves_shipped_rows(cfg, tmp_path):
    """write_metrics_csv emits the reference's exact column set and survives
    a parse round trip (schema pinned at harness.CSV_FIELDS)."""
    rows = _load_rows(cfg)
    out = tmp_path / "metrics.csv"
    harness.write_metrics_csv(str(out), rows)
    with open(os.path.join(_REF_RESULTS, cfg, "metrics.csv")) as f:
        ref_header = f.readline().strip()
    with open(out) as f:
        our_header = f.readline().strip()
        reread = list(csv.DictReader(f, fieldnames=ref_header.split(",")))
    assert our_header == ref_header
    assert len(reread) == len(rows)
    for a, b in zip(reread[:5], rows[:5]):
        assert a["image_id"] == b["image_id"]
        for m in harness.METRIC_NAMES:
            assert float(a[m]) == pytest.approx(b[m], rel=1e-12)
