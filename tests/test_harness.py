"""PIE-Bench harness tests: path safety, selection, artifact schemas."""

import json
import os

import numpy as np
import pytest

from fastedit_tpu import harness


def test_safe_join_accepts_normal_paths(tmp_path):
    out = harness.safe_join(str(tmp_path), "cat/img.jpg")
    assert out == os.path.join(str(tmp_path), "cat", "img.jpg")


@pytest.mark.parametrize(
    "bad", ["../x.jpg", "/etc/passwd", "a/../../x.jpg", ".."]
)
def test_safe_join_rejects_traversal(tmp_path, bad):
    with pytest.raises(ValueError):
        harness.safe_join(str(tmp_path), bad)


MAPPING = {
    "a": {"image_path": "1.jpg", "editing_type_id": "0", "editing_prompt": "x"},
    "b": {"image_path": "2.jpg", "editing_type_id": "1", "editing_prompt": "y"},
    "c": {"image_path": "3.jpg", "editing_type_id": "0", "editing_prompt": "z"},
}


def test_select_by_ids():
    sel = harness.select_entries(MAPPING, image_ids=["c", "a", "nope"])
    assert [i for i, _ in sel] == ["c", "a"]


def test_select_by_type_and_count():
    sel = harness.select_entries(MAPPING, editing_types=["0"])
    assert [i for i, _ in sel] == ["a", "c"]
    sel = harness.select_entries(MAPPING, num_images=2)
    assert len(sel) == 2


def _rows():
    rng = np.random.default_rng(0)
    rows = []
    for i, (iid, e) in enumerate(MAPPING.items()):
        rows.append(
            {
                "image_id": iid,
                "image_path": e["image_path"],
                "editing_type_id": e["editing_type_id"],
                "editing_prompt": e["editing_prompt"],
                **{m: float(rng.uniform()) for m in harness.METRIC_NAMES},
            }
        )
    return rows


def test_summary_schema_matches_reference():
    s = harness.summarize(_rows())
    assert s["total_images"] == 3
    for m in harness.METRIC_NAMES:
        assert set(s["overall"][m]) == {"mean", "std", "median"}
    assert set(s["by_category"]) == {"0", "1"}
    cat = s["by_category"]["0"]
    assert cat["count"] == 2
    for m in harness.METRIC_NAMES:
        assert set(cat[m]) == {"mean", "std"}


def test_csv_roundtrip(tmp_path):
    import csv

    path = str(tmp_path / "metrics.csv")
    harness.write_metrics_csv(path, _rows())
    with open(path) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 3
    assert list(rows[0].keys()) == list(harness.CSV_FIELDS)


def test_detect_model_suffix():
    assert harness.detect_model_suffix("outputs/batch/edited/sdxl_fp16") == "sdxl_fp16"
    assert harness.detect_model_suffix("outputs/batch/edited/ssd-1b_fp32/") == "ssd-1b_fp32"
    assert harness.detect_model_suffix("outputs/whatever") is None


def test_model_suffix():
    assert harness.model_suffix("sdxl", True) == "sdxl_fp32"
    assert harness.model_suffix("ssd-1b", False) == "ssd-1b_fp16"
