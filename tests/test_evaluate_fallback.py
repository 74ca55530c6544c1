"""Batched evaluation must isolate failures per image, not per chunk.

The reference skips exactly the missing/broken pair (evaluate.py:113-119);
round-3 verdict Weak #4: our batched path dropped the whole chunk on one bad
image.  One corrupt file in a batch must cost exactly one row.
"""

import csv
import json
import os
import sys

import numpy as np
from PIL import Image

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import evaluate as evaluate_cli  # noqa: E402


def _save(path, seed):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.default_rng(seed)
    Image.fromarray(
        rng.integers(0, 255, (64, 64, 3), dtype=np.uint8), "RGB"
    ).save(path)


def test_batched_eval_per_image_fallback(tmp_path):
    n = 8
    src = tmp_path / "src"
    out = tmp_path / "out"
    mapping = {}
    for i in range(n):
        rel = f"0/img_{i}.jpg"
        _save(str(src / rel), seed=i)
        _save(str(out / rel), seed=100 + i)
        mapping[f"id{i}"] = {
            "image_path": rel,
            "editing_prompt": f"prompt {i}",
            "editing_type_id": "0",
        }
    # Corrupt one EDITED file: it exists (so it is not pre-skipped by the
    # pairing scan) but cannot be decoded.
    (out / "0/img_3.jpg").write_bytes(b"this is not a jpeg")
    (tmp_path / "mapping.json").write_text(json.dumps(mapping))

    rc = evaluate_cli.main(
        [
            "--mapping_file", str(tmp_path / "mapping.json"),
            "--source_dir", str(src),
            "--outputs_dir", str(out),
            "--results_file", str(tmp_path / "metrics.csv"),
            "--summary_file", str(tmp_path / "summary.json"),
            "--device", "cpu",
            "--tiny_metrics",
            "--batch_size", str(n),  # the whole set is ONE metric batch
        ]
    )
    assert rc == 0
    with open(tmp_path / "metrics.csv") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == n - 1, "one corrupt image must cost exactly one row"
    assert all(r["image_id"] != "id3" for r in rows)
    summary = json.loads((tmp_path / "summary.json").read_text())
    assert summary["total_images"] == n - 1
