"""Figure-generation parity: exact all-vs-subset filename scheme
(reference plotting/compare_methods.py:104-113), Agg backend."""

import json
import os
import sys

import numpy as np
from PIL import Image

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "plotting"))

import compare_methods  # noqa: E402


def _save(path, seed, size=48):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.default_rng(seed)
    Image.fromarray(
        rng.integers(0, 255, (size, size, 3), dtype=np.uint8), "RGB"
    ).save(path)


def _tree(tmp_path):
    image_id = "000000000042"
    rel = "0/random/042.jpg"
    _save(str(tmp_path / "src" / rel), 1)
    for m, s in [("ssd-1b_fp16", 2), ("sdxl_fp16", 3), ("tiny_fp16", 4)]:
        _save(str(tmp_path / "out" / m / rel), s)
    (tmp_path / "mapping.json").write_text(
        json.dumps({image_id: {"image_path": rel, "editing_prompt": "a cat"}})
    )
    return image_id


def _args(tmp_path, image_id, methods=None):
    argv = [
        "--image_id", image_id,
        "--mapping_file", str(tmp_path / "mapping.json"),
        "--source_dir", str(tmp_path / "src"),
        "--outputs_dir", str(tmp_path / "out"),
        "--figures_dir", str(tmp_path / "figures"),
    ]
    if methods:
        argv += ["--methods", *methods]
    return compare_methods.build_parser().parse_args(argv)


def test_comparison_all_filename(tmp_path):
    image_id = _tree(tmp_path)
    out = compare_methods.plot_comparison(_args(tmp_path, image_id))
    assert out == str(tmp_path / "figures" / f"comparison_all_{image_id}.png")
    assert os.path.getsize(out) > 0


def test_comparison_subset_filename(tmp_path):
    image_id = _tree(tmp_path)
    out = compare_methods.plot_comparison(
        _args(tmp_path, image_id, methods=["ssd-1b_fp16", "sdxl_fp16"])
    )
    assert out == str(
        tmp_path
        / "figures"
        / f"comparison_ssd-1b_fp16_vs_sdxl_fp16_{image_id}.png"
    )
    assert os.path.getsize(out) > 0


def test_comparison_subset_of_three_uses_all_name(tmp_path):
    """Reference semantics: the <m1>_vs_<m2> form is only for exactly two
    found methods; otherwise the all-form name is used."""
    image_id = _tree(tmp_path)
    out = compare_methods.plot_comparison(
        _args(tmp_path, image_id, methods=["ssd-1b_fp16", "sdxl_fp16", "tiny_fp16"])
    )
    assert out == str(tmp_path / "figures" / f"comparison_all_{image_id}.png")


def test_missing_everything_fails_cleanly(tmp_path):
    image_id = _tree(tmp_path)
    args = _args(tmp_path, image_id, methods=["sdxl_fp32"])  # no such output
    assert compare_methods.plot_comparison(args) is None
