"""PIE-Bench harness: mapping-file handling, selection, results artifacts.

The reference embeds these helpers inline in its CLI scripts (L4 in
SURVEY.md §1: ``load_mapping_file`` run_batch.py:18-22 / evaluate.py:18-22,
``safe_join`` run_batch.py:25-41, entry filtering run_batch.py:114-144,
aggregation evaluate.py:159-175,202-267).  Here they are one shared module;
the artifact formats (metrics.csv columns, summary.json schema) are kept
byte-compatible so results/ directories are directly comparable.
"""

from __future__ import annotations

import csv
import json
import os
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

METRIC_NAMES = ("ssim", "lpips", "clip_score", "psnr", "mse", "dino_distance")
CSV_FIELDS = (
    "image_id",
    "image_path",
    "editing_type_id",
    "editing_prompt",
) + METRIC_NAMES


def load_mapping(mapping_path: str) -> Dict[str, dict]:
    """Load a PIE-Bench mapping_file.json: {image_id: {image_path,
    editing_prompt, editing_type_id, ...}}."""
    with open(mapping_path, "r") as f:
        return json.load(f)


def safe_join(base_dir: str, user_path: str) -> str:
    """Join a dataset-relative path onto base_dir, rejecting traversal."""
    norm = os.path.normpath(user_path)
    if os.path.isabs(norm) or norm.startswith(".."):
        raise ValueError(f"Invalid path: {user_path}")
    full = os.path.abspath(os.path.join(base_dir, norm))
    if not full.startswith(os.path.abspath(base_dir)):
        raise ValueError(f"Path traversal detected: {user_path}")
    return full


def select_entries(
    mapping: Dict[str, dict],
    image_ids: Optional[Sequence[str]] = None,
    editing_types: Optional[Sequence[str]] = None,
    num_images: Optional[int] = None,
) -> List[Tuple[str, dict]]:
    """Filter mapping entries by explicit ids, else by editing type + count."""
    if image_ids:
        return [(i, mapping[i]) for i in image_ids if i in mapping]
    if editing_types:
        selected = [
            (i, e)
            for i, e in mapping.items()
            if e.get("editing_type_id") in set(editing_types)
        ]
    else:
        selected = list(mapping.items())
    if num_images is not None and num_images < len(selected):
        selected = selected[:num_images]
    return selected


def write_metrics_csv(path: str, rows: Iterable[dict]) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=list(CSV_FIELDS))
        writer.writeheader()
        writer.writerows(rows)


def _stats(values: Sequence[float], with_median: bool) -> dict:
    out = {"mean": float(np.mean(values)), "std": float(np.std(values))}
    if with_median:
        out["median"] = float(np.median(values))
    return out


def summarize(rows: Sequence[dict]) -> dict:
    """summary.json schema: total_images + overall mean/std/median + per
    editing-type-category mean/std (+count) — identical to the reference's
    evaluate.py:202-272 output."""
    summary = {
        "total_images": len(rows),
        "overall": {
            m: _stats([r[m] for r in rows], with_median=True) for m in METRIC_NAMES
        },
        "by_category": {},
    }
    categories: Dict[str, List[dict]] = {}
    for r in rows:
        categories.setdefault(str(r["editing_type_id"]), []).append(r)
    for cat, cat_rows in categories.items():
        summary["by_category"][cat] = {
            "count": len(cat_rows),
            **{
                m: _stats([r[m] for r in cat_rows], with_median=False)
                for m in METRIC_NAMES
            },
        }
    return summary


def write_summary(path: str, summary: dict) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(summary, f, indent=2)


def model_suffix(model: str, full_precision: bool) -> str:
    """Output-directory naming shared by all CLIs: {model}_{fp16|fp32}.

    (bf16 on TPU fills the reference's "fp16" slot; the artifact naming is
    kept identical for comparability.)
    """
    return f"{model}_{'fp32' if full_precision else 'fp16'}"


def detect_model_suffix(outputs_dir: str) -> Optional[str]:
    """Recover '{model}_{precision}' from an outputs dir path tail."""
    tail = os.path.basename(outputs_dir.rstrip("/"))
    parts = tail.rsplit("_", 1)
    if len(parts) == 2 and parts[1] in ("fp16", "fp32"):
        return tail
    return None


def save_comparison(
    path: str, source, edited, model: str, prompt: str
) -> None:
    """Two-panel source/edited PNG (matplotlib), reference layout."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig, axes = plt.subplots(1, 2, figsize=(12, 6))
    axes[0].imshow(source)
    axes[0].set_title("Source Image")
    axes[0].axis("off")
    short = prompt if len(prompt) <= 60 else prompt[:60] + "..."
    axes[1].imshow(edited)
    axes[1].set_title(f'Edited ({model.upper()})\n"{short}"')
    axes[1].axis("off")
    plt.tight_layout()
    plt.savefig(path, dpi=150, bbox_inches="tight")
    plt.close(fig)
