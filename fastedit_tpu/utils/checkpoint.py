"""Checkpoint I/O: flat-key safetensors + dataclass config JSON per module.

Layout written by tools/convert_checkpoint.py and read by the pipeline:

    <ckpt_dir>/
      meta.json                         {"model_name", "precision", ...}
      unet/        config.json weights.safetensors
      controlnet/  config.json weights.safetensors
      vae/         config.json weights.safetensors
      text_encoder/   config.json weights.safetensors
      text_encoder_2/ config.json weights.safetensors
      tokenizer/   vocab.json merges.txt
      tokenizer_2/ vocab.json merges.txt

Weights are stored flat ("a/b/c" keys) in bf16 or fp32 numpy (bf16 via
ml_dtypes, which safetensors' numpy backend round-trips).  This replaces the
reference's HF-Hub auto-download path (SURVEY.md §5 checkpoint row).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from safetensors.numpy import load_file, save_file


def flatten(tree: Dict[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_params(path: str, params: Dict[str, Any], dtype=None) -> None:
    """Save a (possibly nested) param tree to ``<path>/weights.safetensors``."""
    os.makedirs(path, exist_ok=True)
    flat = flatten(params)
    # The installed safetensors serializes the raw base buffer
    # (data_ptr + nbytes) WITHOUT checking contiguity, so an F-ordered or
    # transposed array round-trips silently corrupted.  astype's default
    # order='K' PRESERVES F-order, so both branches must force C layout.
    # (hf_mapping independently ascontiguousarray's its transposes; this
    # guards every other save_params caller.)
    if dtype is not None:
        flat = {k: np.asarray(v).astype(dtype, order="C") for k, v in flat.items()}
    else:
        flat = {k: np.ascontiguousarray(v) for k, v in flat.items()}
    save_file(flat, os.path.join(path, "weights.safetensors"))


def load_params(path: str, dtype=None) -> Dict[str, Any]:
    flat = load_file(os.path.join(path, "weights.safetensors"))
    if dtype is not None:
        flat = {k: v.astype(dtype) for k, v in flat.items()}
    return unflatten(flat)


def save_config(path: str, config: Any) -> None:
    os.makedirs(path, exist_ok=True)
    d = dataclasses.asdict(config)
    d["__class__"] = type(config).__name__
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(d, f, indent=2)


def load_config(path: str, cls) -> Any:
    with open(os.path.join(path, "config.json")) as f:
        d = json.load(f)
    d.pop("__class__", None)

    def tupleize(x):
        return tuple(tupleize(e) for e in x) if isinstance(x, list) else x

    # Resolve the REAL field classes: configs.py uses `from __future__
    # import annotations`, so dataclasses.fields(...)[i].type is the string
    # "UNetConfig", never a class — an is_dataclass() test on it is always
    # False.  get_type_hints evaluates the strings in the defining module's
    # namespace, so nested config dataclasses (ControlNetConfig.unet today,
    # any added later) dispatch on their actual class.
    import typing

    hints = typing.get_type_hints(cls)
    field_names = {f.name for f in dataclasses.fields(cls)}
    kwargs = {}
    for k, v in d.items():
        if k not in field_names:
            continue
        v = tupleize(v)
        hint = hints.get(k)
        if dataclasses.is_dataclass(hint) and isinstance(d[k], dict):
            v = hint(**{kk: tupleize(vv) for kk, vv in d[k].items()})
        kwargs[k] = v
    return cls(**kwargs)


def tree_size_bytes(params: Dict[str, Any]) -> int:
    return sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(params)
    )


def cast_tree(params, dtype):
    return jax.tree.map(lambda x: jnp.asarray(x, dtype=dtype), params)
