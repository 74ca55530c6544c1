"""Tensor parallelism over the ``model`` mesh axis (parallel/tp.py).

The full edit under a (data=4, model=2) mesh must reproduce the
single-device result: GSPMD inserts the Megatron all-reduces implied by the
param shardings, so any wrong spec shows up as a numeric mismatch, not a
shape error.  TP exists as the memory knob for the reference's fp32 SDXL
config (22.7 GB > one 16 GB chip); tests run the tiny topology.
"""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from fastedit_tpu.ops import flags
from fastedit_tpu.parallel import tp as tp_lib
from fastedit_tpu.parallel.mesh import MODEL_AXIS, make_mesh


def _img(seed=0):
    from PIL import Image

    rng = np.random.default_rng(seed)
    return Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))


def _assert_images_close(a, b, frac=0.05, tol=5, mean_tol=2.0):
    da = np.asarray(a, dtype=np.int32)
    db = np.asarray(b, dtype=np.int32)
    diff = np.abs(da - db)
    assert float(np.mean(diff)) < mean_tol, f"mean diff {np.mean(diff)}"
    assert float(np.mean(diff > tol)) < frac


def test_tp_specs_rank_aware():
    """Scanned stacks carry a leading depth dim; specs follow the rank."""

    class K:  # fake path key
        def __init__(self, key):
            self.key = key

    k3 = jax.ShapeDtypeStruct((2, 128, 128), np.float32)
    k2 = jax.ShapeDtypeStruct((128, 512), np.float32)
    b2 = jax.ShapeDtypeStruct((2, 1024), np.float32)
    assert tp_lib.tp_spec([K("attn1"), K("to_q"), K("kernel")], k3, 2) == P(
        None, None, MODEL_AXIS
    )
    assert tp_lib.tp_spec([K("ff"), K("net_0_proj"), K("kernel")], k2, 2) == P(
        None, MODEL_AXIS
    )
    assert tp_lib.tp_spec([K("ff"), K("net_0_proj"), K("bias")], b2, 2) == P(
        None, MODEL_AXIS
    )
    assert tp_lib.tp_spec([K("attn1"), K("to_out"), K("kernel")], k3, 2) == P(
        None, MODEL_AXIS, None
    )
    # row-parallel bias stays replicated (added once, after the all-reduce)
    assert tp_lib.tp_spec([K("attn1"), K("to_out"), K("bias")], b2, 2) == P()
    # non-divisible dims fall back to replicated
    odd = jax.ShapeDtypeStruct((2, 128, 129), np.float32)
    assert tp_lib.tp_spec([K("attn1"), K("to_q"), K("kernel")], odd, 2) == P()
    # everything else replicated
    assert tp_lib.tp_spec([K("conv1"), K("kernel")], k2, 2) == P()


def test_tp_edit_matches_single_device(tiny_editor_f32):
    editor = tiny_editor_f32
    imgs = [_img(i) for i in range(4)]
    prompts = [f"object {i}" for i in range(4)]
    ref = editor.edit_batch(imgs, prompts, seed=11)

    saved = {
        attr: getattr(editor.modules, attr)
        for attr in (
            "unet_params",
            "controlnet_params",
            "vae_params",
            "text_encoder_params",
            "text_encoder_2_params",
        )
    }
    try:
        with flags.override():  # restores the TP-pinned kernel flags
            mesh = editor.enable_data_parallel(
                make_mesh(model_parallel=2), model_parallel=2
            )
            assert dict(mesh.shape) == {"data": 4, "model": 2}
            # the transformer matmuls actually got split
            shardings = jax.tree.leaves(
                jax.tree.map(lambda x: x.sharding, editor.modules.unet_params)
            )
            assert any(
                MODEL_AXIS in jax.tree.leaves(tuple(ns.spec))
                for ns in shardings
            ), {str(ns.spec) for ns in shardings}
            out = editor.edit_batch(imgs, prompts, seed=11)
    finally:
        editor.mesh = None
        dev0 = jax.devices()[0]
        for attr, val in saved.items():
            setattr(
                editor.modules,
                attr,
                jax.device_put(val, dev0) if val is not None else None,
            )
        editor._rebuild_stages()
        editor._prompt_cache = {}
    for a, b in zip(ref, out):
        _assert_images_close(a, b)


def test_make_mesh_model_axis():
    mesh = make_mesh(model_parallel=4)
    assert dict(mesh.shape) == {"data": 2, "model": 4}
    with pytest.raises(AssertionError):
        make_mesh(model_parallel=3)
