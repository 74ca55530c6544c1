"""Precision-policy tests: bf16 pipeline tracks the fp32 pipeline closely.

SURVEY.md §7 hard part #1 (bf16 parity): fp32 statistics inside norms/
softmax/scheduler should keep bf16 end-to-end outputs near the fp32 ones
even on the 4-step LCM loop (which amplifies per-step error).
"""

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from fastedit_tpu import FastEditor


def _img(seed=0, n=64):
    r = np.random.default_rng(seed)
    return Image.fromarray(r.integers(0, 255, (n, n, 3), dtype=np.uint8), "RGB")


@pytest.mark.slow
def test_bf16_tracks_fp32_end_to_end():
    # Same random init for both editors (init in fp32 then cast for bf16
    # would be ideal; init_seed pins the stream, dtypes differ at init —
    # so instead share params explicitly).
    ed32 = FastEditor("tiny", dtype=jnp.float32, init_seed=3)
    ed16 = FastEditor("tiny", dtype=jnp.bfloat16, init_seed=3)
    # Share the fp32 weights, cast to bf16, so only compute precision differs.
    import jax

    m32, m16 = ed32.modules, ed16.modules
    for attr in (
        "unet_params",
        "controlnet_params",
        "vae_params",
        "text_encoder_params",
        "text_encoder_2_params",
    ):
        setattr(
            m16,
            attr,
            jax.tree.map(lambda x: x.astype(jnp.bfloat16), getattr(m32, attr)),
        )
    ed16._rebuild_stages()
    ed16._prompt_cache = {}

    img = _img(1)
    out32 = np.asarray(ed32.edit(img, "a blue car", seed=9), dtype=np.float32)
    out16 = np.asarray(ed16.edit(img, "a blue car", seed=9), dtype=np.float32)
    diff = np.abs(out32 - out16)
    # bf16 has ~3 decimal digits; through a random-weight denoiser the
    # pixel-level agreement should still be strong.
    assert float(np.mean(diff)) < 12.0, f"mean |diff| {np.mean(diff)}"
    corr = np.corrcoef(out32.ravel(), out16.ravel())[0, 1]
    assert corr > 0.98, f"corr {corr}"
