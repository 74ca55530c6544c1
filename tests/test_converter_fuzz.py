"""Adversarial converter fuzzing (round-2 verdict Next #7).

The strict-mode roundtrips prove the converters consume exactly the real
checkpoints' key sets.  The failure class they cannot see is a *wrong but
plausible* checkpoint: renamed tensors, off-by-one block indices, swapped
layouts.  Each mutation here perturbs the honest inventory and asserts the
validation path — ``convert_* (strict)`` followed by the init-tree shape
diff — fails LOUDLY instead of mis-assigning weights.

Reference weight-binding surface being defended: the diffusers loaders the
reference calls in src/pipeline.py:82-154.
"""

import numpy as np
import pytest

from fastedit_tpu.tools import hf_config, hf_inventory as I, hf_mapping as M
from fastedit_tpu.tools import hf_vendored as V

from tests.test_hf_inventory import (
    assert_same_tree_shapes,
    materialize,
)


@pytest.fixture(scope="module")
def vae_base():
    inv = I.vae_inventory(V.VAE_CONFIG)
    cfg = hf_config.vae_config_from_hf(V.VAE_CONFIG)
    return materialize(inv), cfg


def _vae_shapes(cfg):
    # Checked-in init shape tree (slow-marked freshness test in
    # test_hf_inventory pins it against eval_shape).
    del cfg
    from fastedit_tpu.tools import shape_fixtures

    return shape_fixtures.load("vae")


def _rename(sd, old_sub, new_sub):
    out = {}
    hits = 0
    for k, v in sd.items():
        if old_sub in k:
            out[k.replace(old_sub, new_sub)] = v
            hits += 1
        else:
            out[k] = v
    assert hits, f"mutation matched nothing: {old_sub}"
    return out


def _mutations():
    def rename_conv_shortcut(sd):
        return _rename(sd, "resnets.0.conv_shortcut", "resnets.0.shortcut")

    def off_by_one_resnet_index(sd):
        # up_blocks have resnets.{0,1,2}; shifting 2 -> 3 leaves 2 missing
        # and 3 unconsumed.
        return _rename(
            sd, "decoder.up_blocks.1.resnets.2.", "decoder.up_blocks.1.resnets.3."
        )

    def norm_weight_renamed(sd):
        return _rename(
            sd,
            "decoder.mid_block.resnets.0.norm1.weight",
            "decoder.mid_block.resnets.0.norm1.gamma",
        )

    def dropped_bias(sd):
        sd = dict(sd)
        del sd["decoder.conv_out.bias"]
        return sd

    def extra_plausible_tensor(sd):
        sd = dict(sd)
        sd["decoder.up_blocks.0.resnets.0.conv3.weight"] = np.zeros(
            (512, 512, 3, 3), np.float16
        )
        return sd

    def transposed_conv_layout(sd):
        # conv_in [O=128? decoder entry 512, I=4, 3, 3] stored I/O-swapped —
        # shape-incompatible after the HWIO transpose, must not load.
        sd = dict(sd)
        w = sd["decoder.conv_in.weight"]
        sd["decoder.conv_in.weight"] = np.transpose(w, (1, 0, 2, 3)).copy()
        return sd

    def wrong_rank_tensor(sd):
        sd = dict(sd)
        w = sd["decoder.mid_block.attentions.0.to_q.weight"]
        sd["decoder.mid_block.attentions.0.to_q.weight"] = w.reshape(-1)
        return sd

    return [
        rename_conv_shortcut,
        off_by_one_resnet_index,
        norm_weight_renamed,
        dropped_bias,
        extra_plausible_tensor,
        transposed_conv_layout,
        wrong_rank_tensor,
    ]


@pytest.mark.parametrize("mutate", _mutations(), ids=lambda f: f.__name__)
def test_vae_converter_rejects_mutated_checkpoints(vae_base, mutate):
    sd, cfg = vae_base
    bad = mutate(dict(sd))
    with pytest.raises((M.MappingError, KeyError, AssertionError, ValueError)):
        params = M.convert_vae(bad, cfg, strict=True)
        # Shape-compatible key sets can convert; the init-tree diff is the
        # second gate and must then catch the layout damage.
        assert_same_tree_shapes(params, _vae_shapes(cfg))


def test_unet_converter_rejects_block_index_shift():
    """Same defense on the UNet path (time-embedding/dense side)."""
    inv = I.unet_inventory(V.SSD1B_UNET_CONFIG)
    sd = materialize(inv)
    cfg = hf_config.unet_config_from_hf(V.SSD1B_UNET_CONFIG)
    bad = _rename(sd, "down_blocks.1.attentions.0.", "down_blocks.1.attentions.9.")
    with pytest.raises((M.MappingError, KeyError)):
        M.convert_unet(bad, cfg, strict=True)
