"""Golden-value tests against torch/transformers (SURVEY.md §4).

diffusers is not installable in this environment, so the UNet/VAE get
per-op golden coverage (GroupNorm, attention, GEGLU, conv padding vs torch
functional ops) plus structural mapping tests; the CLIP text tower — the
one HF model constructible offline — gets full-model golden coverage via a
random-weight ``transformers`` model converted through tools/hf_mapping.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from fastedit_tpu.models.configs import CLIPTextConfig
from fastedit_tpu.models.clip import CLIPTextModel
from fastedit_tpu.ops.attention import attention_xla
from fastedit_tpu.ops.groupnorm import group_norm_xla
from fastedit_tpu.tools import hf_mapping

RNG = np.random.default_rng(0)


def test_group_norm_matches_torch():
    x = RNG.standard_normal((2, 8, 8, 32), dtype=np.float32)
    gamma = RNG.standard_normal(32, dtype=np.float32)
    beta = RNG.standard_normal(32, dtype=np.float32)
    ours = group_norm_xla(jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta), 8)
    theirs = F.group_norm(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        8,
        torch.from_numpy(gamma),
        torch.from_numpy(beta),
        eps=1e-5,
    ).permute(0, 2, 3, 1)
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy(), rtol=1e-4, atol=1e-5
    )


def test_group_norm_silu_matches_torch():
    x = RNG.standard_normal((1, 4, 4, 16), dtype=np.float32)
    g = np.ones(16, dtype=np.float32)
    b = np.zeros(16, dtype=np.float32)
    ours = group_norm_xla(jnp.asarray(x), jnp.asarray(g), jnp.asarray(b), 4, act="silu")
    ref = F.silu(
        F.group_norm(torch.from_numpy(x).permute(0, 3, 1, 2), 4, eps=1e-5)
    ).permute(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_attention_matches_torch_sdpa():
    b, sq, skv, h, d = 2, 16, 7, 4, 8
    q = RNG.standard_normal((b, sq, h, d), dtype=np.float32)
    k = RNG.standard_normal((b, skv, h, d), dtype=np.float32)
    v = RNG.standard_normal((b, skv, h, d), dtype=np.float32)
    ours = attention_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    ref = F.scaled_dot_product_attention(
        torch.from_numpy(q).permute(0, 2, 1, 3),
        torch.from_numpy(k).permute(0, 2, 1, 3),
        torch.from_numpy(v).permute(0, 2, 1, 3),
    ).permute(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_geglu_matches_torch():
    x = RNG.standard_normal((3, 10), dtype=np.float32)
    value, gate = np.split(x, 2, axis=-1)
    ours = jnp.asarray(value) * jax.nn.gelu(jnp.asarray(gate), approximate=False)
    tv, tg = torch.from_numpy(value), torch.from_numpy(gate)
    ref = tv * F.gelu(tg)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-5, atol=1e-6)


def test_quick_gelu_matches_torch():
    x = RNG.standard_normal(100, dtype=np.float32)
    ours = jnp.asarray(x) * jax.nn.sigmoid(1.702 * jnp.asarray(x))
    ref = torch.from_numpy(x) * torch.sigmoid(1.702 * torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-5, atol=1e-6)


def test_conv_same_padding_matches_torch():
    """flax SAME padding for stride-1 3x3 == torch padding=1."""
    x = RNG.standard_normal((1, 9, 9, 3), dtype=np.float32)
    w = RNG.standard_normal((5, 3, 3, 3), dtype=np.float32)  # [O,I,kh,kw]
    ref = F.conv2d(
        torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(w), padding=1
    ).permute(0, 2, 3, 1)
    ours = jax.lax.conv_general_dilated(
        jnp.asarray(x),
        jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_strided_conv_pad1_matches_torch():
    """stride-2 3x3 with explicit (1,1) padding == torch stride=2 padding=1."""
    x = RNG.standard_normal((1, 8, 8, 4), dtype=np.float32)
    w = RNG.standard_normal((6, 4, 3, 3), dtype=np.float32)
    ref = F.conv2d(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        torch.from_numpy(w),
        stride=2,
        padding=1,
    ).permute(0, 2, 3, 1)
    ours = jax.lax.conv_general_dilated(
        jnp.asarray(x),
        jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
        window_strides=(2, 2),
        padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    assert ours.shape == tuple(ref.shape)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_clip_vision_tower_matches_transformers():
    """CLIPScore's vision backbone vs transformers, random weights mapped
    through the converter (validates patch embed, CLS/pos, pre/post LN,
    projection)."""
    from transformers import CLIPVisionConfig as HFVC
    from transformers import CLIPVisionModelWithProjection as HFVM

    from fastedit_tpu.models.clip import CLIPVisionModel
    from fastedit_tpu.models.configs import CLIPVisionConfig

    hf_cfg = HFVC(
        image_size=32,
        patch_size=8,
        hidden_size=32,
        num_hidden_layers=3,
        num_attention_heads=2,
        intermediate_size=64,
        projection_dim=16,
        hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    hf = HFVM(hf_cfg).eval()
    cfg = CLIPVisionConfig(
        image_size=32,
        patch_size=8,
        hidden_size=32,
        num_layers=3,
        num_heads=2,
        intermediate_size=64,
        projection_dim=16,
    )
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    sd.pop("vision_model.embeddings.position_ids", None)
    params = hf_mapping.convert_clip_vision(sd, cfg)

    pixels = RNG.standard_normal((2, 32, 32, 3)).astype(np.float32)
    ours = CLIPVisionModel(cfg).apply({"params": params}, jnp.asarray(pixels))
    with torch.no_grad():
        theirs = hf(torch.from_numpy(pixels).permute(0, 3, 1, 2)).image_embeds
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy(), rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("act,proj", [("quick_gelu", None), ("gelu", 32)])
def test_clip_text_tower_matches_transformers(act, proj):
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModel as HFModel
    from transformers import CLIPTextModelWithProjection as HFModelProj

    hf_cfg = HFConfig(
        vocab_size=1000,
        hidden_size=32,
        num_hidden_layers=3,
        num_attention_heads=2,
        intermediate_size=64,
        max_position_embeddings=77,
        hidden_act=act,
        eos_token_id=999,
        bos_token_id=998,
        pad_token_id=0,
        projection_dim=proj or 32,
    )
    torch.manual_seed(0)
    hf = (HFModelProj if proj else HFModel)(hf_cfg).eval()

    cfg = CLIPTextConfig(
        vocab_size=1000,
        hidden_size=32,
        num_layers=3,
        num_heads=2,
        intermediate_size=64,
        hidden_act=act,
        eos_token_id=999,
        projection_dim=proj,
    )
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    sd.pop("text_model.embeddings.position_ids", None)
    params = hf_mapping.convert_clip_text(sd, cfg)

    ids = np.array([[998, 5, 7, 123, 999, 0, 0, 0], [998, 42, 999, 0, 0, 0, 0, 0]])
    ours = CLIPTextModel(cfg).apply({"params": params}, jnp.asarray(ids))
    with torch.no_grad():
        theirs = hf(torch.from_numpy(ids), output_hidden_states=True)

    np.testing.assert_allclose(
        np.asarray(ours.last_hidden_state),
        theirs.last_hidden_state.numpy(),
        rtol=1e-4,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(ours.penultimate_hidden_state),
        theirs.hidden_states[-2].numpy(),
        rtol=1e-4,
        atol=1e-5,
    )
    pooled_ref = theirs.text_embeds if proj else theirs.pooler_output
    np.testing.assert_allclose(
        np.asarray(ours.pooled_output), pooled_ref.numpy(), rtol=1e-4, atol=1e-5
    )


def test_clip_text_tower_legacy_eos2_matches_transformers():
    """Real CLIP/SDXL config.json files ship the historically-wrong
    "eos_token_id": 2; transformers special-cases it by pooling at the
    highest token id (EOS is the largest vocab id).  Every converted real
    checkpoint takes this path — the eos=999 test above never does."""
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModel as HFModel

    hf_cfg = HFConfig(
        vocab_size=1000,
        hidden_size=32,
        num_hidden_layers=3,
        num_attention_heads=2,
        intermediate_size=64,
        max_position_embeddings=77,
        hidden_act="quick_gelu",
        eos_token_id=2,
        bos_token_id=1,
        pad_token_id=0,
    )
    torch.manual_seed(5)
    hf = HFModel(hf_cfg).eval()

    cfg = CLIPTextConfig(
        vocab_size=1000,
        hidden_size=32,
        num_layers=3,
        num_heads=2,
        intermediate_size=64,
        hidden_act="quick_gelu",
        eos_token_id=2,
        projection_dim=None,
    )
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    sd.pop("text_model.embeddings.position_ids", None)
    params = hf_mapping.convert_clip_text(sd, cfg)

    # EOS = 999 (the largest id the tokenizer emits), NOT 2: pooling must
    # land on it anyway via the argmax workaround.
    ids = np.array([[1, 5, 7, 123, 999, 0, 0, 0], [1, 42, 999, 0, 0, 0, 0, 0]])
    ours = CLIPTextModel(cfg).apply({"params": params}, jnp.asarray(ids))
    with torch.no_grad():
        theirs = hf(torch.from_numpy(ids))
    np.testing.assert_allclose(
        np.asarray(ours.pooled_output),
        theirs.pooler_output.numpy(),
        rtol=1e-4,
        atol=1e-5,
    )
