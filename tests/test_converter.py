"""Converter tests: HF config derivation, LoRA fusion, checkpoint I/O."""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from fastedit_tpu.models import configs as C
from fastedit_tpu.tools import hf_config, lora
from fastedit_tpu.utils import checkpoint as ckpt_io

# The SDXL-base-1.0 unet/config.json facts (public checkpoint config).
SDXL_HF_CONFIG = {
    "in_channels": 4,
    "out_channels": 4,
    "block_out_channels": [320, 640, 1280],
    "layers_per_block": 2,
    "down_block_types": ["DownBlock2D", "CrossAttnDownBlock2D", "CrossAttnDownBlock2D"],
    "up_block_types": ["CrossAttnUpBlock2D", "CrossAttnUpBlock2D", "UpBlock2D"],
    "transformer_layers_per_block": [1, 2, 10],
    "attention_head_dim": [5, 10, 20],
    "num_attention_heads": None,
    "cross_attention_dim": 2048,
    "addition_time_embed_dim": 256,
    "projection_class_embeddings_input_dim": 2816,
    "norm_eps": 1e-5,
    "norm_num_groups": 32,
    "mid_block_type": "UNetMidBlock2DCrossAttn",
}


def test_sdxl_config_derivation():
    cfg = hf_config.unet_config_from_hf(SDXL_HF_CONFIG)
    assert cfg == C.SDXL_UNET


def test_ssd1b_style_nested_config():
    """SSD-1B-style config: per-layer transformer lists + reverse override."""
    hf = dict(SDXL_HF_CONFIG)
    hf["transformer_layers_per_block"] = [[0, 0], [2, 2], [4, 4]]
    hf["reverse_transformer_layers_per_block"] = [[4, 4, 4], [2, 2, 1], [0, 0, 0]]
    hf["mid_block_type"] = None
    cfg = hf_config.unet_config_from_hf(hf)
    assert cfg.down_transformer_layers == ((0, 0), (2, 2), (4, 4))
    assert cfg.up_transformer_layers == ((4, 4, 4), (2, 2, 1), (0, 0, 0))
    assert cfg.mid_transformer_layers is None


def test_attention_free_mid_block():
    hf = dict(SDXL_HF_CONFIG)
    hf["mid_block_type"] = "UNetMidBlock2D"
    assert hf_config.unet_config_from_hf(hf).mid_transformer_layers == 0


def test_vae_config_derivation():
    cfg = hf_config.vae_config_from_hf(
        {
            "block_out_channels": [128, 256, 512, 512],
            "layers_per_block": 2,
            "latent_channels": 4,
            "scaling_factor": 0.13025,
            "norm_num_groups": 32,
        }
    )
    assert cfg == C.SDXL_VAE


def test_clip_text_config_derivation():
    cfg = hf_config.clip_text_config_from_hf(
        {
            "vocab_size": 49408,
            "hidden_size": 1280,
            "num_hidden_layers": 32,
            "num_attention_heads": 20,
            "intermediate_size": 5120,
            "hidden_act": "gelu",
            "eos_token_id": 49407,
            "projection_dim": 1280,
        },
        with_projection=True,
    )
    assert cfg == C.SDXL_TEXT_ENCODER_2


# ---------------------------------------------------------------- LoRA fusion


def _lora_case(dialect):
    rng = np.random.default_rng(0)
    w = rng.standard_normal((8, 6)).astype(np.float32)
    down = rng.standard_normal((2, 6)).astype(np.float32)
    up = rng.standard_normal((8, 2)).astype(np.float32)
    base = {"down_blocks.0.attentions.0.to_q.weight": w}
    mod = "unet.down_blocks.0.attentions.0.to_q"
    if dialect == "peft":
        sd = {f"{mod}.lora_A.weight": down, f"{mod}.lora_B.weight": up}
    elif dialect == "diffusers":
        sd = {f"{mod}.lora.down.weight": down, f"{mod}.lora.up.weight": up}
    else:
        mod_k = "lora_unet_down_blocks_0_attentions_0_to_q"
        sd = {
            f"{mod_k}.lora_down.weight": down,
            f"{mod_k}.lora_up.weight": up,
            f"{mod_k}.alpha": np.asarray(1.0, dtype=np.float32),
        }
    return base, sd, w, down, up


@pytest.mark.parametrize("dialect", ["peft", "diffusers", "kohya"])
def test_lora_fusion_dialects(dialect):
    base, sd, w, down, up = _lora_case(dialect)
    scale = 0.5 if dialect == "kohya" else 1.0  # kohya: alpha/rank = 1/2
    fused, n = lora.fuse_lora_into_state_dict(base, sd)
    assert n == 1
    np.testing.assert_allclose(
        fused["down_blocks.0.attentions.0.to_q.weight"],
        w + scale * (up @ down),
        rtol=1e-5,
    )


def test_lora_fusion_strict_on_missing_module():
    base, sd, *_ = _lora_case("peft")
    base = {"some.other.weight": np.zeros((2, 2), np.float32)}
    with pytest.raises(KeyError):
        lora.fuse_lora_into_state_dict(base, sd)


# ------------------------------------------------------------- checkpoint I/O


def test_checkpoint_roundtrip_bf16(tmp_path):
    import ml_dtypes

    tree = {
        "a": {"kernel": np.ones((4, 4), np.float32), "bias": np.zeros(4, np.float32)},
        "b": {"nested": {"x": np.full((2, 2), 0.5, np.float32)}},
    }
    ckpt_io.save_params(str(tmp_path / "m"), tree, dtype=ml_dtypes.bfloat16)
    loaded = ckpt_io.load_params(str(tmp_path / "m"), dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(loaded["a"]["kernel"]), tree["a"]["kernel"])
    assert loaded["b"]["nested"]["x"].dtype == np.float32


def test_config_roundtrip(tmp_path):
    ckpt_io.save_config(str(tmp_path / "u"), C.SSD1B_UNET)
    loaded = ckpt_io.load_config(str(tmp_path / "u"), C.UNetConfig)
    assert loaded == C.SSD1B_UNET

    ckpt_io.save_config(str(tmp_path / "c"), C.TINY_CONTROLNET)
    loaded = ckpt_io.load_config(str(tmp_path / "c"), C.ControlNetConfig)
    assert loaded == C.TINY_CONTROLNET


def test_clip_text_convert_from_combined_clipmodel_repo(tmp_path):
    """The CLIPScore backbone (openai/clip-vit-base-patch16) ships ONE
    CLIPModel repo: nested text_config + top-level projection_dim + a state
    dict that also carries the vision tower.  convert_component('clip_text')
    must unwrap the nested config (regression: KeyError 'vocab_size') and
    leave the vision keys to the allowed-unused list."""
    import json as _json
    import os as _os

    transformers = pytest.importorskip("transformers")
    from accelerate import init_empty_weights
    from safetensors.numpy import save_file

    from fastedit_tpu.tools.convert_checkpoint import convert_component

    tiny = {
        "projection_dim": 16,
        "text_config": {
            "vocab_size": 99,
            "hidden_size": 32,
            "intermediate_size": 64,
            "num_hidden_layers": 2,
            "num_attention_heads": 2,
            "max_position_embeddings": 77,
            "hidden_act": "quick_gelu",
        },
        "vision_config": {
            "image_size": 32,
            "patch_size": 16,
            "hidden_size": 32,
            "intermediate_size": 64,
            "num_hidden_layers": 2,
            "num_attention_heads": 2,
            "hidden_act": "quick_gelu",
        },
    }
    src = tmp_path / "b16"
    src.mkdir()
    (src / "config.json").write_text(_json.dumps(tiny))
    cfg = transformers.CLIPConfig(
        projection_dim=tiny["projection_dim"],
        text_config=tiny["text_config"],
        vision_config=tiny["vision_config"],
    )
    with init_empty_weights():
        model = transformers.CLIPModel(cfg)
    save_file(
        {
            k: np.zeros(tuple(v.shape), np.float16)
            for k, v in model.state_dict().items()
        },
        str(src / "model.safetensors"),
    )
    out = tmp_path / "out"
    convert_component("clip_text", str(src), str(out), dtype="fp32")
    assert _os.path.exists(out / "weights.safetensors")
    saved_cfg = _json.loads((out / "config.json").read_text())
    assert saved_cfg["vocab_size"] == 99
    assert saved_cfg["projection_dim"] == 16


def test_save_params_non_contiguous_roundtrip(tmp_path):
    """The installed safetensors serializes data_ptr+nbytes without a
    contiguity check, so a transposed view would round-trip silently
    corrupted; save_params must defend in BOTH dtype modes."""
    t = np.arange(12, dtype=np.float32).reshape(3, 4).T  # non-contiguous
    assert not t.flags["C_CONTIGUOUS"]
    for dtype in (None, np.float32):
        out = tmp_path / f"nc_{dtype is None}"
        ckpt_io.save_params(str(out), {"w": t}, dtype=dtype)
        back = ckpt_io.load_params(str(out))
        np.testing.assert_array_equal(back["w"], t)
