"""Model-stack tests: shapes, ControlNet semantics, HF-mapping roundtrips."""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastedit_tpu.models import (
    AutoencoderKL,
    ControlNetModel,
    UNet2DConditionModel,
    configs,
)
from fastedit_tpu.tools import hf_mapping

KEY = jax.random.PRNGKey(0)
B, HW = 1, 16


def _unet_inputs(cfg):
    pooled_dim = cfg.projection_class_embeddings_input_dim - 6 * cfg.addition_time_embed_dim
    return (
        jax.random.normal(KEY, (B, HW, HW, 4)),
        jnp.array([500.0]),
        jax.random.normal(jax.random.fold_in(KEY, 1), (B, 77, cfg.cross_attention_dim)),
        jax.random.normal(jax.random.fold_in(KEY, 2), (B, pooled_dim)),
        jnp.tile(jnp.array([[512.0, 512, 0, 0, 512, 512]]), (B, 1)),
    )


@pytest.fixture(scope="module")
def tiny_unet():
    unet = UNet2DConditionModel(configs.TINY_UNET)
    inputs = _unet_inputs(configs.TINY_UNET)
    params = unet.init(KEY, *inputs)
    return unet, params, inputs


@pytest.fixture(scope="module")
def tiny_controlnet():
    cn = ControlNetModel(configs.TINY_CONTROLNET)
    inputs = _unet_inputs(configs.TINY_UNET)
    ds = 2 ** (len(configs.TINY_CONTROLNET.conditioning_embedding_channels) - 1)
    cond = jax.random.uniform(KEY, (B, HW * ds, HW * ds, 3))
    params = cn.init(KEY, *inputs, cond)
    return cn, params, inputs, cond


def test_unet_output_shape_and_determinism(tiny_unet):
    unet, params, inputs = tiny_unet
    out = unet.apply(params, *inputs)
    assert out.shape == (B, HW, HW, 4)
    out2 = unet.apply(params, *inputs)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_controlnet_zero_init_is_noop(tiny_unet, tiny_controlnet):
    """Zero-initialized zero-convs => residuals are exactly zero => injecting
    them leaves the UNet output unchanged (ControlNet starts as identity)."""
    unet, uparams, inputs = tiny_unet
    cn, cparams, _, cond = tiny_controlnet
    down, mid = cn.apply(cparams, *inputs, cond, 1.0)
    assert all(float(jnp.abs(d).max()) == 0.0 for d in down)
    assert float(jnp.abs(mid).max()) == 0.0
    base = unet.apply(uparams, *inputs)
    injected = unet.apply(
        uparams,
        *inputs,
        down_block_additional_residuals=down,
        mid_block_additional_residual=mid,
    )
    np.testing.assert_array_equal(np.asarray(base), np.asarray(injected))


def test_controlnet_scale_is_linear(tiny_controlnet):
    """Residuals scale linearly with conditioning_scale (they're conv outputs
    times the scale)."""
    cn, cparams, inputs, cond = tiny_controlnet
    # Give the zero convs nonzero weights so scaling is observable.
    cparams = jax.tree.map(
        lambda x: jnp.ones_like(x) * 0.01 if x.ndim == 4 else x, cparams
    )
    down1, mid1 = cn.apply(cparams, *inputs, cond, 1.0)
    down2, mid2 = cn.apply(cparams, *inputs, cond, 0.5)
    for a, b in zip(list(down1) + [mid1], list(down2) + [mid2]):
        np.testing.assert_allclose(
            np.asarray(a) * 0.5, np.asarray(b), rtol=1e-5, atol=1e-7
        )


def test_residual_count_matches_unet_skips(tiny_unet, tiny_controlnet):
    """ControlNet must emit exactly one residual per UNet skip connection."""
    unet, uparams, inputs = tiny_unet
    cn, cparams, _, cond = tiny_controlnet
    down, mid = cn.apply(cparams, *inputs, cond, 1.0)
    # Wrong count must assert.
    with pytest.raises(AssertionError):
        unet.apply(
            uparams, *inputs, down_block_additional_residuals=down[:-1],
            mid_block_additional_residual=mid,
        )


def test_vae_roundtrip_shapes():
    vae = AutoencoderKL(configs.TINY_VAE)
    img = jax.random.uniform(KEY, (B, 64, 64, 3)) * 2 - 1
    params = vae.init(KEY, img, KEY)
    mean, logvar = vae.apply(params, img, method=vae.encode_moments)
    ds = configs.TINY_VAE.downscale_factor
    assert mean.shape == (B, 64 // ds, 64 // ds, 4)
    z = AutoencoderKL.sample(mean, logvar, KEY)
    dec = vae.apply(params, z, method=vae.decode)
    assert dec.shape == img.shape


def test_vae_sample_uses_logvar():
    mean = jnp.zeros((1, 4, 4, 4))
    z_tight = AutoencoderKL.sample(mean, jnp.full(mean.shape, -30.0), KEY)
    z_wide = AutoencoderKL.sample(mean, jnp.zeros_like(mean), KEY)
    assert float(jnp.abs(z_tight).max()) < 1e-3
    assert float(jnp.abs(z_wide).max()) > 0.1


# ---------------------------------------------------------------------------
# HF naming-scheme roundtrips: synthesize a diffusers-style state dict with
# the expected key names/shapes, convert via hf_mapping, and check the result
# is tree-identical (names + shapes) to our model's own init.
# ---------------------------------------------------------------------------


def _flatten(tree):
    return {
        "/".join(str(k.key) for k in path): np.asarray(v)
        for path, v in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


def _synthesize_hf_sd(flat_ours: dict) -> dict:
    """Invert our param tree into diffusers-style keys/layouts.

    Scanned transformer stacks ("transformer_blocks/block/...") carry a
    stacked leading axis — unstacked here into per-index HF keys.
    """
    expanded = {}
    for path, v in flat_ours.items():
        if "/transformer_blocks/block/" in path:
            head, tail = path.split("/transformer_blocks/block/", 1)
            for k in range(v.shape[0]):
                expanded[f"{head}/transformer_blocks.{k}/{tail}"] = v[k]
        else:
            expanded[path] = v
    sd = {}
    for path, v in expanded.items():
        parts = path.split("/")
        hf_parts = []
        for p in parts[:-1]:
            # our "resnets_0" <-> hf "resnets.0"; "to_out" <-> "to_out.0";
            # "ff/net_0_proj" <-> "ff.net.0.proj"; "mlp_fc1" <-> "mlp.fc1".
            p = (
                p.replace("net_0_proj", "net.0.proj")
                .replace("net_2", "net.2")
                .replace("mlp_fc1", "mlp.fc1")
                .replace("mlp_fc2", "mlp.fc2")
            )
            if p == "to_out":
                hf_parts.append("to_out.0")
                continue
            if p == "cond_embedder":
                continue  # our grouping module; hf keys are at top level
            if p in ("linear_1", "linear_2"):  # HF keeps these underscores
                hf_parts.append(p)
                continue
            # split trailing _<idx> into .<idx> repeatedly (up_blocks_0 etc.)
            segs = p.split("_")
            rebuilt = []
            for s in segs:
                if s.isdigit() and rebuilt:
                    rebuilt[-1] = rebuilt[-1] + "." + s
                else:
                    rebuilt.append(s)
            hf_parts.append("_".join(rebuilt).replace("_", "_"))
        leaf = parts[-1]
        base = ".".join(hf_parts)
        if leaf == "kernel":
            if v.ndim == 2:
                sd[base + ".weight"] = np.ascontiguousarray(v.T)
            else:  # [kh,kw,I,O] -> [O,I,kh,kw]
                sd[base + ".weight"] = np.ascontiguousarray(
                    np.transpose(v, (3, 2, 0, 1))
                )
        elif leaf == "scale":
            sd[base + ".weight"] = v
        elif leaf == "bias":
            sd[base + ".bias"] = v
        elif leaf == "embedding":
            sd[base + ".weight"] = v
        else:
            raise AssertionError(f"unexpected leaf {path}")
    return sd


def _fix_underscores(sd: dict, replacements) -> dict:
    out = {}
    for k, v in sd.items():
        for a, b in replacements:
            k = k.replace(a, b)
        out[k] = v
    return out


def test_unet_hf_mapping_roundtrip(tiny_unet):
    unet, params, inputs = tiny_unet
    flat = _flatten(params["params"])
    sd = _synthesize_hf_sd(flat)
    converted = hf_mapping.convert_unet(sd, configs.TINY_UNET)
    flat_conv = _flatten(converted)
    assert set(flat_conv) == set(flat)
    for k in flat:
        assert flat_conv[k].shape == flat[k].shape, k
    out_a = unet.apply(params, *inputs)
    out_b = unet.apply({"params": converted}, *inputs)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-6)


def test_controlnet_hf_mapping_roundtrip(tiny_controlnet):
    cn, params, inputs, cond = tiny_controlnet
    flat = _flatten(params["params"])
    sd = _synthesize_hf_sd(flat)
    # controlnet_cond_embedding.blocks_N are real "blocks.N" in HF; the
    # synthesizer already split digits. controlnet_down_blocks.N likewise.
    converted = hf_mapping.convert_controlnet(sd, configs.TINY_CONTROLNET)
    flat_conv = _flatten(converted)
    assert set(flat_conv) == set(flat)
    down_a, mid_a = cn.apply(params, *inputs, cond, 0.7)
    down_b, mid_b = cn.apply({"params": converted}, *inputs, cond, 0.7)
    for a, b in zip(list(down_a) + [mid_a], list(down_b) + [mid_b]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_vae_hf_mapping_roundtrip():
    vae = AutoencoderKL(configs.TINY_VAE)
    img = jax.random.uniform(KEY, (1, 32, 32, 3))
    params = vae.init(KEY, img, KEY)
    flat = _flatten(params["params"])

    def to_hf(path, v):
        parts = path.split("/")
        # encoder/down_blocks_0_resnets_0/... -> encoder.down_blocks.0.resnets.0
        hf = []
        for p in parts[:-1]:
            if p == "attention":
                continue  # our VAEAttention wrapper level
            segs = p.split("_")
            rebuilt = []
            for s in segs:
                if s.isdigit() and rebuilt:
                    rebuilt[-1] += "." + s
                else:
                    rebuilt.append(s)
            # a segment following an indexed one is a nested module -> "."
            joined = rebuilt[0]
            for s in rebuilt[1:]:
                joined += ("." if joined[-1].isdigit() else "_") + s
            hf.append(joined)
        if hf and hf[-1] == "to_out":
            hf[-1] = "to_out.0"
        return ".".join(hf), parts[-1]

    sd = {}
    for path, v in flat.items():
        base, leaf = to_hf(path, v)
        if leaf == "kernel":
            if v.ndim == 2:
                sd[base + ".weight"] = np.ascontiguousarray(v.T)
            else:
                sd[base + ".weight"] = np.ascontiguousarray(
                    np.transpose(v, (3, 2, 0, 1))
                )
        elif leaf == "scale":
            sd[base + ".weight"] = v
        else:
            sd[base + ".bias"] = v

    converted = hf_mapping.convert_vae(sd, configs.TINY_VAE)
    flat_conv = _flatten(converted)
    assert set(flat_conv) == set(flat)
    a = vae.apply(params, img, KEY)
    b = vae.apply({"params": converted}, img, KEY)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
