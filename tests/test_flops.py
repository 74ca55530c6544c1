"""Analytic-FLOPs accounting vs XLA's own cost analysis (bench MFU fields).

The bench cannot use ``cost_analysis()['flops']`` directly (Pallas custom
calls report zero flops; fori_loop bodies count once, not per trip), so
utils/flops.py computes the count analytically.  These tests pin the
analytic walk against XLA cost analysis on XLA-only (Pallas flags off),
loop-free forwards where XLA's number IS trustworthy: the analytic
matmul/conv count must land within a few percent (XLA additionally counts
norm/elementwise flops, so XLA >= analytic, slightly).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastedit_tpu.models import configs
from fastedit_tpu.models.controlnet import ControlNetModel
from fastedit_tpu.models.unet import UNet2DConditionModel
from fastedit_tpu.models.vae import AutoencoderKL
from fastedit_tpu.ops import flags
from fastedit_tpu.utils import flops as F

# Mid-size channels so matmul/conv flops dominate the elementwise tail the
# analytic count deliberately excludes.
# NOTE depth-1 transformers everywhere: Transformer2DModel runs its block
# stack under lax.scan, whose body XLA cost analysis counts ONCE regardless
# of trip count — precisely the undercount utils/flops.py exists to fix.
# Scan length 1 makes XLA's number exact, so the comparison is meaningful;
# deeper stacks are covered by test_edit_flops_composition's linearity.
UNET_CFG = configs.UNetConfig(
    block_out_channels=(64, 128),
    layers_per_block=2,
    down_transformer_layers=((0, 0), (1, 1)),
    mid_transformer_layers=1,
    up_transformer_layers=((1, 1, 1), (0, 0, 0)),
    num_attention_heads=(2, 4),
    cross_attention_dim=96,
    addition_time_embed_dim=8,
    projection_class_embeddings_input_dim=32 + 6 * 8,
)
VAE_CFG = configs.VAEConfig(
    block_out_channels=(32, 64, 64), layers_per_block=1, norm_groups=8
)


def _xla_flops(fn, *args):
    cost = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    return float(cost["flops"])


def _ratio_ok(analytic, xla, lo=0.97, hi=1.15):
    # analytic counts dense (padding-included) conv MACs, XLA exact ones:
    # analytic sits a few percent ABOVE XLA on conv-heavy graphs; XLA's
    # extra norm/elementwise flops pull the other way on tiny channels.
    assert lo <= analytic / xla <= hi, (
        f"analytic {analytic/1e9:.3f} GF vs XLA {xla/1e9:.3f} GF "
        f"(ratio {analytic/xla:.3f})"
    )


def test_unet_flops_matches_xla_cost_analysis():
    hw = 16
    unet = UNet2DConditionModel(UNET_CFG)
    key = jax.random.PRNGKey(0)
    lat = jnp.zeros((1, hw, hw, 4))
    t = jnp.zeros((1,))
    ctx = jnp.zeros((1, 77, UNET_CFG.cross_attention_dim))
    pooled = jnp.zeros((1, 32))
    tids = jnp.zeros((1, 6))
    params = unet.init(key, lat, t, ctx, pooled, tids)

    with flags.override(
        use_pallas_attention=False, use_pallas_conv=False,
        use_fused_resnet=False, use_fused_up2=False,
    ):
        xla = _xla_flops(
            lambda p, *a: unet.apply(p, *a), params, lat, t, ctx, pooled, tids
        )
    _ratio_ok(F.unet_flops(UNET_CFG, hw), xla)


def test_controlnet_flops_matches_xla_cost_analysis():
    hw = 8
    ccfg = configs.ControlNetConfig(
        unet=UNET_CFG, conditioning_embedding_channels=(16, 32)
    )
    cn = ControlNetModel(ccfg)
    key = jax.random.PRNGKey(0)
    lat = jnp.zeros((1, hw, hw, 4))
    t = jnp.zeros((1,))
    ctx = jnp.zeros((1, 77, UNET_CFG.cross_attention_dim))
    pooled = jnp.zeros((1, 32))
    tids = jnp.zeros((1, 6))
    cond = jnp.zeros((1, 2 * hw, 2 * hw, 3))
    params = cn.init(key, lat, t, ctx, pooled, tids, cond)

    with flags.override(
        use_pallas_attention=False, use_pallas_conv=False,
        use_fused_resnet=False, use_fused_up2=False,
    ):
        xla = _xla_flops(
            lambda p, *a: cn.apply(p, *a, 1.0),
            params, lat, t, ctx, pooled, tids, cond,
        )
    analytic = F.controlnet_encoder_flops(
        ccfg, hw
    ) + F.controlnet_cond_tower_flops(ccfg, 2 * hw)
    _ratio_ok(analytic, xla)


def test_vae_flops_matches_xla_cost_analysis():
    px = 32
    vae = AutoencoderKL(VAE_CFG)
    key = jax.random.PRNGKey(0)
    img = jnp.zeros((1, px, px, 3))
    params = vae.init(key, img, key)
    lat_hw = px // VAE_CFG.downscale_factor
    z = jnp.zeros((1, lat_hw, lat_hw, VAE_CFG.latent_channels))

    with flags.override(
        use_pallas_attention=False, use_pallas_conv=False,
        use_fused_resnet=False, use_fused_up2=False,
    ):
        xla_enc = _xla_flops(
            lambda p, x: vae.apply(p, x, method=vae.encode_moments), params, img
        )
        xla_dec = _xla_flops(
            lambda p, x: vae.apply(p, x, method=vae.decode), params, z
        )
    _ratio_ok(F.vae_encoder_flops(VAE_CFG, px), xla_enc)
    _ratio_ok(F.vae_decoder_flops(VAE_CFG, px), xla_dec)


def test_edit_flops_composition():
    """edit_flops = encode + cond tower + decode + steps x (2B) x per-step."""
    ccfg = configs.ControlNetConfig(
        unet=UNET_CFG, conditioning_embedding_channels=(16, 32)
    )
    # use a fake VAE cfg whose downscale matches the cond tower depth (x2)
    vcfg = configs.VAEConfig(block_out_channels=(32, 64), layers_per_block=1)
    res = 32
    lat = res // vcfg.downscale_factor
    total = F.edit_flops(UNET_CFG, ccfg, vcfg, res, 3, do_cfg=True, batch=2)
    per_step = F.unet_flops(UNET_CFG, lat) + F.controlnet_encoder_flops(ccfg, lat)
    fixed = 2 * (
        F.vae_encoder_flops(vcfg, res)
        + F.controlnet_cond_tower_flops(ccfg, res)
        + F.vae_decoder_flops(vcfg, res)
    )
    np.testing.assert_allclose(total, fixed + 3 * 4 * per_step, rtol=1e-12)


def test_flagship_flops_magnitudes():
    """The flagship numbers the bench divides by: sanity-pin their scale so
    a silent config/walk regression cannot quietly distort MFU."""
    edit = F.edit_flops(
        configs.SSD1B_UNET, configs.SDXL_CONTROLNET_SMALL, configs.SDXL_VAE,
        1024, 3, do_cfg=True,
    )
    # SSD-1B UNet fwd at 128² latents is ~3.5 TF; x6 (3 steps x CFG 2) plus
    # ControlNet-small + VAE + cond tower lands in the low tens of TF.
    assert 15e12 < edit < 45e12, f"{edit/1e12:.2f} TF"
    nocfg = F.edit_flops(
        configs.SSD1B_UNET, configs.SDXL_CONTROLNET_SMALL, configs.SDXL_VAE,
        1024, 3, do_cfg=False,
    )
    assert nocfg < edit
