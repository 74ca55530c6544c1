"""FULL-model golden tests vs raw torch (round-4 verdict Next #2).

test_golden_blocks.py proves block *internals*; these tests assemble
complete diffusers models in raw torch — UNet2DConditionModel,
ControlNetModel, AutoencoderKL, per the construction rules
``fastedit_tpu/tools/hf_inventory.py`` encodes (the module zoo the
reference binds at /root/reference/src/pipeline.py:8-14) — convert their
state dicts through the real ``tools/hf_mapping`` converters, and compare
WHOLE-forward outputs at fp32 tolerances.  This is the only offline test
that can catch:

  * skip-residual ordering (down path collects conv_in + per-resnet +
    per-downsample outputs; up path consumes them newest-first),
  * ControlNet residual injection order into the UNet skips + mid,
  * the added-cond path (pooled text emb + sinusoidal time-id embs),
  * SSD-1B-style topologies (no mid block at all; asymmetric
    reverse_transformer_layers_per_block up path),
  * VAE encoder/decoder assembly incl. the mid attention block and the
    asymmetric (0,1) encoder downsample padding.

Topologies covered (>=3 per the round-4 verdict):
  1. SDXL-shaped tiny UNet (mid block, symmetric up) + ControlNet injection
  2. SSD-1B-shaped tiny UNet (mid_block_type null, asymmetric up depths)
  3. per-layer-varying down depths (layers_per_block=2, depths (0,1)/(1,2))
  4. full AutoencoderKL (encode moments + decode)
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from fastedit_tpu.models import configs
from fastedit_tpu.models.controlnet import ControlNetModel
from fastedit_tpu.models.unet import UNet2DConditionModel
from fastedit_tpu.models.vae import AutoencoderKL
from fastedit_tpu.tools import hf_inventory, hf_mapping

from test_golden_blocks import (
    TorchCondEmbedding,
    TorchResnetBlock2D,
    TorchTransformer2DModel,
    _np_sd,
)

RNG = np.random.default_rng(7)


# --------------------------------------------------------------------------
# torch reference model assembly (diffusers semantics + state-dict names)
# --------------------------------------------------------------------------


def torch_timesteps(t: torch.Tensor, dim: int) -> torch.Tensor:
    """diffusers Timesteps: flip_sin_to_cos=True, downscale_freq_shift=0."""
    half = dim // 2
    freqs = torch.exp(
        -math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half
    )
    args = t.float()[:, None] * freqs[None, :]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class TorchTimestepEmbedding(nn.Module):
    def __init__(self, in_dim, out_dim):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, out_dim)
        self.linear_2 = nn.Linear(out_dim, out_dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


class TorchDownBlock(nn.Module):
    """CrossAttnDownBlock2D / DownBlock2D, returning per-layer skips."""

    def __init__(self, cin, cout, temb_dim, depths, heads, cross, groups,
                 add_downsample):
        super().__init__()
        self.resnets = nn.ModuleList(
            [
                TorchResnetBlock2D(cin if j == 0 else cout, cout, temb_dim,
                                   groups=groups)
                for j in range(len(depths))
            ]
        )
        self.attentions = nn.ModuleList(
            [
                TorchTransformer2DModel(cout, heads, cout // heads, d, cross)
                if d > 0
                else None
                for d in depths
            ]
        )
        self.downsamplers = (
            nn.ModuleList([TorchDownsample2D(cout)]) if add_downsample else None
        )

    def forward(self, x, temb, context):
        skips = []
        for resnet, attn in zip(self.resnets, self.attentions):
            x = resnet(x, temb)
            if attn is not None:
                x = attn(x, context)
            skips.append(x)
        if self.downsamplers is not None:
            x = self.downsamplers[0](x)
            skips.append(x)
        return x, skips


class TorchDownsample2D(nn.Module):
    """UNet downsample: Conv2d(stride=2, padding=1), key name .conv."""

    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=1)

    def forward(self, x):
        return self.conv(x)


class TorchUpsample2D(nn.Module):
    """UNet/VAE upsample: nearest x2 then Conv2d(pad=1), key name .conv."""

    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


class TorchMidBlock(nn.Module):
    def __init__(self, ch, temb_dim, depth, heads, cross, groups):
        super().__init__()
        self.resnets = nn.ModuleList(
            [
                TorchResnetBlock2D(ch, ch, temb_dim, groups=groups),
                TorchResnetBlock2D(ch, ch, temb_dim, groups=groups),
            ]
        )
        self.attentions = nn.ModuleList(
            [
                TorchTransformer2DModel(ch, heads, ch // heads, depth, cross)
                if depth > 0
                else None
            ]
        )

    def forward(self, x, temb, context):
        x = self.resnets[0](x, temb)
        if self.attentions[0] is not None:
            x = self.attentions[0](x, context)
        return self.resnets[1](x, temb)


class TorchUpBlock(nn.Module):
    """CrossAttnUpBlock2D: skip-concat resnets (newest skip first)."""

    def __init__(self, prev_out, cout, skip_chans, temb_dim, depths, heads,
                 cross, groups, add_upsample):
        super().__init__()
        self.resnets = nn.ModuleList(
            [
                TorchResnetBlock2D(
                    (prev_out if j == 0 else cout) + skip_chans[j],
                    cout, temb_dim, groups=groups,
                )
                for j in range(len(depths))
            ]
        )
        self.attentions = nn.ModuleList(
            [
                TorchTransformer2DModel(cout, heads, cout // heads, d, cross)
                if d > 0
                else None
                for d in depths
            ]
        )
        self.upsamplers = (
            nn.ModuleList([TorchUpsample2D(cout)]) if add_upsample else None
        )

    def forward(self, x, skips, temb, context):
        # diffusers pops res_samples newest-first
        skips = list(skips)
        for resnet, attn in zip(self.resnets, self.attentions):
            x = torch.cat([x, skips.pop()], dim=1)
            x = resnet(x, temb)
            if attn is not None:
                x = attn(x, context)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x)
        return x


def _up_skip_chans(cfg, i, j):
    """Channels of the skip consumed by up block i, resnet j (diffusers:
    last resnet of a block eats the PREVIOUS block's resolution skip)."""
    chans = list(cfg.block_out_channels)
    rev = list(reversed(chans))
    n = len(chans)
    return rev[min(i + 1, n - 1)] if j == cfg.layers_per_block else rev[i]


class TorchUNet2DConditionModel(nn.Module):
    """Full diffusers UNet2DConditionModel (SDXL family, addition_embed_type
    = text_time), built from a fastedit_tpu UNetConfig."""

    def __init__(self, cfg: configs.UNetConfig):
        super().__init__()
        self.cfg = cfg
        chans = list(cfg.block_out_channels)
        n = len(chans)
        temb = cfg.time_embed_dim
        g = cfg.norm_groups
        cross = cfg.cross_attention_dim
        self.conv_in = nn.Conv2d(cfg.in_channels, chans[0], 3, padding=1)
        self.time_embedding = TorchTimestepEmbedding(chans[0], temb)
        self.add_embedding = TorchTimestepEmbedding(
            cfg.projection_class_embeddings_input_dim, temb
        )
        self.down_blocks = nn.ModuleList()
        out_ch = chans[0]
        for i in range(n):
            in_ch, out_ch = out_ch, chans[i]
            self.down_blocks.append(
                TorchDownBlock(
                    in_ch, out_ch, temb, cfg.down_transformer_layers[i],
                    cfg.num_attention_heads[i], cross, g, i < n - 1,
                )
            )
        self.mid_block = (
            TorchMidBlock(chans[-1], temb, cfg.mid_transformer_layers,
                          cfg.num_attention_heads[-1], cross, g)
            if cfg.mid_transformer_layers is not None
            else None
        )
        self.up_blocks = nn.ModuleList()
        rev = list(reversed(chans))
        out_ch = rev[0]
        for i in range(n):
            prev, out_ch = out_ch, rev[i]
            skip_chans = [
                _up_skip_chans(cfg, i, j) for j in range(cfg.layers_per_block + 1)
            ]
            self.up_blocks.append(
                TorchUpBlock(
                    prev, out_ch, skip_chans, temb,
                    cfg.up_transformer_layers[i],
                    cfg.num_attention_heads[n - 1 - i], cross, g, i < n - 1,
                )
            )
        self.conv_norm_out = nn.GroupNorm(g, chans[0], eps=cfg.norm_eps)
        self.conv_out = nn.Conv2d(chans[0], cfg.out_channels, 3, padding=1)

    def encode_cond(self, timestep, text_embeds, time_ids):
        cfg = self.cfg
        t_emb = torch_timesteps(timestep, cfg.block_out_channels[0])
        emb = self.time_embedding(t_emb)
        b = time_ids.shape[0]
        time_embeds = torch_timesteps(
            time_ids.flatten(), cfg.addition_time_embed_dim
        ).reshape(b, -1)
        add_embeds = torch.cat([text_embeds, time_embeds], dim=-1)
        return emb + self.add_embedding(add_embeds)

    def encode(self, sample, emb, context):
        """conv_in + down path; returns (hidden, skip tuple)."""
        sample = self.conv_in(sample)
        skips = [sample]
        for block in self.down_blocks:
            sample, res = block(sample, emb, context)
            skips.extend(res)
        return sample, skips

    def forward(self, sample, timestep, context, text_embeds, time_ids,
                down_residuals=None, mid_residual=None):
        emb = self.encode_cond(timestep, text_embeds, time_ids)
        sample, skips = self.encode(sample, emb, context)
        if down_residuals is not None:
            skips = [s + r for s, r in zip(skips, down_residuals)]
        if self.mid_block is not None:
            sample = self.mid_block(sample, emb, context)
        if mid_residual is not None:
            sample = sample + mid_residual
        for block in self.up_blocks:
            k = len(block.resnets)
            block_skips, skips = skips[-k:], skips[:-k]
            sample = block(sample, block_skips, emb, context)
        assert not skips
        return self.conv_out(F.silu(self.conv_norm_out(sample)))


class TorchControlNetModel(nn.Module):
    """Full diffusers ControlNetModel from a fastedit_tpu ControlNetConfig.

    Zero convs are RANDOMIZED here (diffusers zero-inits them) so the golden
    actually observes the residual path.
    """

    def __init__(self, ccfg: configs.ControlNetConfig):
        super().__init__()
        cfg = ccfg.unet
        chans = list(cfg.block_out_channels)
        n = len(chans)
        # encoder clone (reuses the UNet implementation above; up path unused)
        self.unet = TorchUNet2DConditionModel(cfg)
        self.controlnet_cond_embedding = TorchCondEmbedding(
            ccfg.conditioning_embedding_channels, ccfg.conditioning_channels,
            chans[0],
        )
        out_chans = [chans[0]]
        for i in range(n):
            out_chans.extend([chans[i]] * cfg.layers_per_block)
            if i < n - 1:
                out_chans.append(chans[i])
        self.controlnet_down_blocks = nn.ModuleList(
            [nn.Conv2d(c, c, 1) for c in out_chans]
        )
        self.controlnet_mid_block = nn.Conv2d(chans[-1], chans[-1], 1)

    def forward(self, sample, timestep, context, text_embeds, time_ids, cond,
                conditioning_scale):
        emb = self.unet.encode_cond(timestep, text_embeds, time_ids)
        sample = self.unet.conv_in(sample)
        sample = sample + self.controlnet_cond_embedding(cond)
        skips = [sample]
        for block in self.unet.down_blocks:
            sample, res = block(sample, emb, context)
            skips.extend(res)
        if self.unet.mid_block is not None:
            sample = self.unet.mid_block(sample, emb, context)
        down_res = [
            zc(s) * conditioning_scale
            for zc, s in zip(self.controlnet_down_blocks, skips)
        ]
        mid_res = self.controlnet_mid_block(sample) * conditioning_scale
        return down_res, mid_res

    def state_dict_diffusers(self):
        """diffusers key names: encoder-clone keys un-prefixed from .unet."""
        out = {}
        for k, v in self.state_dict().items():
            if k.startswith("unet."):
                k = k[len("unet."):]
                if k.startswith("up_blocks.") or k.startswith("conv_norm_out") \
                        or k.startswith("conv_out"):
                    continue  # ControlNet has no up path / out head
            out[k] = v.numpy()
        return out


# --------------------------------------------------------------------------
# torch VAE
# --------------------------------------------------------------------------


class TorchVAEAttention(nn.Module):
    def __init__(self, ch, groups):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, ch, eps=1e-6)
        self.to_q = nn.Linear(ch, ch)
        self.to_k = nn.Linear(ch, ch)
        self.to_v = nn.Linear(ch, ch)
        self.to_out = nn.ModuleList([nn.Linear(ch, ch), nn.Dropout(0.0)])

    def forward(self, x):
        b, c, h, w = x.shape
        residual = x
        y = self.group_norm(x).permute(0, 2, 3, 1).reshape(b, h * w, c)
        att = F.scaled_dot_product_attention(
            self.to_q(y)[:, None], self.to_k(y)[:, None], self.to_v(y)[:, None]
        )[:, 0]
        y = self.to_out[0](att)
        return y.reshape(b, h, w, c).permute(0, 3, 1, 2) + residual


class TorchVAEDownsample(nn.Module):
    """VAE encoder downsample: asymmetric (0,1) pad + Conv2d(stride=2, pad=0)."""

    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=0)

    def forward(self, x):
        return self.conv(F.pad(x, (0, 1, 0, 1)))


class TorchAutoencoderKL(nn.Module):
    def __init__(self, cfg: configs.VAEConfig):
        super().__init__()
        chans = list(cfg.block_out_channels)
        n = len(chans)
        g = cfg.norm_groups
        zc = cfg.latent_channels
        L = cfg.layers_per_block

        def resblock(cin, cout):
            return TorchResnetBlock2D(cin, cout, None, groups=g, eps=1e-6)

        # encoder
        enc = nn.Module()
        enc.conv_in = nn.Conv2d(cfg.in_channels, chans[0], 3, padding=1)
        enc.down_blocks = nn.ModuleList()
        out_ch = chans[0]
        for i in range(n):
            in_ch, out_ch = out_ch, chans[i]
            blk = nn.Module()
            blk.resnets = nn.ModuleList(
                [resblock(in_ch if j == 0 else out_ch, out_ch) for j in range(L)]
            )
            if i < n - 1:
                blk.downsamplers = nn.ModuleList([TorchVAEDownsample(out_ch)])
            enc.down_blocks.append(blk)
        enc.mid_block = nn.Module()
        enc.mid_block.resnets = nn.ModuleList(
            [resblock(chans[-1], chans[-1]), resblock(chans[-1], chans[-1])]
        )
        enc.mid_block.attentions = nn.ModuleList(
            [TorchVAEAttention(chans[-1], g)]
        )
        enc.conv_norm_out = nn.GroupNorm(g, chans[-1], eps=1e-6)
        enc.conv_out = nn.Conv2d(chans[-1], 2 * zc, 3, padding=1)
        self.encoder = enc

        # decoder
        dec = nn.Module()
        rev = list(reversed(chans))
        dec.conv_in = nn.Conv2d(zc, rev[0], 3, padding=1)
        dec.mid_block = nn.Module()
        dec.mid_block.resnets = nn.ModuleList(
            [resblock(rev[0], rev[0]), resblock(rev[0], rev[0])]
        )
        dec.mid_block.attentions = nn.ModuleList([TorchVAEAttention(rev[0], g)])
        dec.up_blocks = nn.ModuleList()
        out_ch = rev[0]
        for i in range(n):
            in_ch, out_ch = out_ch, rev[i]
            blk = nn.Module()
            blk.resnets = nn.ModuleList(
                [
                    resblock(in_ch if j == 0 else out_ch, out_ch)
                    for j in range(L + 1)
                ]
            )
            if i < n - 1:
                blk.upsamplers = nn.ModuleList([TorchUpsample2D(out_ch)])
            dec.up_blocks.append(blk)
        dec.conv_norm_out = nn.GroupNorm(g, chans[0], eps=1e-6)
        dec.conv_out = nn.Conv2d(chans[0], cfg.in_channels, 3, padding=1)
        self.decoder = dec

        self.quant_conv = nn.Conv2d(2 * zc, 2 * zc, 1)
        self.post_quant_conv = nn.Conv2d(zc, zc, 1)

    def encode_moments(self, x):
        e = self.encoder
        x = e.conv_in(x)
        for blk in e.down_blocks:
            for r in blk.resnets:
                x = r(x, None)
            if hasattr(blk, "downsamplers"):
                x = blk.downsamplers[0](x)
        x = e.mid_block.resnets[0](x, None)
        x = e.mid_block.attentions[0](x)
        x = e.mid_block.resnets[1](x, None)
        x = e.conv_out(F.silu(e.conv_norm_out(x)))
        return self.quant_conv(x).chunk(2, dim=1)

    def decode(self, z):
        d = self.decoder
        x = d.conv_in(self.post_quant_conv(z))
        x = d.mid_block.resnets[0](x, None)
        x = d.mid_block.attentions[0](x)
        x = d.mid_block.resnets[1](x, None)
        for blk in d.up_blocks:
            for r in blk.resnets:
                x = r(x, None)
            if hasattr(blk, "upsamplers"):
                x = blk.upsamplers[0](x)
        return d.conv_out(F.silu(d.conv_norm_out(x)))


# --------------------------------------------------------------------------
# configs under test
# --------------------------------------------------------------------------

# 1. SDXL-shaped: mid block present, symmetric up depths.
SDXL_SHAPED = configs.UNetConfig(
    block_out_channels=(32, 64),
    layers_per_block=1,
    down_transformer_layers=((0,), (2,)),
    # diffusers derives mid depth from transformer_layers_per_block[-1]
    mid_transformer_layers=2,
    up_transformer_layers=((2, 2), (0, 0)),
    num_attention_heads=(2, 4),
    cross_attention_dim=48,
    addition_time_embed_dim=8,
    projection_class_embeddings_input_dim=16 + 6 * 8,
)

# 2. SSD-1B-shaped: NO mid block; asymmetric reverse_transformer_layers_per_
#    block-style up depths ((4,4,10)->(1,1,2) scaled).
SSD1B_SHAPED = configs.UNetConfig(
    block_out_channels=(32, 64),
    layers_per_block=2,
    down_transformer_layers=((0, 0), (1, 1)),
    mid_transformer_layers=None,
    up_transformer_layers=((1, 1, 2), (0, 0, 0)),
    num_attention_heads=(2, 4),
    cross_attention_dim=48,
    addition_time_embed_dim=8,
    projection_class_embeddings_input_dim=16 + 6 * 8,
)

# 3. Per-layer-varying down depths (SDXL's [1,2,10] nested style).
VARYING_DEPTHS = configs.UNetConfig(
    block_out_channels=(32, 64),
    layers_per_block=2,
    down_transformer_layers=((0, 1), (1, 2)),
    mid_transformer_layers=2,
    up_transformer_layers=((2, 1, 1), (1, 0, 0)),
    num_attention_heads=(2, 4),
    cross_attention_dim=48,
    addition_time_embed_dim=8,
    projection_class_embeddings_input_dim=16 + 6 * 8,
)

TOL = dict(rtol=2e-4, atol=2e-4)


def _unet_inputs(cfg, b=2, hw=8, seq=7):
    lat = RNG.standard_normal((b, hw, hw, cfg.in_channels), dtype=np.float32)
    t = np.asarray([499.0] * b, dtype=np.float32)
    ctx = RNG.standard_normal((b, seq, cfg.cross_attention_dim), np.float32)
    pooled_dim = cfg.projection_class_embeddings_input_dim - 6 * cfg.addition_time_embed_dim
    pooled = RNG.standard_normal((b, pooled_dim), dtype=np.float32)
    time_ids = np.tile(
        np.asarray([[hw * 8, hw * 8, 0, 0, hw * 8, hw * 8]], np.float32), (b, 1)
    )
    return lat, t, ctx, pooled, time_ids


def _hf_config_dict(cfg):
    """UNetConfig -> the diffusers config.json fields hf_inventory consumes."""
    n = len(cfg.block_out_channels)
    down_types = [
        "CrossAttnDownBlock2D" if any(d) else "DownBlock2D"
        for d in cfg.down_transformer_layers
    ]
    up_types = [
        "CrossAttnUpBlock2D" if any(d) else "UpBlock2D"
        for d in cfg.up_transformer_layers
    ]
    return {
        "in_channels": cfg.in_channels,
        "out_channels": cfg.out_channels,
        "block_out_channels": list(cfg.block_out_channels),
        "layers_per_block": cfg.layers_per_block,
        "transformer_layers_per_block": [
            list(d) for d in cfg.down_transformer_layers
        ],
        "reverse_transformer_layers_per_block": [
            list(d) for d in cfg.up_transformer_layers
        ],
        "mid_block_type": (
            None if cfg.mid_transformer_layers is None
            else "UNetMidBlock2DCrossAttn"
        ),
        "down_block_types": down_types,
        "up_block_types": up_types,
        "num_attention_heads": list(cfg.num_attention_heads),
        "cross_attention_dim": cfg.cross_attention_dim,
        "projection_class_embeddings_input_dim":
            cfg.projection_class_embeddings_input_dim,
    }


@pytest.mark.parametrize(
    "cfg", [SDXL_SHAPED, SSD1B_SHAPED, VARYING_DEPTHS],
    ids=["sdxl-shaped", "ssd1b-shaped", "varying-depths"],
)
def test_full_unet_matches_torch(cfg):
    torch.manual_seed(11)
    ref = TorchUNet2DConditionModel(cfg).eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}

    # The torch assembly must produce EXACTLY the checkpoint inventory the
    # independent oracle predicts — otherwise the golden proves nothing.
    inv = hf_inventory.unet_inventory(_hf_config_dict(cfg))
    assert {k: tuple(v.shape) for k, v in sd.items()} == inv

    params = hf_mapping.convert_unet(sd, cfg, strict=True)
    lat, t, ctx, pooled, time_ids = _unet_inputs(cfg)
    ours = UNet2DConditionModel(cfg).apply(
        {"params": params},
        jnp.asarray(lat), jnp.asarray(t), jnp.asarray(ctx),
        jnp.asarray(pooled), jnp.asarray(time_ids),
    )
    with torch.no_grad():
        theirs = ref(
            torch.from_numpy(lat).permute(0, 3, 1, 2), torch.from_numpy(t),
            torch.from_numpy(ctx), torch.from_numpy(pooled),
            torch.from_numpy(time_ids),
        ).permute(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), **TOL)


@pytest.mark.parametrize(
    "cfg", [SDXL_SHAPED, SSD1B_SHAPED],
    ids=["sdxl-shaped", "ssd1b-shaped"],
)
def test_full_controlnet_into_unet_matches_torch(cfg):
    """End-to-end ControlNet -> UNet residual injection vs torch: catches
    residual ORDER bugs (conv_in vs resnet vs downsample skips) that
    per-model tests cannot."""
    torch.manual_seed(13)
    ccfg = configs.ControlNetConfig(
        unet=cfg, conditioning_embedding_channels=(8, 16)
    )
    ref_cn = TorchControlNetModel(ccfg).eval()
    ref_unet = TorchUNet2DConditionModel(cfg).eval()

    cn_sd = ref_cn.state_dict_diffusers()
    cn_inv = hf_inventory.controlnet_inventory(
        dict(_hf_config_dict(cfg),
             conditioning_embedding_out_channels=[8, 16])
    )
    assert {k: tuple(v.shape) for k, v in cn_sd.items()} == cn_inv

    cn_params = hf_mapping.convert_controlnet(cn_sd, ccfg, strict=True)
    unet_params = hf_mapping.convert_unet(
        {k: v.numpy() for k, v in ref_unet.state_dict().items()}, cfg,
        strict=True,
    )

    lat, t, ctx, pooled, time_ids = _unet_inputs(cfg)
    hw = lat.shape[1]
    cond_px = hw * 2 ** (len(ccfg.conditioning_embedding_channels) - 1)
    cond = RNG.random((2, cond_px, cond_px, 3)).astype(np.float32)
    scale = 0.5

    jl = [jnp.asarray(x) for x in (lat, t, ctx, pooled, time_ids)]
    down, mid = ControlNetModel(ccfg).apply(
        {"params": cn_params}, *jl, jnp.asarray(cond), scale
    )
    ours = UNet2DConditionModel(cfg).apply(
        {"params": unet_params}, *jl,
        down_block_additional_residuals=down,
        mid_block_additional_residual=mid,
    )
    with torch.no_grad():
        tl = [
            torch.from_numpy(lat).permute(0, 3, 1, 2), torch.from_numpy(t),
            torch.from_numpy(ctx), torch.from_numpy(pooled),
            torch.from_numpy(time_ids),
        ]
        t_down, t_mid = ref_cn(
            *tl, torch.from_numpy(cond).permute(0, 3, 1, 2), scale
        )
        theirs = ref_unet(*tl, t_down, t_mid).permute(0, 2, 3, 1)
    for a, b in zip(down, t_down):
        np.testing.assert_allclose(
            np.asarray(a).transpose(0, 3, 1, 2), b.numpy(), **TOL
        )
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), **TOL)


def test_full_vae_matches_torch():
    torch.manual_seed(17)
    cfg = configs.VAEConfig(
        block_out_channels=(16, 32, 32), layers_per_block=1, norm_groups=8
    )
    ref = TorchAutoencoderKL(cfg).eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    inv = hf_inventory.vae_inventory(
        {
            "block_out_channels": list(cfg.block_out_channels),
            "layers_per_block": cfg.layers_per_block,
            "latent_channels": cfg.latent_channels,
            "in_channels": cfg.in_channels,
        }
    )
    assert {k: tuple(v.shape) for k, v in sd.items()} == inv

    params = hf_mapping.convert_vae(sd, cfg, strict=True)
    vae = AutoencoderKL(cfg)
    img = RNG.standard_normal((1, 32, 32, 3)).astype(np.float32)
    mean, logvar = vae.apply(
        {"params": params}, jnp.asarray(img), method=vae.encode_moments
    )
    z = np.asarray(mean)
    dec = vae.apply({"params": params}, jnp.asarray(z), method=vae.decode)
    with torch.no_grad():
        t_mean, t_logvar = ref.encode_moments(
            torch.from_numpy(img).permute(0, 3, 1, 2)
        )
        t_dec = ref.decode(torch.from_numpy(z).permute(0, 3, 1, 2))
    np.testing.assert_allclose(
        np.asarray(mean).transpose(0, 3, 1, 2), t_mean.numpy(), **TOL
    )
    np.testing.assert_allclose(
        np.asarray(logvar).transpose(0, 3, 1, 2), t_logvar.numpy(), **TOL
    )
    np.testing.assert_allclose(
        np.asarray(dec).transpose(0, 3, 1, 2), t_dec.numpy(), **TOL
    )
