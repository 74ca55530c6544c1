"""Composite-block golden tests vs raw torch (round-3 verdict Next #5).

diffusers cannot be installed here, so these tests assemble diffusers'
composite modules in raw torch, following the construction rules
``fastedit_tpu/tools/hf_inventory.py`` encodes (ResnetBlock2D topology,
Transformer2DModel with use_linear_projection=True, BasicTransformerBlock
with bias-free q/k/v + GEGLU ff — the module zoo the reference binds at
/root/reference/src/pipeline.py:8-14).  The torch state dicts are converted
through the real ``tools/hf_mapping`` helpers and FULL block outputs are
compared at fp32 tolerances — catching composition/order bugs (residual
placement, time-emb injection point, norm eps, GEGLU chunk order) that the
per-op goldens in test_golden_torch.py cannot.
"""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from fastedit_tpu.models.layers import BasicTransformerBlock, Transformer2DModel
from fastedit_tpu.models.resnet import ResnetBlock2D
from fastedit_tpu.tools import hf_mapping
from fastedit_tpu.tools.hf_mapping import _SD

RNG = np.random.default_rng(42)


# --------------------------------------------------------------------------
# torch reference modules (diffusers semantics, diffusers state-dict names)
# --------------------------------------------------------------------------


class TorchResnetBlock2D(nn.Module):
    """diffusers ResnetBlock2D, default config (time_embedding_norm=
    "default", output_scale_factor=1, non_linearity=silu)."""

    def __init__(self, cin, cout, temb_dim, groups=32, eps=1e-5):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, cin, eps=eps)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        if temb_dim is not None:  # VAE resnets have no time embedding
            self.time_emb_proj = nn.Linear(temb_dim, cout)
        self.norm2 = nn.GroupNorm(groups, cout, eps=eps)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = (
            nn.Conv2d(cin, cout, 1) if cin != cout else None
        )

    def forward(self, x, temb):
        h = F.silu(self.norm1(x))
        h = self.conv1(h)
        if temb is not None:
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = F.silu(self.norm2(h))
        h = self.conv2(h)
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class TorchAttention(nn.Module):
    """diffusers Attention: bias-free q/k/v, to_out = [Linear, Dropout]."""

    def __init__(self, dim, heads, head_dim, cross_dim=None):
        super().__init__()
        inner = heads * head_dim
        kv = cross_dim if cross_dim is not None else dim
        self.heads = heads
        self.head_dim = head_dim
        self.to_q = nn.Linear(dim, inner, bias=False)
        self.to_k = nn.Linear(kv, inner, bias=False)
        self.to_v = nn.Linear(kv, inner, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(inner, dim), nn.Dropout(0.0)])

    def forward(self, x, context=None):
        ctx = x if context is None else context
        b, sq, _ = x.shape

        def heads(t):
            return t.view(b, -1, self.heads, self.head_dim).permute(0, 2, 1, 3)

        out = F.scaled_dot_product_attention(
            heads(self.to_q(x)), heads(self.to_k(ctx)), heads(self.to_v(ctx))
        )
        out = out.permute(0, 2, 1, 3).reshape(b, sq, -1)
        return self.to_out[1](self.to_out[0](out))


class TorchGEGLU(nn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = nn.Linear(dim, 2 * inner)

    def forward(self, x):
        value, gate = self.proj(x).chunk(2, dim=-1)
        return value * F.gelu(gate)


class TorchFeedForward(nn.Module):
    """diffusers FeedForward: net = [GEGLU, Dropout, Linear]."""

    def __init__(self, dim, mult=4):
        super().__init__()
        self.net = nn.ModuleList(
            [TorchGEGLU(dim, dim * mult), nn.Dropout(0.0), nn.Linear(dim * mult, dim)]
        )

    def forward(self, x):
        for m in self.net:
            x = m(x)
        return x


class TorchBasicTransformerBlock(nn.Module):
    def __init__(self, dim, heads, head_dim, cross_dim):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = TorchAttention(dim, heads, head_dim)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = TorchAttention(dim, heads, head_dim, cross_dim)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = TorchFeedForward(dim)

    def forward(self, x, context):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), context)
        x = x + self.ff(self.norm3(x))
        return x


class TorchTransformer2DModel(nn.Module):
    """diffusers Transformer2DModel, use_linear_projection=True (SDXL)."""

    def __init__(self, channels, heads, head_dim, depth, cross_dim):
        super().__init__()
        inner = heads * head_dim
        self.norm = nn.GroupNorm(32, channels, eps=1e-6)
        self.proj_in = nn.Linear(channels, inner)
        self.transformer_blocks = nn.ModuleList(
            [
                TorchBasicTransformerBlock(inner, heads, head_dim, cross_dim)
                for _ in range(depth)
            ]
        )
        self.proj_out = nn.Linear(inner, channels)

    def forward(self, x, context):
        b, c, h, w = x.shape
        residual = x
        x = self.norm(x)
        x = x.permute(0, 2, 3, 1).reshape(b, h * w, c)
        x = self.proj_in(x)
        for block in self.transformer_blocks:
            x = block(x, context)
        x = self.proj_out(x)
        return x.reshape(b, h, w, c).permute(0, 3, 1, 2) + residual


# --------------------------------------------------------------------------
# goldens
# --------------------------------------------------------------------------


def _np_sd(mod):
    return {k: v.numpy() for k, v in mod.state_dict().items()}


def test_resnet_block_matches_torch():
    torch.manual_seed(0)
    cin, cout, temb_dim = 32, 64, 24
    ref = TorchResnetBlock2D(cin, cout, temb_dim).eval()
    params = hf_mapping._resnet(
        _SD({f"blk.{k}": v for k, v in _np_sd(ref).items()}), "blk"
    )
    assert "conv_shortcut" in params

    x = RNG.standard_normal((2, 8, 8, cin), dtype=np.float32)
    temb = RNG.standard_normal((2, temb_dim), dtype=np.float32)
    ours = ResnetBlock2D(out_channels=cout).apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(temb)
    )
    with torch.no_grad():
        theirs = ref(
            torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(temb)
        ).permute(0, 2, 3, 1)
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy(), rtol=1e-4, atol=1e-4
    )


def test_resnet_block_no_shortcut_matches_torch():
    torch.manual_seed(1)
    c, temb_dim = 32, 16
    ref = TorchResnetBlock2D(c, c, temb_dim).eval()
    params = hf_mapping._resnet(
        _SD({f"blk.{k}": v for k, v in _np_sd(ref).items()}), "blk"
    )
    assert "conv_shortcut" not in params

    x = RNG.standard_normal((1, 8, 8, c), dtype=np.float32)
    temb = RNG.standard_normal((1, temb_dim), dtype=np.float32)
    ours = ResnetBlock2D(out_channels=c).apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(temb)
    )
    with torch.no_grad():
        theirs = ref(
            torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(temb)
        ).permute(0, 2, 3, 1)
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy(), rtol=1e-4, atol=1e-4
    )


def test_basic_transformer_block_matches_torch():
    torch.manual_seed(2)
    dim, heads, head_dim, cross = 32, 2, 16, 48
    ref = TorchBasicTransformerBlock(dim, heads, head_dim, cross).eval()
    params = hf_mapping._transformer_block(
        _SD({f"b.{k}": v for k, v in _np_sd(ref).items()}), "b"
    )

    x = RNG.standard_normal((2, 16, dim), dtype=np.float32)
    ctx = RNG.standard_normal((2, 7, cross), dtype=np.float32)
    ours = BasicTransformerBlock(dim=dim, heads=heads, head_dim=head_dim).apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(ctx)
    )
    with torch.no_grad():
        theirs = ref(torch.from_numpy(x), torch.from_numpy(ctx))
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy(), rtol=1e-4, atol=1e-4
    )


def test_transformer2d_depth2_matches_torch():
    """Full 2-depth Transformer2DModel: GroupNorm(eps 1e-6) -> linear
    proj_in -> 2 blocks (scanned stack on our side) -> proj_out -> residual."""
    torch.manual_seed(3)
    channels, heads, head_dim, depth, cross = 32, 2, 16, 2, 48
    ref = TorchTransformer2DModel(channels, heads, head_dim, depth, cross).eval()
    params = hf_mapping._transformer2d(
        _SD({f"t.{k}": v for k, v in _np_sd(ref).items()}), "t", depth
    )

    x = RNG.standard_normal((2, 4, 4, channels), dtype=np.float32)
    ctx = RNG.standard_normal((2, 7, cross), dtype=np.float32)
    ours = Transformer2DModel(depth=depth, heads=heads, head_dim=head_dim).apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(ctx)
    )
    with torch.no_grad():
        theirs = ref(
            torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(ctx)
        ).permute(0, 2, 3, 1)
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy(), rtol=1e-4, atol=1e-4
    )


class TorchCondEmbedding(nn.Module):
    """diffusers ControlNetConditioningEmbedding: conv_in -> alternating
    (stride-1, stride-2) conv+silu pairs -> conv_out, ALL pad=1 (torch
    (1,1) at stride 2 — Flax "SAME" pads (0,1) there, the round-4 bug)."""

    def __init__(self, channels, cond_channels, out_channels):
        super().__init__()
        self.conv_in = nn.Conv2d(cond_channels, channels[0], 3, padding=1)
        blocks = []
        for i in range(len(channels) - 1):
            blocks.append(nn.Conv2d(channels[i], channels[i], 3, padding=1))
            blocks.append(
                nn.Conv2d(channels[i], channels[i + 1], 3, padding=1, stride=2)
            )
        self.blocks = nn.ModuleList(blocks)
        # zero-initialized in diffusers; random here so the golden test
        # actually observes the tower output
        self.conv_out = nn.Conv2d(channels[-1], out_channels, 3, padding=1)

    def forward(self, cond):
        x = F.silu(self.conv_in(cond))
        for block in self.blocks:
            x = F.silu(block(x))
        return self.conv_out(x)


def test_controlnet_cond_embedding_matches_torch():
    """The full conditioning tower at even sizes: catches the stride-2
    padding-grid mismatch (torch pad (1,1) vs Flax SAME (0,1)) that shifts
    every cond feature one pixel against trained weights."""
    from fastedit_tpu.models.controlnet import ConditioningEmbedding

    torch.manual_seed(4)
    channels = (8, 16, 32)
    ref = TorchCondEmbedding(channels, 3, 24).eval()
    emb = _SD({f"e.{k}": v for k, v in _np_sd(ref).items()}).scoped("e.")
    params = {
        "conv_in": hf_mapping._conv2d(emb, "conv_in"),
        "conv_out": hf_mapping._conv2d(emb, "conv_out"),
    }
    for k in range(2 * (len(channels) - 1)):
        params[f"blocks_{k}"] = hf_mapping._conv2d(emb, f"blocks.{k}")

    x = RNG.standard_normal((1, 16, 16, 3), dtype=np.float32)
    ours = ConditioningEmbedding(channels=channels, out_channels=24).apply(
        {"params": params}, jnp.asarray(x)
    )
    with torch.no_grad():
        theirs = ref(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
    assert ours.shape == tuple(theirs.shape)
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy(), rtol=1e-4, atol=1e-4
    )
