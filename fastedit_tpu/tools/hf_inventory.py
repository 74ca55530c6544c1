"""Authoritative HF/diffusers checkpoint key inventories, generated from
config.json contents.

This module is the *independent oracle* for tools/hf_mapping.py: it
enumerates the exact ``state_dict`` keys (with shapes) that the real
HF checkpoints contain, by following the **module construction rules of the
upstream libraries** (diffusers ``UNet2DConditionModel`` /
``ControlNetModel`` / ``AutoencoderKL``, facebookresearch/dino
``VisionTransformer``, torchvision ``squeezenet1_1`` + the lpips heads) —
NOT by reflecting over this repo's Flax param trees.  A converter bug
(misspelled diffusers tensor name, missed conv_shortcut, wrong block count)
therefore fails tests/test_hf_inventory.py instead of surviving a circular
check.

Shapes use torch conventions (Linear [out, in], Conv2d [O, I, kh, kw]).

Construction rules encoded here (diffusers unet_2d_condition.py /
controlnet.py / autoencoder_kl.py at the versions the reference pins,
reference requirements: diffusers>=0.21 at /root/reference/requirements.txt):

  * ResnetBlock2D: norm1/conv1/time_emb_proj/norm2/conv2 (+conv_shortcut
    iff in_channels != out_channels).
  * Transformer2DModel (use_linear_projection=True for SDXL family):
    norm + proj_in/proj_out Linears + per-depth BasicTransformerBlock
    (attn1 self, attn2 cross; q/k/v bias-free, to_out.0 biased; GEGLU ff:
    net.0.proj [8*dim, dim], net.2 [dim, 4*dim]).
  * Down path: block i input channel = block_out[i-1] (block_out[0] after
    conv_in); downsamplers.0 on every block but the last.
  * Up path: resnet j input = (prev_output if j==0 else out) + skip, where
    skip = in_channel for the last resnet else out_channel; upsamplers.0 on
    every block but the last.
  * ControlNet: UNet encoder clone + controlnet_cond_embedding (2 convs per
    channel step) + one 1x1 zero conv per down-path output + mid zero conv.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

Shape = Tuple[int, ...]
Inventory = Dict[str, Shape]


# --------------------------------------------------------------------------
# shared pieces
# --------------------------------------------------------------------------


def _resnet(inv: Inventory, p: str, cin: int, cout: int, temb: Optional[int]):
    inv[f"{p}.norm1.weight"] = (cin,)
    inv[f"{p}.norm1.bias"] = (cin,)
    inv[f"{p}.conv1.weight"] = (cout, cin, 3, 3)
    inv[f"{p}.conv1.bias"] = (cout,)
    if temb is not None:
        inv[f"{p}.time_emb_proj.weight"] = (cout, temb)
        inv[f"{p}.time_emb_proj.bias"] = (cout,)
    inv[f"{p}.norm2.weight"] = (cout,)
    inv[f"{p}.norm2.bias"] = (cout,)
    inv[f"{p}.conv2.weight"] = (cout, cout, 3, 3)
    inv[f"{p}.conv2.bias"] = (cout,)
    if cin != cout:
        inv[f"{p}.conv_shortcut.weight"] = (cout, cin, 1, 1)
        inv[f"{p}.conv_shortcut.bias"] = (cout,)


def _attention(inv: Inventory, p: str, dim: int, cross: Optional[int]):
    kv = cross if cross is not None else dim
    inv[f"{p}.to_q.weight"] = (dim, dim)
    inv[f"{p}.to_k.weight"] = (dim, kv)
    inv[f"{p}.to_v.weight"] = (dim, kv)
    inv[f"{p}.to_out.0.weight"] = (dim, dim)
    inv[f"{p}.to_out.0.bias"] = (dim,)


def _ln(inv: Inventory, p: str, dim: int):
    inv[f"{p}.weight"] = (dim,)
    inv[f"{p}.bias"] = (dim,)


def _transformer2d(inv: Inventory, p: str, dim: int, depth: int, cross: int):
    _ln(inv, f"{p}.norm", dim)  # GroupNorm(32, dim)
    inv[f"{p}.proj_in.weight"] = (dim, dim)
    inv[f"{p}.proj_in.bias"] = (dim,)
    for k in range(depth):
        b = f"{p}.transformer_blocks.{k}"
        _ln(inv, f"{b}.norm1", dim)
        _attention(inv, f"{b}.attn1", dim, None)
        _ln(inv, f"{b}.norm2", dim)
        _attention(inv, f"{b}.attn2", dim, cross)
        _ln(inv, f"{b}.norm3", dim)
        inv[f"{b}.ff.net.0.proj.weight"] = (8 * dim, dim)
        inv[f"{b}.ff.net.0.proj.bias"] = (8 * dim,)
        inv[f"{b}.ff.net.2.weight"] = (dim, 4 * dim)
        inv[f"{b}.ff.net.2.bias"] = (dim,)
    inv[f"{p}.proj_out.weight"] = (dim, dim)
    inv[f"{p}.proj_out.bias"] = (dim,)


def _conv2d(inv: Inventory, p: str, cout: int, cin: int, k: int):
    inv[f"{p}.weight"] = (cout, cin, k, k)
    inv[f"{p}.bias"] = (cout,)


def _unet_down_depths(cfg: Dict[str, Any]) -> List[List[int]]:
    n = len(cfg["block_out_channels"])
    layers = int(cfg.get("layers_per_block", 2))
    tlpb = cfg.get("transformer_layers_per_block", 1)
    if isinstance(tlpb, int):
        tlpb = [tlpb] * n
    out = []
    down_types = cfg["down_block_types"]
    for i in range(n):
        if down_types[i] != "CrossAttnDownBlock2D":
            out.append([0] * layers)
        elif isinstance(tlpb[i], (list, tuple)):
            out.append([int(x) for x in tlpb[i]])
        else:
            out.append([int(tlpb[i])] * layers)
    return out


def _unet_up_depths(cfg: Dict[str, Any]) -> List[List[int]]:
    n = len(cfg["block_out_channels"])
    layers = int(cfg.get("layers_per_block", 2))
    rev = cfg.get("reverse_transformer_layers_per_block")
    up_types = cfg["up_block_types"]
    if rev is None:
        tlpb = cfg.get("transformer_layers_per_block", 1)
        if isinstance(tlpb, int):
            tlpb = [tlpb] * n
        rev = [[int(tlpb[n - 1 - i])] * (layers + 1) for i in range(n)]
    out = []
    for i in range(n):
        if up_types[i] != "CrossAttnUpBlock2D":
            out.append([0] * (layers + 1))
        elif isinstance(rev[i], (list, tuple)):
            out.append([int(x) for x in rev[i]])
        else:
            out.append([int(rev[i])] * (layers + 1))
    return out


def _heads(cfg: Dict[str, Any]) -> List[int]:
    n = len(cfg["block_out_channels"])
    h = cfg.get("num_attention_heads") or cfg["attention_head_dim"]
    return [h] * n if isinstance(h, int) else list(h)


def _unet_embeddings(inv: Inventory, cfg: Dict[str, Any], temb: int):
    c0 = cfg["block_out_channels"][0]
    inv["time_embedding.linear_1.weight"] = (temb, c0)
    inv["time_embedding.linear_1.bias"] = (temb,)
    inv["time_embedding.linear_2.weight"] = (temb, temb)
    inv["time_embedding.linear_2.bias"] = (temb,)
    proj_dim = cfg["projection_class_embeddings_input_dim"]
    inv["add_embedding.linear_1.weight"] = (temb, proj_dim)
    inv["add_embedding.linear_1.bias"] = (temb,)
    inv["add_embedding.linear_2.weight"] = (temb, temb)
    inv["add_embedding.linear_2.bias"] = (temb,)


def _unet_down_path(inv: Inventory, cfg: Dict[str, Any], temb: int):
    chans = list(cfg["block_out_channels"])
    n = len(chans)
    layers = int(cfg.get("layers_per_block", 2))
    depths = _unet_down_depths(cfg)
    cross = cfg["cross_attention_dim"]
    # (head count does not change the key inventory — dim = block channels)
    output_channel = chans[0]
    for i in range(n):
        input_channel = output_channel
        output_channel = chans[i]
        p = f"down_blocks.{i}"
        for j in range(layers):
            cin = input_channel if j == 0 else output_channel
            _resnet(inv, f"{p}.resnets.{j}", cin, output_channel, temb)
            if depths[i][j] > 0:
                _transformer2d(
                    inv, f"{p}.attentions.{j}", output_channel, depths[i][j], cross
                )
        if i < n - 1:
            _conv2d(inv, f"{p}.downsamplers.0.conv", output_channel, output_channel, 3)


def _unet_mid(inv: Inventory, cfg: Dict[str, Any], temb: int):
    mid_type = cfg.get("mid_block_type", "UNetMidBlock2DCrossAttn")
    if mid_type is None:
        return
    c = cfg["block_out_channels"][-1]
    _resnet(inv, "mid_block.resnets.0", c, c, temb)
    if mid_type == "UNetMidBlock2DCrossAttn":
        tlpb = cfg.get("transformer_layers_per_block", 1)
        depth = tlpb[-1] if isinstance(tlpb, (list, tuple)) else tlpb
        if isinstance(depth, (list, tuple)):  # nested config: mid uses last
            depth = depth[-1]
        _transformer2d(
            inv, "mid_block.attentions.0", c, int(depth), cfg["cross_attention_dim"]
        )
    _resnet(inv, "mid_block.resnets.1", c, c, temb)


def unet_inventory(cfg: Dict[str, Any]) -> Inventory:
    """diffusers UNet2DConditionModel state_dict inventory (SDXL family)."""
    inv: Inventory = {}
    chans = list(cfg["block_out_channels"])
    n = len(chans)
    layers = int(cfg.get("layers_per_block", 2))
    temb = 4 * chans[0]
    cross = cfg["cross_attention_dim"]

    _conv2d(inv, "conv_in", chans[0], cfg.get("in_channels", 4), 3)
    _unet_embeddings(inv, cfg, temb)
    _unet_down_path(inv, cfg, temb)
    _unet_mid(inv, cfg, temb)

    up_depths = _unet_up_depths(cfg)
    reversed_chans = list(reversed(chans))
    output_channel = reversed_chans[0]
    for i in range(n):
        prev_output = output_channel
        output_channel = reversed_chans[i]
        input_channel = reversed_chans[min(i + 1, n - 1)]
        p = f"up_blocks.{i}"
        for j in range(layers + 1):
            skip = input_channel if j == layers else output_channel
            cin = (prev_output if j == 0 else output_channel) + skip
            _resnet(inv, f"{p}.resnets.{j}", cin, output_channel, temb)
            if up_depths[i][j] > 0:
                _transformer2d(
                    inv, f"{p}.attentions.{j}", output_channel, up_depths[i][j], cross
                )
        if i < n - 1:
            _conv2d(inv, f"{p}.upsamplers.0.conv", output_channel, output_channel, 3)

    c0 = chans[0]
    _ln(inv, "conv_norm_out", c0)
    _conv2d(inv, "conv_out", cfg.get("out_channels", 4), c0, 3)
    return inv


def controlnet_inventory(cfg: Dict[str, Any]) -> Inventory:
    """diffusers ControlNetModel state_dict inventory."""
    inv: Inventory = {}
    chans = list(cfg["block_out_channels"])
    n = len(chans)
    layers = int(cfg.get("layers_per_block", 2))
    temb = 4 * chans[0]

    _conv2d(inv, "conv_in", chans[0], cfg.get("in_channels", 4), 3)
    _unet_embeddings(inv, cfg, temb)
    _unet_down_path(inv, cfg, temb)
    _unet_mid(inv, cfg, temb)

    emb_chans = list(
        cfg.get("conditioning_embedding_out_channels", (16, 32, 96, 256))
    )
    cond_in = cfg.get("conditioning_channels", 3)
    _conv2d(inv, "controlnet_cond_embedding.conv_in", emb_chans[0], cond_in, 3)
    k = 0
    for i in range(len(emb_chans) - 1):
        _conv2d(
            inv, f"controlnet_cond_embedding.blocks.{k}", emb_chans[i], emb_chans[i], 3
        )
        _conv2d(
            inv,
            f"controlnet_cond_embedding.blocks.{k + 1}",
            emb_chans[i + 1],
            emb_chans[i],
            3,
        )
        k += 2
    _conv2d(inv, "controlnet_cond_embedding.conv_out", chans[0], emb_chans[-1], 3)

    # one zero conv per down-path output: conv_in, then per block each resnet
    # output + the downsample output (all blocks but the last).
    out_chans = [chans[0]]
    for i in range(n):
        out_chans.extend([chans[i]] * layers)
        if i < n - 1:
            out_chans.append(chans[i])
    for idx, c in enumerate(out_chans):
        _conv2d(inv, f"controlnet_down_blocks.{idx}", c, c, 1)
    _conv2d(inv, "controlnet_mid_block", chans[-1], chans[-1], 1)
    return inv


# --------------------------------------------------------------------------
# VAE (diffusers AutoencoderKL, modern to_q/to_k/to_v attention naming)
# --------------------------------------------------------------------------


def vae_inventory(cfg: Dict[str, Any]) -> Inventory:
    inv: Inventory = {}
    chans = list(cfg["block_out_channels"])
    n = len(chans)
    layers = int(cfg.get("layers_per_block", 2))
    zc = cfg.get("latent_channels", 4)
    img_c = cfg.get("in_channels", 3)

    def mid(p: str, c: int):
        _resnet(inv, f"{p}.resnets.0", c, c, None)
        a = f"{p}.attentions.0"
        _ln(inv, f"{a}.group_norm", c)
        for q in ("to_q", "to_k", "to_v"):
            inv[f"{a}.{q}.weight"] = (c, c)
            inv[f"{a}.{q}.bias"] = (c,)
        inv[f"{a}.to_out.0.weight"] = (c, c)
        inv[f"{a}.to_out.0.bias"] = (c,)
        _resnet(inv, f"{p}.resnets.1", c, c, None)

    # encoder
    _conv2d(inv, "encoder.conv_in", chans[0], img_c, 3)
    output_channel = chans[0]
    for i in range(n):
        input_channel = output_channel
        output_channel = chans[i]
        for j in range(layers):
            cin = input_channel if j == 0 else output_channel
            _resnet(inv, f"encoder.down_blocks.{i}.resnets.{j}", cin, output_channel, None)
        if i < n - 1:
            _conv2d(
                inv,
                f"encoder.down_blocks.{i}.downsamplers.0.conv",
                output_channel,
                output_channel,
                3,
            )
    mid("encoder.mid_block", chans[-1])
    _ln(inv, "encoder.conv_norm_out", chans[-1])
    _conv2d(inv, "encoder.conv_out", 2 * zc, chans[-1], 3)

    # decoder
    rev = list(reversed(chans))
    _conv2d(inv, "decoder.conv_in", rev[0], zc, 3)
    mid("decoder.mid_block", rev[0])
    output_channel = rev[0]
    for i in range(n):
        input_channel = output_channel
        output_channel = rev[i]
        for j in range(layers + 1):
            cin = input_channel if j == 0 else output_channel
            _resnet(inv, f"decoder.up_blocks.{i}.resnets.{j}", cin, output_channel, None)
        if i < n - 1:
            _conv2d(
                inv,
                f"decoder.up_blocks.{i}.upsamplers.0.conv",
                output_channel,
                output_channel,
                3,
            )
    _ln(inv, "decoder.conv_norm_out", chans[0])
    _conv2d(inv, "decoder.conv_out", img_c, chans[0], 3)

    inv["quant_conv.weight"] = (2 * zc, 2 * zc, 1, 1)
    inv["quant_conv.bias"] = (2 * zc,)
    inv["post_quant_conv.weight"] = (zc, zc, 1, 1)
    inv["post_quant_conv.bias"] = (zc,)
    return inv


# --------------------------------------------------------------------------
# facebookresearch/dino VisionTransformer (torch.hub dino_vitb8 etc.)
# --------------------------------------------------------------------------


def dino_vit_inventory(
    embed_dim: int = 768,
    depth: int = 12,
    patch_size: int = 8,
    image_size: int = 224,
) -> Inventory:
    inv: Inventory = {}
    n_tokens = (image_size // patch_size) ** 2 + 1
    inv["cls_token"] = (1, 1, embed_dim)
    inv["pos_embed"] = (1, n_tokens, embed_dim)
    inv["patch_embed.proj.weight"] = (embed_dim, 3, patch_size, patch_size)
    inv["patch_embed.proj.bias"] = (embed_dim,)
    for i in range(depth):
        b = f"blocks.{i}"
        _ln(inv, f"{b}.norm1", embed_dim)
        inv[f"{b}.attn.qkv.weight"] = (3 * embed_dim, embed_dim)
        inv[f"{b}.attn.qkv.bias"] = (3 * embed_dim,)
        inv[f"{b}.attn.proj.weight"] = (embed_dim, embed_dim)
        inv[f"{b}.attn.proj.bias"] = (embed_dim,)
        _ln(inv, f"{b}.norm2", embed_dim)
        inv[f"{b}.mlp.fc1.weight"] = (4 * embed_dim, embed_dim)
        inv[f"{b}.mlp.fc1.bias"] = (4 * embed_dim,)
        inv[f"{b}.mlp.fc2.weight"] = (embed_dim, 4 * embed_dim)
        inv[f"{b}.mlp.fc2.bias"] = (embed_dim,)
    _ln(inv, "norm", embed_dim)  # final LayerNorm (present in the checkpoint)
    return inv


# --------------------------------------------------------------------------
# torchvision squeezenet1_1 features + lpips SqueezeNet heads
# --------------------------------------------------------------------------

# (index, squeeze_ch, expand_ch, in_ch) for each Fire module in features.
_SQUEEZENET11_FIRES = [
    (3, 16, 64, 64),
    (4, 16, 64, 128),
    (6, 32, 128, 128),
    (7, 32, 128, 256),
    (9, 48, 192, 256),
    (10, 48, 192, 384),
    (11, 64, 256, 384),
    (12, 64, 256, 512),
]

# lpips SqueezeNet tap channels (7 slices).
LPIPS_SQUEEZE_CHANNELS = [64, 128, 256, 384, 384, 512, 512]


def squeezenet_features_inventory() -> Inventory:
    inv: Inventory = {}
    _conv2d(inv, "features.0", 64, 3, 3)
    for idx, s, e, cin in _SQUEEZENET11_FIRES:
        _conv2d(inv, f"features.{idx}.squeeze", s, cin, 1)
        _conv2d(inv, f"features.{idx}.expand1x1", e, s, 1)
        inv[f"features.{idx}.expand3x3.weight"] = (e, s, 3, 3)
        inv[f"features.{idx}.expand3x3.bias"] = (e,)
    return inv


def lpips_heads_inventory() -> Inventory:
    return {
        f"lin{i}.model.1.weight": (1, c, 1, 1)
        for i, c in enumerate(LPIPS_SQUEEZE_CHANNELS)
    }


def param_count(inv: Inventory) -> int:
    total = 0
    for shape in inv.values():
        p = 1
        for d in shape:
            p *= d
        total += p
    return total
