"""VMEM-cap regression for the Pallas 3x3 conv tile selection (ADVICE r4).

``conv3x3._pick_tiles`` deliberately *selects* tiles with an optimistic
input-slab term (``w + 2`` columns instead of the lane-padded width the
kernel actually allocates) and relies on the honest term's hard cap as the
safety net.  This test walks the STATIC conv-shape inventory the flagship
models actually dispatch (SSD-1B + SDXL UNet, ControlNet-small, SDXL VAE at
1024² — every 3x3 conv the denoise loop and decoder can route to Pallas)
and re-derives the honest VMEM bytes for each selected tile, so a future
edit to ``VMEM_TILE_BUDGET`` / ``VMEM_HARD_CAP`` cannot silently admit an
over-cap tile for a shape the benchmarks never exercised.
"""

import pytest

from fastedit_tpu.models import configs
from fastedit_tpu.ops import conv3x3


def _unet_conv_shapes(cfg: configs.UNetConfig, lat_hw: int):
    """(h, w, cin, cout) of every 3x3 conv in one UNet forward."""
    chans = list(cfg.block_out_channels)
    n = len(chans)
    shapes = [(lat_hw, lat_hw, cfg.in_channels, chans[0])]
    hw = lat_hw
    out_ch = chans[0]
    for i in range(n):
        in_ch, out_ch = out_ch, chans[i]
        for j in range(len(cfg.down_transformer_layers[i])):
            cin = in_ch if j == 0 else out_ch
            shapes += [(hw, hw, cin, out_ch), (hw, hw, out_ch, out_ch)]
        if i < n - 1:
            shapes.append((hw, hw, out_ch, out_ch))  # stride-2 downsample
            hw //= 2
    if cfg.mid_transformer_layers is not None:
        c = chans[-1]
        shapes += [(hw, hw, c, c)] * 4
    rev = list(reversed(chans))
    out_ch = rev[0]
    for i in range(n):
        prev, out_ch = out_ch, rev[i]
        skip_res = rev[min(i + 1, n - 1)]
        L = cfg.layers_per_block + 1
        for j in range(L):
            skip = skip_res if j == L - 1 else out_ch
            cin = (prev if j == 0 else out_ch) + skip
            shapes += [(hw, hw, cin, out_ch), (hw, hw, out_ch, out_ch)]
        if i < n - 1:
            hw *= 2
            # upsample conv runs at the upsampled resolution (and the
            # fused up2 variant reads the pre-upsample tile — the plain
            # post-upsample shape is the VMEM-heavier one, checked here)
            shapes.append((hw, hw, out_ch, out_ch))
    shapes.append((lat_hw, lat_hw, chans[0], cfg.out_channels))
    return shapes


def _vae_conv_shapes(cfg: configs.VAEConfig, px: int):
    chans = list(cfg.block_out_channels)
    n = len(chans)
    shapes = [(px, px, cfg.in_channels, chans[0])]
    hw = px
    out_ch = chans[0]
    for i in range(n):
        in_ch, out_ch = out_ch, chans[i]
        for j in range(cfg.layers_per_block):
            cin = in_ch if j == 0 else out_ch
            shapes += [(hw, hw, cin, out_ch), (hw, hw, out_ch, out_ch)]
        if i < n - 1:
            shapes.append((hw, hw, out_ch, out_ch))
            hw //= 2
    shapes += [(hw, hw, chans[-1], chans[-1])] * 4  # two mid resnets
    shapes.append((hw, hw, chans[-1], 2 * cfg.latent_channels))
    # decoder
    rev = list(reversed(chans))
    shapes.append((hw, hw, cfg.latent_channels, rev[0]))
    shapes += [(hw, hw, rev[0], rev[0])] * 4
    out_ch = rev[0]
    for i in range(n):
        in_ch, out_ch = out_ch, rev[i]
        for j in range(cfg.layers_per_block + 1):
            cin = in_ch if j == 0 else out_ch
            shapes += [(hw, hw, cin, out_ch), (hw, hw, out_ch, out_ch)]
        if i < n - 1:
            hw *= 2
            shapes.append((hw, hw, out_ch, out_ch))
    shapes.append((hw, hw, chans[0], cfg.in_channels))
    return shapes


def _inventory():
    lat = 1024 // configs.SDXL_VAE.downscale_factor
    shapes = set()
    for ucfg in (configs.SSD1B_UNET, configs.SDXL_UNET):
        shapes.update(_unet_conv_shapes(ucfg, lat))
    for ccfg in (configs.SDXL_CONTROLNET_SMALL, configs.SDXL_CONTROLNET_FULL):
        shapes.update(_unet_conv_shapes(ccfg.unet, lat))
        # cond embedding tower at pixel resolution
        ch = list(ccfg.conditioning_embedding_channels)
        hw = 1024
        shapes.add((hw, hw, ccfg.conditioning_channels, ch[0]))
        for i in range(len(ch) - 1):
            shapes.add((hw, hw, ch[i], ch[i]))
            hw //= 2
            shapes.add((hw, hw, ch[i], ch[i + 1]))
        shapes.add((hw, hw, ch[-1], ccfg.unet.block_out_channels[0]))
    shapes.update(_vae_conv_shapes(configs.SDXL_VAE, 1024))
    return sorted(shapes)


@pytest.mark.parametrize("itemsize", [2, 4], ids=["bf16", "fp32"])
def test_selected_tiles_honestly_fit_vmem_cap(itemsize):
    checked = 0
    for h, w, cin, cout in _inventory():
        if not conv3x3.supports((1, h, w, cin), (3, 3, cin, cout), itemsize):
            continue
        cin_eff = -(-cin // 128) * 128
        cout_eff = -(-cout // 128) * 128
        tiles = conv3x3._pick_tiles(h, w, cin_eff, cout_eff, itemsize)
        assert tiles is not None
        ht, co = tiles
        xs_true = 2 * (ht + 2) * conv3x3._lane_pad(w) * cin_eff * itemsize
        rest = h_rest = (
            ht * w * co * 4  # fp32 accumulator
            + ht * w * co * itemsize  # output tile
            + 9 * cin_eff * co * itemsize  # weights
        )
        assert xs_true + rest <= conv3x3.VMEM_HARD_CAP, (
            f"shape h={h} w={w} cin={cin}({cin_eff}) cout={cout}({cout_eff}) "
            f"tile (ht={ht}, co={co}): honest bytes "
            f"{(xs_true + h_rest)/2**20:.1f} MB > hard cap "
            f"{conv3x3.VMEM_HARD_CAP/2**20:.0f} MB"
        )
        checked += 1
    # the inventory must actually exercise the kernel's coverage — the
    # denoise loop and decoder route dozens of distinct shapes to Pallas
    assert checked >= (20 if itemsize == 2 else 10), checked


def test_supported_coverage_includes_decoder_and_loop_shapes():
    """The headline coverage claims: every VAE-decoder 512-ch conv and the
    UNet 1280-ch loop convs must stay Pallas-eligible in bf16 (partial
    coverage regressions reopen the layout war, see conv3x3 docstring)."""
    for h, w, cin, cout in [
        (256, 256, 512, 512),  # decoder up-path workhorse
        (512, 512, 256, 256),
        (32, 32, 1280, 1280),  # deep loop conv
        (64, 64, 640, 640),
        (128, 128, 320, 320),
    ]:
        assert conv3x3.supports((1, h, w, cin), (3, 3, cin, cout), 2), (
            h, w, cin, cout,
        )
