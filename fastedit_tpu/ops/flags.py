"""Global kernel-dispatch flags.

Every hot op has two implementations: a Pallas TPU kernel and a pure-XLA
reference (SURVEY.md §7: "Everything falls back to pure-XLA reference
implementations selected by flag, so correctness never depends on Pallas").
The flags below pick the implementation; tests pin them per-case.

Defaults: Pallas on TPU backends, XLA elsewhere (Pallas TPU kernels cannot
run on the CPU backend except in interpret mode).

CAVEAT — flags are read at TRACE time, and jit caches are keyed only on
shapes/dtypes/static args.  Toggling a flag after a stage has been traced
silently reuses the previously compiled variant.  For a warm
``FastEditor`` call ``editor._rebuild_stages()`` after changing flags (the
A/B harnesses in bench_conv.py / profile_edit.py do exactly this); tests
use :func:`override` around editor construction, not around calls.
"""

from __future__ import annotations

import contextlib
import dataclasses

import jax


@dataclasses.dataclass
class KernelFlags:
    use_pallas_attention: bool | None = None  # None = auto (TPU yes, CPU no)
    use_pallas_groupnorm: bool | None = None
    use_pallas_conv: bool | None = None  # None = auto (TPU yes, CPU no)
    use_fused_resnet: bool | None = None  # None = follow use_pallas_conv()
    use_fused_up2: bool | None = None  # None = follow use_pallas_conv()
    use_fused_down2: bool | None = None  # None = follow use_pallas_conv()
    pallas_interpret: bool = False  # run Pallas kernels interpreted (debug/CPU)


FLAGS = KernelFlags()


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def use_pallas_attention() -> bool:
    if FLAGS.use_pallas_attention is None:
        return _on_tpu()
    return FLAGS.use_pallas_attention


def use_pallas_conv() -> bool:
    """Pallas 3x3 conv in unmeasured contexts (VAE *encoder* & friends).

    Off by default.  The denoise loop and the VAE decoder have their own
    measured defaults (use_pallas_conv_denoise / use_pallas_conv_decode,
    both ON on TPU); everything else keeps XLA because the encoder A/B
    (bench_conv.py encode, repeated interleaved arms, v5e) measured XLA
    43.7-44.4 ms vs fused Pallas 55.7-56.7 vs bare 62.0: the encoder's
    stride-2 downsample convs stay XLA (the kernel is stride-1 SAME
    only), so Pallas coverage is partial and the layout war resumes
    (row-major T(8,128) custom-calls vs conv-preferred
    {3,0,2,1:T(2,128)} — see _pick_tiles note in ops/conv3x3.py).
    """
    if FLAGS.use_pallas_conv is None:
        return False
    return FLAGS.use_pallas_conv


def use_pallas_conv_denoise() -> bool:
    """Pallas 3x3 conv inside the denoise loop (UNet + ControlNet).

    On by default on TPU: with full shape coverage (13 MB VMEM budget)
    the loop context measures 296.7 vs 303.7 ms for the 3-step CFG
    denoise — the kernel wins once no XLA conv is left to impose the
    competing layout.
    """
    if FLAGS.use_pallas_conv is None:
        return _on_tpu()
    return FLAGS.use_pallas_conv


def use_pallas_conv_decode() -> bool:
    """Pallas convs + whole-resnet/upsample fusion in the VAE decoder.

    On by default on TPU (round-3 flip).  The round-2 layout war left the
    decoder on XLA because bare Pallas convs lost end-to-end (the
    materialized nearest-2x upsamples + boundary relayouts ate the
    per-conv wins).  With conv3x3_up2 removing the materialized upsample
    and conv3x3_fused folding GN+SiLU+skip into the convs, the in-context
    A/B (bench_conv.py decode, v5e, 1024², queue-10 timing) measures:

        xla decoder                  98.4 ms
        pallas fused resnet + up2    82.0 ms   <- default
        pallas bare convs (r2)      106.3 ms
        pallas fused resnet only     97.2 ms

    Fusion, not the conv itself, is what beats XLA here.
    """
    if FLAGS.use_pallas_conv is None:
        return _on_tpu()
    return FLAGS.use_pallas_conv


def use_fused_resnet() -> bool:
    """Whole-resnet-block fusion (ops/conv_fused.conv3x3_fused).

    GN+SiLU prologue, per-batch time-embedding bias, and the skip-add
    epilogue ride inside the conv kernel's VMEM tiles, so a resnet
    block's activations make one HBM round trip per conv instead of
    three.  Default: wherever the Pallas conv itself is on (same layout
    region, same trace-time context); the denoise/decode stage overrides
    pin the measured per-context choice (see resolve_fused_denoise /
    resolve_fused_decode).
    """
    if FLAGS.use_fused_resnet is None:
        return use_pallas_conv()
    return FLAGS.use_fused_resnet


def use_fused_up2() -> bool:
    """Phase-decomposed nearest-2x upsample+conv (ops/conv_fused.conv3x3_up2).

    Removes the materialized 4x upsample tensor that kept the VAE
    decoder on XLA (see use_pallas_conv docstring).  Default: follow the
    Pallas-conv context.
    """
    if FLAGS.use_fused_up2 is None:
        return use_pallas_conv()
    return FLAGS.use_fused_up2


def use_fused_down2() -> bool:
    """Stride-2 phase-decomposed downsample conv (conv_fused.conv3x3_down2).

    Covers the strided convs that kept every Pallas-conv region partially
    XLA (see use_pallas_conv docstring: the round-2/3 encoder A/B lost with
    the downsamplers still on XLA).  Default: follow the Pallas-conv
    context; the per-context stage overrides pin the measured choice.
    """
    if FLAGS.use_fused_down2 is None:
        return use_pallas_conv()
    return FLAGS.use_fused_down2


def use_pallas_conv_encode() -> bool:
    """Pallas convs in the VAE encoder context.

    OFF by default — the round-4 re-A/B with conv3x3_down2 completing
    coverage still loses (bench_conv.py encode, v5e, queue-10-sync-1):
    XLA 43.5 ms vs fused resnet + down2 54.1 vs fused resnet +
    XLA-downsample 57.4 vs bare convs + down2 58.7.  Full coverage DID
    beat partial coverage (down2 > XLA downsamplers inside the Pallas
    region), but the encoder's shapes (few channels, huge spatial) favor
    XLA's conv layout outright.  Honest-flag policy: stays XLA.
    """
    if FLAGS.use_pallas_conv is None:
        return False
    return FLAGS.use_pallas_conv


def resolve_fused_encode() -> tuple[bool, bool]:
    """(use_fused_resnet, use_fused_down2) inside the VAE encoder.
    As elsewhere, the encode-context conv flag gates both fusions."""
    on = use_pallas_conv_encode()
    resnet = (
        FLAGS.use_fused_resnet if FLAGS.use_fused_resnet is not None else on
    )
    down2 = (
        FLAGS.use_fused_down2 if FLAGS.use_fused_down2 is not None else on
    )
    return resnet and on, down2 and on


def resolve_fused_denoise() -> tuple[bool, bool]:
    """(use_fused_resnet, use_fused_up2) inside the denoise loop.

    In-context flag matrix (bench_conv.py denoise, SSD-1B 3-step CFG at
    1024², v5e, queue-6-sync-1 timing after a warmup arm): pallas convs
    + up2 only 241.4 ms < no fusion 249.0 < both fusions 253.8 <
    fused-resnet-only 257.4 < XLA 272.7.  The
    whole-resnet fusion that wins in the decoder LOSES on the UNet's
    CFG-batch-2 shapes (microbench 0.84-0.99x) — its GN stats pass reads
    the conv input twice, which the loop's layout can't hide — so the
    denoise default is up2 ON, resnet-fusion OFF.  Explicit FLAGS
    settings override these defaults, but the Pallas-conv context flag
    still gates both fusions: when use_pallas_conv resolves False for
    this context, the fused kernels stay off regardless (the fusions are
    implemented inside the Pallas conv; there is no XLA-conv variant of
    them).
    """
    on = use_pallas_conv_denoise()
    resnet = (
        FLAGS.use_fused_resnet if FLAGS.use_fused_resnet is not None else False
    )
    up2 = FLAGS.use_fused_up2 if FLAGS.use_fused_up2 is not None else on
    return resnet and on, up2 and on


def resolve_fused_down2_denoise() -> bool:
    """conv3x3_down2 for the UNet downsamplers inside the denoise loop:
    ON by default (round-4 flip).  In-loop A/B on v5e (bench_conv.py
    denoise + a 3x-alternating repeat harness, queue-6-sync-1): up2+down2
    239.3-240.1 ms vs up2-only 240.1-241.1 — a small (~0.3%) but
    rep-consistent win; down2 removes the last XLA convs (and their
    boundary relayouts) from the loop.  The same kernel LOSES in the VAE
    encoder context (54.1 vs 43.5 ms XLA, see use_pallas_conv_encode), so
    the flip is denoise-only.  Explicit FLAGS.use_fused_down2 overrides,
    gated by the loop conv context like the other fusions."""
    on = use_pallas_conv_denoise()
    d = FLAGS.use_fused_down2 if FLAGS.use_fused_down2 is not None else on
    return d and on


def resolve_fused_decode() -> tuple[bool, bool]:
    """(use_fused_resnet, use_fused_up2) inside the VAE decoder: both ON
    by default — 82.0 ms vs 98.4 XLA (see use_pallas_conv_decode).
    As in resolve_fused_denoise, the context conv flag gates both."""
    on = use_pallas_conv_decode()
    resnet = (
        FLAGS.use_fused_resnet if FLAGS.use_fused_resnet is not None else on
    )
    up2 = FLAGS.use_fused_up2 if FLAGS.use_fused_up2 is not None else on
    return resnet and on, up2 and on


def use_pallas_groupnorm() -> bool:
    if FLAGS.use_pallas_groupnorm is None:
        # XLA's fused groupnorm+silu is already near-roofline; the Pallas
        # kernel is opt-in until it beats XLA in bench_kernels.py.
        return False
    return FLAGS.use_pallas_groupnorm


@contextlib.contextmanager
def override(**kwargs):
    """Temporarily override kernel flags (tests)."""
    old = dataclasses.replace(FLAGS)
    try:
        for k, v in kwargs.items():
            setattr(FLAGS, k, v)
        yield
    finally:
        for f in dataclasses.fields(KernelFlags):
            setattr(FLAGS, f.name, getattr(old, f.name))
