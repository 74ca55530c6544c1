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
    """Pallas 3x3 conv outside the denoise loop (VAE & friends).

    Off by default: in the one-shot VAE decoder the kernel's convs are
    individually 2-3.5x faster than XLA's (profiled 1.6 vs 24 ms at the
    big layers), but XLA materializes the nearest-2x upsamples and
    relayouts at the remaining XLA-op boundaries, netting 143 vs 129 ms.
    Partial coverage is far worse (241 ms): mixed pallas/XLA-conv graphs
    fight over layouts (row-major T(8,128) vs conv-preferred
    {3,0,2,1:T(2,128)}) — see _pick_tiles note in ops/conv3x3.py.
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
