"""Global kernel-dispatch flags.

Every hot op has two implementations: a Pallas TPU kernel and a pure-XLA
reference (SURVEY.md §7: "Everything falls back to pure-XLA reference
implementations selected by flag, so correctness never depends on Pallas").
The flags below pick the implementation; tests pin them per-case.

Defaults: Pallas on TPU backends, XLA elsewhere (Pallas TPU kernels cannot
run on the CPU backend except in interpret mode).
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
    if FLAGS.use_pallas_conv is None:
        # Off by default (honest-flag policy).  Standalone the kernel beats
        # XLA 1.05-1.80x (bench_conv.py), but in-context it is 1.00-1.04x
        # at the resnet GN+SiLU+conv chains and uniformly slower in the
        # one-shot VAE decoder program (custom-call boundary: layout
        # copies + lost fusion/overlap; spatial bisect in
        # IMPLEMENTATION.md).  End-to-end A/B: 0.86 vs 0.73 s/edit.
        return False
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
