"""Pin the measured per-context kernel-dispatch defaults (ops/flags.py).

Each default encodes an in-context A/B on the real chip (bench_conv.py
decode/encode/denoise, queue-n-sync-1 timing after a warmup arm — see
IMPLEMENTATION.md's fusion matrix).  These tests keep a refactor from
silently flipping a context to a measured-slower configuration:

  * denoise loop: Pallas convs ON, up2 fusion ON, whole-resnet OFF
    (241.4 ms vs 272.7 XLA; resnet fusion loses at 257.4)
  * VAE decoder: Pallas convs ON, both fusions ON (81.5-83.4 vs 98.1-99.5)
  * VAE encoder and other unmeasured contexts: XLA (44 vs 56 ms fused)

Explicit FLAGS settings must override every default in both directions.
"""

from unittest import mock

from fastedit_tpu.ops import flags


def _tpu(value: bool):
    return mock.patch.object(flags, "_on_tpu", lambda: value)


def test_denoise_default_up2_only_on_tpu():
    with _tpu(True):
        assert flags.use_pallas_conv_denoise() is True
        assert flags.resolve_fused_denoise() == (False, True)


def test_decode_default_fully_fused_on_tpu():
    with _tpu(True):
        assert flags.use_pallas_conv_decode() is True
        assert flags.resolve_fused_decode() == (True, True)


def test_encoder_and_unmeasured_contexts_default_xla():
    with _tpu(True):
        assert flags.use_pallas_conv() is False
        assert flags.use_pallas_conv_encode() is False
        assert flags.resolve_fused_encode() == (False, False)


def test_down2_defaults_and_overrides():
    """conv3x3_down2 defaults: ON inside the denoise loop (round-4
    hardware A/B win), OFF in the encoder and unmeasured contexts;
    explicit FLAGS.use_fused_down2 overrides, still gated by the
    context conv flag."""
    with _tpu(True):
        assert flags.use_fused_down2() is False  # follows use_pallas_conv()
        assert flags.resolve_fused_down2_denoise() is True
        with flags.override(use_fused_down2=False):
            assert flags.resolve_fused_down2_denoise() is False
        with flags.override(use_fused_down2=True):
            # gated: denoise context conv flag is ON by default on TPU
            assert flags.resolve_fused_down2_denoise() is True
            # encoder context conv flag is OFF -> still gated off
            assert flags.resolve_fused_encode() == (False, False)
        with flags.override(use_pallas_conv=True, use_fused_down2=True):
            assert flags.resolve_fused_encode()[1] is True
        with flags.override(use_pallas_conv=True, use_fused_down2=False):
            assert flags.resolve_fused_encode()[1] is False


def test_cpu_backend_defaults_everything_off():
    with _tpu(False):
        assert flags.use_pallas_conv_denoise() is False
        assert flags.use_pallas_conv_decode() is False
        assert flags.resolve_fused_denoise() == (False, False)
        assert flags.resolve_fused_decode() == (False, False)


def test_explicit_flags_override_defaults_both_ways():
    with _tpu(True):
        with flags.override(
            use_pallas_conv=True, use_fused_resnet=True, use_fused_up2=False
        ):
            assert flags.resolve_fused_denoise() == (True, False)
            assert flags.resolve_fused_decode() == (True, False)
        with flags.override(use_pallas_conv=False):
            # conv off zeroes the fusions regardless of their own flags
            assert flags.resolve_fused_denoise() == (False, False)
            assert flags.resolve_fused_decode() == (False, False)
    with _tpu(False):
        with flags.override(
            use_pallas_conv=True, use_fused_resnet=False, use_fused_up2=True
        ):
            # explicit ON wins even off-TPU (tests use interpret mode)
            assert flags.resolve_fused_denoise() == (False, True)
            assert flags.resolve_fused_decode() == (False, True)
