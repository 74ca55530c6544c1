"""Tracing / profiling / observability (SURVEY.md §5 aux subsystems).

The reference's observability is wall-clock prints and
``torch.cuda.memory_allocated`` (src/pipeline.py:281-293,
run_single_image.py:91-109).  TPU-native equivalents:

  * ``StageTimer`` — per-stage wall timing with device sync (readback),
    because ``block_until_ready`` alone does not flush the axon relay.
  * ``trace()`` — context manager around ``jax.profiler`` emitting a
    TensorBoard trace directory (xplane) for op-level analysis.
  * ``device_memory_stats()`` — HBM use per device.
  * ``enable_nan_checks()`` — jax_debug_nans, the numeric analogue of the
    race detectors the reference lacks (single-controller JAX needs none).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax
import numpy as np


def sync(tree) -> None:
    """Force completion of async device work (incl. through the axon relay)
    by reading back ONE element of every leaf.

    The element is sliced on device first: a whole-array ``device_get``
    would add the array's full host transfer (multi-MB, ~16 MB/s through
    the remote relay) to whatever is being timed — e.g. vae_decode's 3 MB
    uint8 image would read as ~200 ms of phantom stage time.  The 4-byte
    scalar readback still orders after the producing program, which is the
    synchronization wanted.
    """
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "addressable_shards"):
            data = leaf.addressable_shards[0].data
            if data.size:
                data = data.ravel()[0]
            np.asarray(jax.device_get(data))


class StageTimer:
    """Accumulates wall time per named stage; prints a table on report()."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, result=None):
        t0 = time.perf_counter()
        out = {}
        yield out
        if "result" in out:
            sync(out["result"])
        elif result is not None:
            sync(result)
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = ["stage                    total_s   calls   avg_ms"]
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            c = self.counts[name]
            lines.append(f"{name:<24} {total:7.3f}  {c:6d}  {total/c*1e3:7.2f}")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(logdir: str = "/tmp/fastedit_trace"):
    """jax.profiler trace -> TensorBoard xplane directory."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def device_memory_stats(device: Optional[jax.Device] = None) -> Dict[str, float]:
    dev = device or jax.local_devices()[0]
    stats = dev.memory_stats() or {}
    return {
        "bytes_in_use_gb": stats.get("bytes_in_use", 0) / 1024**3,
        "peak_bytes_in_use_gb": stats.get("peak_bytes_in_use", 0) / 1024**3,
        "bytes_limit_gb": stats.get("bytes_limit", 0) / 1024**3,
    }


def enable_nan_checks(enabled: bool = True) -> None:
    jax.config.update("jax_debug_nans", enabled)
