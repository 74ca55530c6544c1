"""LCM (Latent Consistency Model) scheduler — pure functions + precomputed tables.

TPU-first design: instead of a stateful scheduler object stepped from Python
(the reference binds diffusers' ``LCMScheduler`` at src/pipeline.py:11,138-141,
158-161), every quantity that varies per denoising step is precomputed on the
host into small fp32 tables (`LCMSchedule`).  The jitted denoise loop
(`jax.lax.fori_loop`) then just gathers row ``i`` — no data-dependent control
flow, no host round-trips, and the whole 4-step loop compiles to one XLA
program.

Semantics reproduced (behavior spec, not a code port):
  * scaled-linear beta schedule, 1000 train steps (SDXL scheduler config).
  * LCM timestep selection from ``original_inference_steps`` (=50) evenly
    spaced "origin" timesteps, reversed, strided by
    ``original_inference_steps // num_inference_steps``.
  * img2img strength truncation as done by the SDXL ControlNet img2img
    pipeline's ``get_timesteps``: keep the last
    ``min(int(steps * strength), steps)`` timesteps.  NOTE with the
    reference's default ``strength=0.80`` and 4 steps this keeps **3** steps
    starting at t=759 (int(4*0.8)==3) — the shipped PIE-Bench results were
    produced that way (see BASELINE.md caveats).
  * LCM step: epsilon -> x0 prediction, consistency boundary scalings
    c_skip = sigma_data^2 / ((t*scaling)^2 + sigma_data^2),
    c_out  = (t*scaling) / sqrt((t*scaling)^2 + sigma_data^2),
    and stochastic noise re-injection between steps (none after the final
    step, where the denoised sample is returned directly).

All table math is float32 on host (numpy) to match the reference runtime's
fp32 scheduler arithmetic; only the big latent tensors run in bf16.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class LCMSchedulerConfig:
    """Static scheduler hyperparameters (SDXL defaults)."""

    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"  # "scaled_linear" | "linear"
    original_inference_steps: int = 50
    timestep_scaling: float = 10.0
    sigma_data: float = 0.5
    set_alpha_to_one: bool = True
    prediction_type: str = "epsilon"


def alphas_cumprod(config: LCMSchedulerConfig) -> np.ndarray:
    """Cumulative product of (1 - beta_t), fp32, shape [num_train_timesteps]."""
    T = config.num_train_timesteps
    if config.beta_schedule == "scaled_linear":
        betas = (
            np.linspace(
                config.beta_start**0.5, config.beta_end**0.5, T, dtype=np.float32
            )
            ** 2
        )
    elif config.beta_schedule == "linear":
        betas = np.linspace(config.beta_start, config.beta_end, T, dtype=np.float32)
    else:
        raise ValueError(f"Unsupported beta_schedule: {config.beta_schedule}")
    return np.cumprod(1.0 - betas, axis=0).astype(np.float32)


def lcm_timesteps(
    config: LCMSchedulerConfig,
    num_inference_steps: int,
    original_inference_steps: Optional[int] = None,
) -> np.ndarray:
    """The full (untruncated) LCM timestep sequence, descending, shape [steps].

    E.g. 4 steps from 50 origin steps over 1000 train steps: [999, 759, 519, 279].
    """
    origin_steps = original_inference_steps or config.original_inference_steps
    if num_inference_steps > origin_steps:
        raise ValueError(
            f"num_inference_steps ({num_inference_steps}) > "
            f"original_inference_steps ({origin_steps})"
        )
    k = config.num_train_timesteps // origin_steps
    # Origin timesteps: k-1, 2k-1, ..., origin_steps*k - 1  (ascending).
    origin_timesteps = (np.arange(1, origin_steps + 1, dtype=np.int64) * k) - 1
    skipping_step = len(origin_timesteps) // num_inference_steps
    timesteps = origin_timesteps[::-1][::skipping_step][:num_inference_steps]
    return timesteps.astype(np.int32)


def truncate_timesteps_for_img2img(
    timesteps: np.ndarray, num_inference_steps: int, strength: float
) -> tuple[np.ndarray, int]:
    """img2img strength truncation; returns (run timesteps, t_start offset).

    Mirrors the SDXL img2img pipelines' ``get_timesteps``:
    ``init_timestep = min(int(steps * strength), steps)``;
    ``t_start = max(steps - init_timestep, 0)``; keep ``timesteps[t_start:]``.
    """
    init_timestep = min(int(num_inference_steps * strength), num_inference_steps)
    t_start = max(num_inference_steps - init_timestep, 0)
    return timesteps[t_start:], t_start


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LCMSchedule:
    """Precomputed per-step tables for one denoising run (a jit-friendly pytree).

    All arrays have leading dim S = number of steps actually run (after
    strength truncation).  ``num_steps`` is static so the fori_loop bound is
    a compile-time constant.
    """

    timesteps: jax.Array  # [S] int32, descending
    sqrt_alpha: jax.Array  # [S] fp32 sqrt(alphas_cumprod[t])
    sqrt_one_minus_alpha: jax.Array  # [S] fp32
    sqrt_alpha_prev: jax.Array  # [S] fp32 (garbage on last step, masked)
    sqrt_one_minus_alpha_prev: jax.Array  # [S] fp32
    c_skip: jax.Array  # [S] fp32
    c_out: jax.Array  # [S] fp32
    is_last: jax.Array  # [S] bool — final step returns `denoised` directly
    num_steps: int = dataclasses.field(metadata=dict(static=True))


def make_schedule(
    config: LCMSchedulerConfig,
    num_inference_steps: int,
    strength: float = 1.0,
    original_inference_steps: Optional[int] = None,
) -> LCMSchedule:
    """Build the per-step tables for ``num_inference_steps`` at ``strength``."""
    if config.prediction_type != "epsilon":
        # lcm_step hardcodes the epsilon parameterization; a checkpoint
        # whose scheduler config says v_prediction/sample must fail loudly
        # here, not silently denoise with the wrong x0 formula (the
        # converter re-derives this field from the checkpoint's own
        # config.json).
        raise ValueError(
            f"Unsupported prediction_type: {config.prediction_type!r} "
            "(only 'epsilon' is implemented)"
        )
    acp = alphas_cumprod(config)
    full = lcm_timesteps(config, num_inference_steps, original_inference_steps)
    run, t_start = truncate_timesteps_for_img2img(full, num_inference_steps, strength)
    n_full = len(full)
    S = len(run)
    if S == 0:
        raise ValueError(
            f"strength={strength} with {num_inference_steps} steps leaves no "
            "timesteps to run"
        )

    alpha_t = acp[run]  # [S]
    # prev timestep: next entry of the FULL sequence; on the overall last
    # step the value is unused (is_last masks it) — reuse t for stability.
    prev_ts = np.empty_like(run)
    for i in range(S):
        j = t_start + i + 1
        prev_ts[i] = full[j] if j < n_full else run[i]
    alpha_prev = acp[prev_ts]

    scaled_t = run.astype(np.float32) * config.timestep_scaling
    sd2 = config.sigma_data**2
    c_skip = sd2 / (scaled_t**2 + sd2)
    c_out = scaled_t / np.sqrt(scaled_t**2 + sd2)

    is_last = np.zeros(S, dtype=bool)
    # "last" in diffusers is step_index == num_inference_steps - 1 over the
    # FULL sequence; with truncation the final run step always has
    # t_start + (S-1) == n_full - 1.
    is_last[-1] = t_start + S - 1 == n_full - 1
    assert is_last[-1], "truncation must preserve the tail of the sequence"

    f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)  # noqa: E731
    return LCMSchedule(
        timesteps=jnp.asarray(run, dtype=jnp.int32),
        sqrt_alpha=f32(np.sqrt(alpha_t)),
        sqrt_one_minus_alpha=f32(np.sqrt(1.0 - alpha_t)),
        sqrt_alpha_prev=f32(np.sqrt(alpha_prev)),
        sqrt_one_minus_alpha_prev=f32(np.sqrt(1.0 - alpha_prev)),
        c_skip=f32(c_skip),
        c_out=f32(c_out),
        is_last=jnp.asarray(is_last),
        num_steps=S,
    )


def add_noise(
    schedule: LCMSchedule, x0: jax.Array, noise: jax.Array
) -> jax.Array:
    """Noise clean latents to the schedule's first (highest) timestep.

    sqrt(acp[t0]) * x0 + sqrt(1 - acp[t0]) * eps — the img2img latent init
    (`latent_timestep = timesteps[:1]` in the reference's external pipeline).
    """
    a = schedule.sqrt_alpha[0].astype(x0.dtype)
    b = schedule.sqrt_one_minus_alpha[0].astype(x0.dtype)
    return a * x0 + b * noise.astype(x0.dtype)


def lcm_step(
    schedule: LCMSchedule,
    i: jax.Array,
    sample: jax.Array,
    eps: jax.Array,
    noise: jax.Array,
) -> jax.Array:
    """One LCM denoising step (epsilon parameterization).

    Args:
        schedule: precomputed tables.
        i: step index into the schedule (traced int).
        sample: current noisy latents x_t.
        eps: model's predicted noise at (sample, t_i).
        noise: fresh standard normal noise for inter-step re-injection
            (ignored on the final step).

    Returns:
        x at the previous (less noisy) timestep, same dtype as ``sample``.
    """
    dt = sample.dtype
    # fp32 math for the tiny elementwise step (bf16 latents upcast here).
    s = sample.astype(jnp.float32)
    e = eps.astype(jnp.float32)
    pred_x0 = (s - schedule.sqrt_one_minus_alpha[i] * e) / schedule.sqrt_alpha[i]
    denoised = schedule.c_out[i] * pred_x0 + schedule.c_skip[i] * s
    stepped = (
        schedule.sqrt_alpha_prev[i] * denoised
        + schedule.sqrt_one_minus_alpha_prev[i] * noise.astype(jnp.float32)
    )
    out = jnp.where(schedule.is_last[i], denoised, stepped)
    return out.astype(dt)
