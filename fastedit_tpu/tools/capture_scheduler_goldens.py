"""Capture diffusers-LCMScheduler goldens into the staged fixture.

Run on a machine with egress + ``pip install diffusers torch`` (round-4
verdict Next #6; same staging pattern as capture_token_goldens.py).  Replays
the exact shipped-notebook scheduler configs the reference runs
(/root/reference/src/pipeline.py:138-141,158-161 — LCMScheduler with
``timestep_spacing="trailing"`` from the checkpoint's scheduler config) and
records, per config:

  * the full timestep sequence after ``set_timesteps(steps,
    original_inference_steps=...)``,
  * the img2img-truncated run sequence at the config's strength,
  * c_skip / c_out boundary scalings per run step,
  * a full latent TRAJECTORY: starting from deterministic latents/eps
    (shared numpy recipe, below), every ``scheduler.step`` output
    (prev_sample) plus the exact inter-step noise diffusers drew (recovered
    by re-seeding the same torch.Generator — the step's only randomness is
    one ``randn_tensor`` of sample shape).

tests/test_lcm_scheduler.py::test_diffusers_trajectory_golden skips while
the fixture's ``captured`` is null and hard-verifies sched/lcm.py against
the recorded trajectory once filled.

Usage (egress machine):
    python -m fastedit_tpu.tools.capture_scheduler_goldens \
        [--scheduler_config path/to/scheduler/scheduler_config.json] \
        [--fixture tests/fixtures/lcm_scheduler_goldens.json]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

# Shared deterministic input recipe — capture tool and test MUST generate
# identical inputs from this, so the fixture only stores outputs.
INPUT_SEED = 20260819
SAMPLE_SHAPE = (1, 4, 8, 8)  # NCHW (torch side); test transposes to NHWC
NOISE_SEED_BASE = 1000

# The shipped notebook/benchmark configs (run_benchmark_colab.ipynb cells
# 11-12 / README table): 4 steps at strength 0.8 (=> 3 executed) is the
# headline; strength 1.0 runs the full 4; 8-step covers the stride-2 origin
# selection.
CONFIGS = [
    {"num_inference_steps": 4, "strength": 0.8},
    {"num_inference_steps": 4, "strength": 1.0},
    {"num_inference_steps": 8, "strength": 0.8},
]


def make_inputs(num_run_steps: int):
    """Deterministic (x_start, eps_per_step) in NCHW fp32."""
    rng = np.random.default_rng(INPUT_SEED)
    x = rng.standard_normal(SAMPLE_SHAPE).astype(np.float32)
    eps = [
        rng.standard_normal(SAMPLE_SHAPE).astype(np.float32)
        for _ in range(num_run_steps)
    ]
    return x, eps


def truncate(timesteps: np.ndarray, steps: int, strength: float):
    """The SDXL img2img pipelines' get_timesteps truncation."""
    init_timestep = min(int(steps * strength), steps)
    t_start = max(steps - init_timestep, 0)
    return timesteps[t_start:]


def capture(scheduler_config: dict | None) -> dict:
    import torch
    from diffusers import LCMScheduler

    if scheduler_config is not None:
        sched_kwargs = {
            k: v for k, v in scheduler_config.items() if not k.startswith("_")
        }
        scheduler = LCMScheduler(**sched_kwargs)
    else:
        # SDXL shipped scheduler facts (scheduler_config.json)
        scheduler = LCMScheduler(
            num_train_timesteps=1000,
            beta_start=0.00085,
            beta_end=0.012,
            beta_schedule="scaled_linear",
            original_inference_steps=50,
            timestep_spacing="trailing",
            prediction_type="epsilon",
        )

    out = {"scheduler_config": dict(scheduler.config), "cases": []}
    for case in CONFIGS:
        steps, strength = case["num_inference_steps"], case["strength"]
        scheduler.set_timesteps(steps, device="cpu")
        full = scheduler.timesteps.numpy().copy()
        run = truncate(full, steps, strength)

        # boundary scalings per run step
        scalings = [
            [float(v) for v in
             scheduler.get_scalings_for_boundary_condition_discrete(
                 torch.tensor(int(t))
             )]
            for t in run
        ]

        # trajectory: re-simulate the pipeline loop over the truncated
        # sequence.  diffusers tracks _step_index internally from the first
        # stepped timestep, so begin_index must point at the truncation
        # offset.
        scheduler.set_timesteps(steps, device="cpu")
        if hasattr(scheduler, "set_begin_index"):
            scheduler.set_begin_index(len(full) - len(run))
        x_np, eps_np = make_inputs(len(run))
        sample = torch.from_numpy(x_np)
        traj, noises = [], []
        for i, t in enumerate(run):
            g = torch.Generator().manual_seed(NOISE_SEED_BASE + i)
            # recover the exact noise step() will draw: one randn_tensor of
            # sample shape from a generator in the same state
            g2 = torch.Generator().manual_seed(NOISE_SEED_BASE + i)
            noise = torch.randn(
                sample.shape, generator=g2, dtype=sample.dtype
            )
            res = scheduler.step(
                torch.from_numpy(eps_np[i]), torch.tensor(int(t)), sample,
                generator=g,
            )
            sample = res.prev_sample
            final = res.denoised if i == len(run) - 1 else None
            traj.append(sample.numpy().tolist())
            noises.append(noise.numpy().tolist())
        out["cases"].append(
            {
                "num_inference_steps": steps,
                "strength": strength,
                "timesteps_full": [int(t) for t in full],
                "timesteps_run": [int(t) for t in run],
                "scalings_c_skip_c_out": scalings,
                "trajectory_prev_samples": traj,
                "noises": noises,
                "final_denoised": None if final is None
                else final.numpy().tolist(),
            }
        )
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--scheduler_config", default=None,
                   help="checkpoint scheduler_config.json (default: SDXL "
                        "shipped values)")
    p.add_argument(
        "--fixture",
        default=os.path.join(
            os.path.dirname(__file__), "..", "..", "tests", "fixtures",
            "lcm_scheduler_goldens.json",
        ),
    )
    args = p.parse_args(argv)

    cfg = None
    if args.scheduler_config:
        with open(args.scheduler_config) as f:
            cfg = json.load(f)

    fixture_path = os.path.abspath(args.fixture)
    with open(fixture_path) as f:
        fixture = json.load(f)
    fixture["captured"] = capture(cfg)
    with open(fixture_path, "w") as f:
        json.dump(fixture, f)
        f.write("\n")
    n = len(fixture["captured"]["cases"])
    print(f"[capture] {n} scheduler golden cases -> {fixture_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
