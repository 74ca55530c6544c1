"""Unit tests for the LCM scheduler (SURVEY.md §4: scheduler math vs hand-derived tables)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastedit_tpu.sched import (
    LCMSchedulerConfig,
    add_noise,
    alphas_cumprod,
    lcm_step,
    lcm_timesteps,
    make_schedule,
    truncate_timesteps_for_img2img,
)

CFG = LCMSchedulerConfig()


def test_alphas_cumprod_scaled_linear():
    acp = alphas_cumprod(CFG)
    assert acp.shape == (1000,)
    assert acp.dtype == np.float32
    # First entry: 1 - beta_0 with beta_0 = beta_start.
    np.testing.assert_allclose(acp[0], 1.0 - 0.00085, rtol=1e-6)
    # Monotonically decreasing, stays in (0, 1).
    assert np.all(np.diff(acp) < 0)
    assert acp[-1] > 0.0 and acp[0] < 1.0
    # Known SDXL value ballpark: acp[999] ~ 0.0047.
    assert 0.003 < acp[999] < 0.007


def test_lcm_timesteps_4_of_50():
    # 50 origin steps over 1000: origin = [19, 39, ..., 999]; stride 12 from
    # the top: [999, 759, 519, 279].
    ts = lcm_timesteps(CFG, 4)
    np.testing.assert_array_equal(ts, [999, 759, 519, 279])


def test_lcm_timesteps_8_of_50():
    ts = lcm_timesteps(CFG, 8)
    # stride = 50 // 8 = 6 -> every 6th origin step from 999 down.
    np.testing.assert_array_equal(ts, [999, 879, 759, 639, 519, 399, 279, 159])


def test_lcm_timesteps_1_step():
    np.testing.assert_array_equal(lcm_timesteps(CFG, 1), [999])


def test_strength_truncation_reference_default():
    # Reference default strength=0.80 (src/pipeline.py:217): int(4*0.8)==3
    # -> drops the first step, runs [759, 519, 279].
    ts = lcm_timesteps(CFG, 4)
    run, t_start = truncate_timesteps_for_img2img(ts, 4, 0.80)
    assert t_start == 1
    np.testing.assert_array_equal(run, [759, 519, 279])


def test_strength_one_keeps_all():
    ts = lcm_timesteps(CFG, 4)
    run, t_start = truncate_timesteps_for_img2img(ts, 4, 1.0)
    assert t_start == 0
    np.testing.assert_array_equal(run, ts)


def test_strength_half():
    # int(4*0.5)==2 -> run the last two steps.
    ts = lcm_timesteps(CFG, 4)
    run, t_start = truncate_timesteps_for_img2img(ts, 4, 0.5)
    assert t_start == 2
    np.testing.assert_array_equal(run, [519, 279])


def test_boundary_scalings_hand_computed():
    sched = make_schedule(CFG, 4, strength=1.0)
    # c_skip/c_out at t=999 with timestep_scaling=10, sigma_data=0.5.
    st = 9990.0
    np.testing.assert_allclose(
        np.asarray(sched.c_skip[0]), 0.25 / (st**2 + 0.25), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(sched.c_out[0]), st / np.sqrt(st**2 + 0.25), rtol=1e-6
    )
    assert bool(sched.is_last[3]) and not bool(np.any(np.asarray(sched.is_last[:3])))


def test_schedule_prev_alpha_chain():
    acp = alphas_cumprod(CFG)
    sched = make_schedule(CFG, 4, strength=0.8)
    # Run steps [759, 519, 279]; prev of 759 is 519, prev of 519 is 279.
    np.testing.assert_allclose(
        np.asarray(sched.sqrt_alpha_prev[0]), np.sqrt(acp[519]), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(sched.sqrt_alpha_prev[1]), np.sqrt(acp[279]), rtol=1e-6
    )
    assert sched.num_steps == 3


def test_add_noise_matches_formula():
    acp = alphas_cumprod(CFG)
    sched = make_schedule(CFG, 4, strength=0.8)  # first run timestep 759
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (2, 8, 8, 4), dtype=jnp.float32)
    eps = jax.random.normal(jax.random.fold_in(key, 1), x0.shape)
    noised = add_noise(sched, x0, eps)
    expected = np.sqrt(acp[759]) * np.asarray(x0) + np.sqrt(1 - acp[759]) * np.asarray(
        eps
    )
    np.testing.assert_allclose(np.asarray(noised), expected, rtol=1e-5, atol=1e-6)


def test_perfect_eps_recovers_x0():
    """If the model predicts the exact noise, the full loop returns ~x0.

    c_out ~= 1 and c_skip ~= 0 at these timesteps, so denoised ~= pred_x0;
    with exact eps, pred_x0 == x0 at every step.
    """
    sched = make_schedule(CFG, 4, strength=1.0)
    key = jax.random.PRNGKey(42)
    x0 = jax.random.normal(key, (1, 16, 16, 4), dtype=jnp.float32)

    sample = add_noise(sched, x0, jax.random.normal(jax.random.fold_in(key, 7), x0.shape))
    state = sample
    for i in range(sched.num_steps):
        # Oracle epsilon: eps = (x_t - sqrt(a) x0) / sqrt(1-a).
        eps = (state - sched.sqrt_alpha[i] * x0) / sched.sqrt_one_minus_alpha[i]
        inj = jax.random.normal(jax.random.fold_in(key, 100 + i), x0.shape)
        state = lcm_step(sched, jnp.asarray(i), state, eps, inj)
    np.testing.assert_allclose(np.asarray(state), np.asarray(x0), rtol=1e-3, atol=1e-3)


def test_lcm_step_last_ignores_noise():
    sched = make_schedule(CFG, 4, strength=1.0)
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (1, 4, 4, 4))
    eps = jax.random.normal(jax.random.fold_in(key, 1), x.shape)
    i = jnp.asarray(3)
    out_a = lcm_step(sched, i, x, eps, jnp.zeros_like(x))
    out_b = lcm_step(sched, i, x, eps, 1e3 * jnp.ones_like(x))
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))


def test_lcm_step_inside_jit_and_fori_loop():
    sched = make_schedule(CFG, 4, strength=0.8)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 8, 8, 4))

    @jax.jit
    def run(sched, x, key):
        def body(i, carry):
            state, key = carry
            key, k1, k2 = jax.random.split(key, 3)
            eps = jax.random.normal(k1, state.shape)
            inj = jax.random.normal(k2, state.shape)
            return lcm_step(sched, i, state, eps, inj), key

        state, _ = jax.lax.fori_loop(0, sched.num_steps, body, (x, key))
        return state

    out = run(sched, x, key)
    assert out.shape == x.shape
    assert np.all(np.isfinite(np.asarray(out)))


def test_rejects_zero_steps():
    ts = lcm_timesteps(CFG, 4)
    run, _ = truncate_timesteps_for_img2img(ts, 4, 0.0)
    assert len(run) == 0
    with pytest.raises(ValueError):
        make_schedule(CFG, 4, strength=0.0)


# ---------------------------------------------------------------------------
# staged diffusers goldens (round-4 verdict Next #6)
# ---------------------------------------------------------------------------


def _load_scheduler_goldens():
    import json
    import os

    path = os.path.join(
        os.path.dirname(__file__), "fixtures", "lcm_scheduler_goldens.json"
    )
    return json.load(open(path)).get("captured")


def test_diffusers_trajectory_golden():
    """Replay the captured diffusers-LCMScheduler trajectories against
    sched/lcm.py: same timestep selection + truncation, same c_skip/c_out,
    and bit-near-identical latents through every step (captured noise
    re-injected).  Skips until tools/capture_scheduler_goldens.py fills the
    fixture on an egress machine."""
    cap = _load_scheduler_goldens()
    if cap is None:
        pytest.skip("diffusers scheduler goldens not captured yet (no "
                    "egress); run tools/capture_scheduler_goldens.py")
    from fastedit_tpu.tools import capture_scheduler_goldens as G

    sc = cap["scheduler_config"]
    cfg = LCMSchedulerConfig(
        num_train_timesteps=int(sc["num_train_timesteps"]),
        beta_start=float(sc["beta_start"]),
        beta_end=float(sc["beta_end"]),
        beta_schedule=sc["beta_schedule"],
        original_inference_steps=int(sc["original_inference_steps"]),
        timestep_scaling=float(sc.get("timestep_scaling", 10.0)),
        prediction_type=sc.get("prediction_type", "epsilon"),
    )
    for case in cap["cases"]:
        steps, strength = case["num_inference_steps"], case["strength"]
        full = lcm_timesteps(cfg, steps)
        np.testing.assert_array_equal(full, case["timesteps_full"])
        sched = make_schedule(cfg, steps, strength=strength)
        np.testing.assert_array_equal(
            np.asarray(sched.timesteps), case["timesteps_run"]
        )
        got_scalings = np.stack(
            [np.asarray(sched.c_skip), np.asarray(sched.c_out)], axis=1
        )
        np.testing.assert_allclose(
            got_scalings, np.asarray(case["scalings_c_skip_c_out"]),
            rtol=1e-6, atol=1e-7,
        )
        # trajectory: NCHW captured -> NHWC ours
        x_np, eps_np = G.make_inputs(len(case["timesteps_run"]))
        x = jnp.asarray(x_np.transpose(0, 2, 3, 1))
        for i, (prev, noise) in enumerate(
            zip(case["trajectory_prev_samples"], case["noises"])
        ):
            eps = jnp.asarray(eps_np[i].transpose(0, 2, 3, 1))
            inj = jnp.asarray(
                np.asarray(noise, np.float32).transpose(0, 2, 3, 1)
            )
            x = lcm_step(sched, i, x, eps, inj)
            np.testing.assert_allclose(
                np.asarray(x),
                np.asarray(prev, np.float32).transpose(0, 2, 3, 1),
                rtol=2e-5, atol=2e-5,
            )
