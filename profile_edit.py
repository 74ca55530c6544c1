"""Per-stage latency breakdown of a full edit on the real chip.

Uses the same flagship setup as bench.py but times each device stage
separately (relay-safe sync) via the *unfused* stage programs, so
optimization work targets the right stage.  NOTE: production `edit()` runs
the fused single-dispatch program (stages.make_edit_core); the per-stage
sum here is an upper bound on the fused latency.

Usage: python profile_edit.py
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from PIL import Image

    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from fastedit_tpu import FastEditor
    from fastedit_tpu.pipeline import stages
    from fastedit_tpu.sched.lcm import make_schedule
    from fastedit_tpu.utils.image import resize
    from fastedit_tpu.utils.profiling import StageTimer

    t0 = time.time()
    editor = FastEditor("ssd-1b", random_weights=True)
    print(f"[profile] init {time.time()-t0:.1f}s", file=sys.stderr)
    dtype = editor.dtype
    r = editor.resolution

    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (r, r, 3), dtype=np.uint8))
    print("[profile] compiling stages + fused core...", file=sys.stderr)
    editor.edit(img, "warmup", seed=0)  # fused core

    timer = StageTimer()
    # Iteration 0 compiles every unfused stage program; report steady state
    # only (iterations >= 1).
    for i in range(4):
        if i == 1:
            timer = StageTimer()
        prompt = f"a rusty bicycle {i}"
        with timer.stage("host: resize/u8") as out:
            u8 = np.asarray(resize(img.convert("RGB"), r), dtype=np.uint8)
        with timer.stage("h2d + prepare (canny+norm)") as out:
            control, vae_in = editor._prepare(
                jnp.asarray(u8), jnp.float32(100), jnp.float32(200)
            )
            out["result"] = (control, vae_in)
        with timer.stage("encode_prompt (2 towers, uncached)") as out:
            ids1 = jnp.asarray(editor.tokenizer.encode(prompt))[None]
            ids2 = jnp.asarray(editor.tokenizer_2.encode(prompt))[None]
            ctx_c, pooled_c = editor._encode_prompt(ids1, ids2)
            out["result"] = ctx_c
        ctx_u, pooled_u = editor._encode_prompt_cached("")
        context = jnp.concatenate([ctx_u, ctx_c])
        pooled = jnp.concatenate([pooled_u, pooled_c])
        time_ids = stages.make_sdxl_time_ids(2, r)
        key = jax.random.PRNGKey(i)
        key, k_enc = jax.random.split(key)
        with timer.stage("vae_encode") as out:
            latents = editor._vae_encode(vae_in, k_enc)
            out["result"] = latents
        schedule = make_schedule(editor.scheduler_config, 4, strength=0.8)
        with timer.stage("denoise x3 (CFG)") as out:
            latents = editor._denoise(
                latents, context, pooled, time_ids, control, schedule,
                jnp.float32(1.5), jnp.float32(0.5), key, do_cfg=True,
            )
            out["result"] = latents
        with timer.stage("vae_decode (uint8)") as out:
            img_out = editor._vae_decode(latents)
            out["result"] = img_out
        with timer.stage("d2h uint8") as out:
            _ = np.asarray(img_out[0])

        with timer.stage("fused edit_core (end-to-end)") as out:
            _ = editor.edit(img, prompt, seed=i)
    print(timer.report())


if __name__ == "__main__":
    main()
