"""Golden-activation capture + comparison harness (SURVEY.md §4, §7 tool 7).

Two halves:

  * ``capture``: on a machine with the torch reference stack installed
    (diffusers/transformers), run each module on fixed inputs and save the
    activations to an .npz. Deterministic inputs come from
    ``golden_inputs()`` so both sides agree without sharing arrays.
  * ``compare``: load an .npz of reference activations and check our
    modules reproduce them within bf16-appropriate tolerances.

In this zero-egress environment only the CLIP-tower goldens can be
exercised (tests/test_golden_torch.py does so end-to-end with random
torch models); UNet/VAE goldens activate once real checkpoints exist.
"""

from __future__ import annotations

import argparse
from typing import Dict

import numpy as np

# Tolerances per capture precision.
TOLERANCES = {"fp32": dict(rtol=1e-4, atol=1e-4), "bf16": dict(rtol=2e-2, atol=2e-2)}


def golden_inputs(kind: str, seed: int = 0) -> Dict[str, np.ndarray]:
    """Deterministic module inputs shared by the capture and compare sides."""
    rng = np.random.default_rng(seed)
    if kind == "unet":
        return {
            "latents": rng.standard_normal((1, 128, 128, 4)).astype(np.float32),
            "timestep": np.asarray([759.0], np.float32),
            "context": rng.standard_normal((1, 77, 2048)).astype(np.float32) * 0.2,
            "pooled": rng.standard_normal((1, 1280)).astype(np.float32) * 0.2,
            "time_ids": np.asarray([[1024, 1024, 0, 0, 1024, 1024]], np.float32),
        }
    if kind == "controlnet":
        base = golden_inputs("unet", seed)
        base["cond_image"] = rng.uniform(0, 1, (1, 1024, 1024, 3)).astype(np.float32)
        return base
    if kind == "vae":
        return {
            "image": rng.uniform(-1, 1, (1, 256, 256, 3)).astype(np.float32),
            "latents": rng.standard_normal((1, 32, 32, 4)).astype(np.float32),
        }
    if kind in ("text_encoder", "text_encoder_2"):
        ids = np.full((1, 77), 0, np.int64)
        ids[0, 0] = 49406
        ids[0, 1:9] = rng.integers(1000, 40000, 8)
        ids[0, 9] = 49407
        return {"input_ids": ids}
    raise ValueError(kind)


def compare(kind: str, golden_path: str, ckpt_dir: str, precision: str = "bf16"):
    """Check our module reproduces the captured reference activations."""
    import jax.numpy as jnp

    from fastedit_tpu.models import configs as C
    from fastedit_tpu.models.clip import CLIPTextModel
    from fastedit_tpu.models.unet import UNet2DConditionModel
    from fastedit_tpu.models.vae import AutoencoderKL
    from fastedit_tpu.utils import checkpoint as ckpt_io

    golden = dict(np.load(golden_path))
    inputs = golden_inputs(kind)
    tol = TOLERANCES[precision]
    dt = jnp.bfloat16 if precision == "bf16" else jnp.float32

    if kind == "unet":
        cfg = ckpt_io.load_config(ckpt_dir, C.UNetConfig)
        model = UNet2DConditionModel(cfg, dtype=dt, param_dtype=dt)
        params = ckpt_io.load_params(ckpt_dir, dt)
        out = model.apply(
            {"params": params},
            jnp.asarray(inputs["latents"]),
            jnp.asarray(inputs["timestep"]),
            jnp.asarray(inputs["context"]),
            jnp.asarray(inputs["pooled"]),
            jnp.asarray(inputs["time_ids"]),
        )
        np.testing.assert_allclose(
            np.asarray(out, np.float32), golden["eps"], **tol
        )
    elif kind == "vae":
        cfg = ckpt_io.load_config(ckpt_dir, C.VAEConfig)
        model = AutoencoderKL(cfg, dtype=dt, param_dtype=dt)
        params = ckpt_io.load_params(ckpt_dir, dt)
        mean, logvar = model.apply(
            {"params": params},
            jnp.asarray(inputs["image"]),
            method=model.encode_moments,
        )
        np.testing.assert_allclose(np.asarray(mean, np.float32), golden["mean"], **tol)
        dec = model.apply(
            {"params": params}, jnp.asarray(inputs["latents"]), method=model.decode
        )
        np.testing.assert_allclose(np.asarray(dec, np.float32), golden["decoded"], **tol)
    elif kind == "controlnet":
        from fastedit_tpu.models.controlnet import ControlNetModel

        cfg = ckpt_io.load_config(ckpt_dir, C.ControlNetConfig)
        model = ControlNetModel(cfg, dtype=dt, param_dtype=dt)
        params = ckpt_io.load_params(ckpt_dir, dt)
        down, mid = model.apply(
            {"params": params},
            jnp.asarray(inputs["latents"]),
            jnp.asarray(inputs["timestep"]),
            jnp.asarray(inputs["context"]),
            jnp.asarray(inputs["pooled"]),
            jnp.asarray(inputs["time_ids"]),
            jnp.asarray(inputs["cond_image"]),
            1.0,
        )
        for i, r in enumerate(down):
            np.testing.assert_allclose(
                np.asarray(r, np.float32), golden[f"down_{i}"], **tol
            )
        np.testing.assert_allclose(np.asarray(mid, np.float32), golden["mid"], **tol)
    elif kind in ("text_encoder", "text_encoder_2"):
        cfg = ckpt_io.load_config(ckpt_dir, C.CLIPTextConfig)
        model = CLIPTextModel(cfg, dtype=dt, param_dtype=dt)
        params = ckpt_io.load_params(ckpt_dir, dt)
        out = model.apply({"params": params}, jnp.asarray(inputs["input_ids"]))
        np.testing.assert_allclose(
            np.asarray(out.penultimate_hidden_state, np.float32),
            golden["penultimate"],
            **tol,
        )
        if "pooled" in golden:
            np.testing.assert_allclose(
                np.asarray(out.pooled_output, np.float32), golden["pooled"], **tol
            )
    else:
        raise ValueError(kind)
    print(f"[goldens] {kind}: OK within {precision} tolerances")


# --------------------------------------------------------------------------
# capture side (torch / diffusers / transformers; needs egress-installed deps)
# --------------------------------------------------------------------------


def capture(kind: str, src: str, out_path: str) -> None:
    """Run the reference torch module on ``golden_inputs`` and save the
    activations.  ``src`` is the HF snapshot component dir (the same one
    tools/convert_checkpoint.py consumes), so capture and conversion see the
    identical weights.  fp32 end to end: goldens are precision anchors.
    """
    import torch

    x = golden_inputs(kind)
    to_t = lambda a: torch.from_numpy(np.asarray(a))  # noqa: E731
    nchw = lambda a: to_t(a).permute(0, 3, 1, 2).contiguous()  # noqa: E731
    nhwc = lambda t: t.permute(0, 2, 3, 1).numpy()  # noqa: E731
    arrays = {}

    with torch.no_grad():
        if kind == "unet":
            from diffusers import UNet2DConditionModel

            unet = UNet2DConditionModel.from_pretrained(
                src, torch_dtype=torch.float32
            ).eval()
            eps = unet(
                nchw(x["latents"]),
                to_t(x["timestep"]),
                encoder_hidden_states=to_t(x["context"]),
                added_cond_kwargs={
                    "text_embeds": to_t(x["pooled"]),
                    "time_ids": to_t(x["time_ids"]),
                },
            ).sample
            arrays["eps"] = nhwc(eps)
        elif kind == "controlnet":
            from diffusers import ControlNetModel

            cn = ControlNetModel.from_pretrained(
                src, torch_dtype=torch.float32
            ).eval()
            down, mid = cn(
                nchw(x["latents"]),
                to_t(x["timestep"]),
                encoder_hidden_states=to_t(x["context"]),
                controlnet_cond=nchw(x["cond_image"]),
                conditioning_scale=1.0,
                added_cond_kwargs={
                    "text_embeds": to_t(x["pooled"]),
                    "time_ids": to_t(x["time_ids"]),
                },
                return_dict=False,
            )
            for i, r in enumerate(down):
                arrays[f"down_{i}"] = nhwc(r)
            arrays["mid"] = nhwc(mid)
        elif kind == "vae":
            from diffusers import AutoencoderKL

            vae = AutoencoderKL.from_pretrained(
                src, torch_dtype=torch.float32
            ).eval()
            posterior = vae.encode(nchw(x["image"])).latent_dist
            arrays["mean"] = nhwc(posterior.mean)
            arrays["decoded"] = nhwc(vae.decode(nchw(x["latents"])).sample)
        elif kind in ("text_encoder", "text_encoder_2"):
            import transformers

            ctor = (
                transformers.CLIPTextModelWithProjection
                if kind == "text_encoder_2"
                else transformers.CLIPTextModel
            )
            te = ctor.from_pretrained(src, torch_dtype=torch.float32).eval()
            outs = te(to_t(x["input_ids"]), output_hidden_states=True)
            arrays["penultimate"] = outs.hidden_states[-2].numpy()
            if kind == "text_encoder_2":
                arrays["pooled"] = outs.text_embeds.numpy()
        else:
            raise ValueError(kind)

    import os

    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    np.savez(out_path, **arrays)
    print(f"[goldens] captured {kind} -> {out_path} ({sorted(arrays)})")


CAPTURE_SNIPPET = r"""
# Run this on the torch/diffusers side to produce the golden .npz, e.g.:
#   from fastedit_tpu.tools.capture_goldens import golden_inputs
#   import numpy as np, torch
#   from diffusers import UNet2DConditionModel
#   unet = UNet2DConditionModel.from_pretrained(SRC, torch_dtype=torch.float32)
#   x = golden_inputs("unet")
#   with torch.no_grad():
#       eps = unet(
#           torch.from_numpy(x["latents"]).permute(0, 3, 1, 2),
#           torch.from_numpy(x["timestep"]),
#           encoder_hidden_states=torch.from_numpy(x["context"]),
#           added_cond_kwargs={
#               "text_embeds": torch.from_numpy(x["pooled"]),
#               "time_ids": torch.from_numpy(x["time_ids"]),
#           },
#       ).sample.permute(0, 2, 3, 1).numpy()
#   np.savez("golden_unet.npz", eps=eps)
"""


_KINDS = ["unet", "controlnet", "vae", "text_encoder", "text_encoder_2"]


def main(argv=None):
    p = argparse.ArgumentParser(description="Golden activation capture/compare")
    sub = p.add_subparsers(dest="cmd", required=True)
    cap = sub.add_parser("capture", help="torch side: run + save activations")
    cap.add_argument("--kind", required=True, choices=_KINDS)
    cap.add_argument("--src", required=True, help="HF snapshot component dir")
    cap.add_argument("--out", required=True, help="output .npz path")
    cmp_ = sub.add_parser("compare", help="JAX side: check our module")
    cmp_.add_argument("--kind", required=True, choices=_KINDS)
    cmp_.add_argument("--golden", required=True, help=".npz from capture")
    cmp_.add_argument("--ckpt", required=True, help="converted checkpoint dir")
    cmp_.add_argument("--precision", default="bf16", choices=["bf16", "fp32"])
    args = p.parse_args(argv)
    if args.cmd == "capture":
        capture(args.kind, args.src, args.out)
    else:
        compare(args.kind, args.golden, args.ckpt, args.precision)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
