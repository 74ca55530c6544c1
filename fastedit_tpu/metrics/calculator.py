"""MetricsCalculator — the six-metric evaluation facade.

API-compatible rebuild of reference src/metrics.py:150-387: same method
names, same conventions (pairwise metrics at 512x512 LANCZOS; CLIP score on
the un-resized uint8 image; DINO at 224 with ImageNet normalization,
layer-11 keys self-similarity MSE).

Learned backbones (LPIPS-SqueezeNet, CLIP ViT-B/16, DINO ViT-B/8) load from
``<weights_dir>`` (produced by tools/convert_checkpoint.py); without
converted weights they fall back to random init with a loud warning — SSIM/
PSNR/MSE stay exact either way.
"""

from __future__ import annotations

import os
import warnings
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from fastedit_tpu.metrics import functional as F
from fastedit_tpu.metrics.dino import (
    DINO_VITB8,
    DINOConfig,
    DINOViT,
    IMAGENET_MEAN,
    IMAGENET_STD,
    TINY_DINO,
    dino_distance,
)
from fastedit_tpu.metrics.lpips import LPIPS
from fastedit_tpu.models import configs as C
from fastedit_tpu.models.clip import CLIPTextModel, CLIPVisionModel
from fastedit_tpu.text.tokenizer import CLIPTokenizer
from fastedit_tpu.utils import checkpoint as ckpt_io

CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


class MetricsCalculator:
    """Six-metric calculator (SSIM, LPIPS, CLIP score, PSNR, MSE, DINO)."""

    def __init__(
        self,
        device: str = "tpu",
        weights_dir: Optional[str] = None,
        tiny: bool = False,
        init_seed: int = 0,
        allow_random: bool = False,
    ):
        self.device = device
        self.metric_size = (512, 512)
        weights_dir = weights_dir or os.path.join("checkpoints", "metrics")
        # report the REAL backend, not the requested string — an env
        # override (FASTEDIT_PLATFORM) or an unavailable accelerator can
        # make them differ, and the log line is what operators trust
        print(
            f"[MetricsCalculator] Initializing on {jax.default_backend()} "
            f"(requested: {device})..."
        )

        if tiny:
            self.clip_vision_cfg = C.TINY_CLIP_VISION
            clip_text_cfg = C.TINY_CLIP_TEXT
            self.dino_cfg: DINOConfig = TINY_DINO
        else:
            self.clip_vision_cfg = C.CLIP_B16_VISION
            clip_text_cfg = C.CLIP_B16_TEXT
            self.dino_cfg = DINO_VITB8

        self.lpips = LPIPS()
        self.clip_vision = CLIPVisionModel(self.clip_vision_cfg)
        self.clip_text = CLIPTextModel(clip_text_cfg)
        self.dino = DINOViT(self.dino_cfg)

        key = jax.random.PRNGKey(init_seed)
        self._params = {}
        loads = {
            "lpips": lambda: self.lpips.init(
                key, jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3))
            )["params"],
            "clip_vision": lambda: self.clip_vision.init(
                key,
                jnp.zeros(
                    (1, self.clip_vision_cfg.image_size,
                     self.clip_vision_cfg.image_size, 3)
                ),
            )["params"],
            "clip_text": lambda: self.clip_text.init(
                key, jnp.zeros((1, 77), jnp.int32)
            )["params"],
            "dino": lambda: self.dino.init(
                key,
                jnp.zeros((1, self.dino_cfg.image_size, self.dino_cfg.image_size, 3)),
                self.dino_cfg.num_layers - 1,
            )["params"],
        }
        missing = []
        self._lazy_init = {}
        for name, init_fn in loads.items():
            path = os.path.join(weights_dir, name)
            if os.path.isdir(path):
                self._params[name] = ckpt_io.load_params(path, jnp.float32)
            else:
                # LAZY: random fallback params are only materialized if a
                # learned metric actually runs (tiny smoke configs or
                # allow_random) — fail-closed instances report NaN without
                # ever compiling the init programs (~4 min on 1 CPU core).
                self._lazy_init[name] = init_fn
                missing.append(name)
        # Fail closed: learned metrics never silently produce random-weight
        # numbers (reference evaluate.py artifact integrity). Tiny mode is
        # a smoke configuration and exempt; ``allow_random`` is the explicit
        # opt-in (--allow_random_metrics in evaluate.py).
        self.random_backbones = tuple(missing) if not tiny else ()
        self.learned_enabled = not self.random_backbones or allow_random
        if missing and not tiny:
            msg = (
                f"[MetricsCalculator] no converted weights for {missing} under "
                f"{weights_dir}; LPIPS/CLIP/DINO "
                + (
                    "will use RANDOM weights (allow_random=True) — values are "
                    "not meaningful."
                    if allow_random
                    else "are DISABLED and will report NaN (pass "
                    "allow_random=True / --allow_random_metrics to override)."
                )
                + " SSIM/PSNR/MSE are unaffected. Run "
                "tools/convert_checkpoint.py to enable learned metrics."
            )
            warnings.warn(msg)
        tok_dir = os.path.join(weights_dir, "clip_tokenizer")
        if os.path.isdir(tok_dir):
            self.clip_tokenizer = CLIPTokenizer.from_dir(tok_dir)
        else:
            if (
                not tiny
                and not allow_random
                and "clip_text" not in self.random_backbones
            ):
                # Real CLIP weights but no real vocab: synthetic byte-vocab
                # ids bear no relation to the trained embedding table, so
                # clip_score would be garbage reported as real.  Fail closed
                # exactly like missing weights.
                self.random_backbones = self.random_backbones + (
                    "clip_tokenizer",
                )
                self.learned_enabled = False
                warnings.warn(
                    f"[MetricsCalculator] converted CLIP weights found but "
                    f"no tokenizer under {tok_dir}; learned metrics are "
                    f"DISABLED (NaN, same all-or-nothing policy as missing "
                    f"weights) — convert the tokenizer files "
                    f"(vocab.json/merges.txt) alongside the weights."
                )
            self.clip_tokenizer = CLIPTokenizer.synthetic(
                vocab_size=clip_text_cfg.vocab_size
            )

        def jit_f32(fn):
            """jit with true-f32 matmuls/convs: XLA:TPU lowers f32 dots to
            bf16 passes by default, which is fine for generation but NOT
            for metrics — SSIM's variance terms cancel catastrophically
            (metrics/functional.py blur note) and the learned backbones
            (LPIPS/CLIP/DINO) are parity-compared against fp32 torch
            references at 3-4 decimals."""

            def traced(*args, **kw):
                with jax.default_matmul_precision("highest"):
                    return fn(*args, **kw)

            return jax.jit(traced)

        self._jit_ssim = jit_f32(F.ssim)
        self._jit_psnr = jit_f32(F.psnr)
        self._jit_mse = jit_f32(F.mse)
        self._jit_lpips = jit_f32(
            lambda p, a, b: self.lpips.apply({"params": p}, a, b)
        )
        self._jit_clip = jit_f32(self._clip_score_impl)
        self._jit_dino = jit_f32(self._dino_impl)
        # per-image batched variants (evaluate.py --batch_size)
        self._jit_ssim_b = jit_f32(
            jax.vmap(lambda a, b: F.ssim(a[None], b[None]))
        )
        self._jit_psnr_b = jit_f32(
            jax.vmap(lambda a, b: F.psnr(a[None], b[None]))
        )
        self._jit_mse_b = jit_f32(jax.vmap(lambda a, b: F.mse(a[None], b[None])))
        print("[MetricsCalculator] Initialization complete!")

    def _backbone(self, name: str):
        """Backbone params, materializing the random fallback on first use."""
        if name not in self._params:
            self._params[name] = self._lazy_init.pop(name)()
        return self._params[name]

    # ----------------------------------------------------------- conversion

    def _pair_512(self, img1: Image.Image, img2: Image.Image):
        """Both images resized to 512x512 LANCZOS, [1, H, W, 3] in [0, 1]."""
        out = []
        for img in (img1, img2):
            if img.size != self.metric_size:
                img = img.resize(self.metric_size, Image.LANCZOS)
            out.append(
                jnp.asarray(np.asarray(img.convert("RGB"), dtype=np.float32) / 255.0)[
                    None
                ]
            )
        return out

    # ------------------------------------------------------------- metrics

    def calculate_ssim(self, img1: Image.Image, img2: Image.Image) -> float:
        a, b = self._pair_512(img1, img2)
        return float(self._jit_ssim(a, b))

    def calculate_psnr(self, img1: Image.Image, img2: Image.Image) -> float:
        a, b = self._pair_512(img1, img2)
        return float(self._jit_psnr(a, b))

    def calculate_mse(self, img1: Image.Image, img2: Image.Image) -> float:
        a, b = self._pair_512(img1, img2)
        return float(self._jit_mse(a, b))

    def calculate_lpips(self, img1: Image.Image, img2: Image.Image) -> float:
        if not self.learned_enabled:
            return float("nan")
        a, b = self._pair_512(img1, img2)
        return float(self._jit_lpips(self._backbone("lpips"), a * 2 - 1, b * 2 - 1)[0])

    def _clip_score_impl(self, params, pixels, ids):
        img_emb = self.clip_vision.apply({"params": params["clip_vision"]}, pixels)
        txt_emb = self.clip_text.apply(
            {"params": params["clip_text"]}, ids
        ).pooled_output
        img_emb = img_emb / jnp.linalg.norm(img_emb, axis=-1, keepdims=True)
        txt_emb = txt_emb / jnp.linalg.norm(txt_emb, axis=-1, keepdims=True)
        return jnp.maximum(100.0 * jnp.sum(img_emb * txt_emb, axis=-1), 0.0)  # [B]

    def calculate_clip_score(self, img: Image.Image, text: str) -> float:
        if not self.learned_enabled:
            return float("nan")
        size = self.clip_vision_cfg.image_size
        img = img.convert("RGB").resize((size, size), Image.BICUBIC)
        arr = np.asarray(img, dtype=np.float32) / 255.0
        arr = (arr - np.asarray(CLIP_IMAGE_MEAN)) / np.asarray(CLIP_IMAGE_STD)
        ids = jnp.asarray(self.clip_tokenizer.encode(text))[None]
        return float(
            self._jit_clip(
                {
                    "clip_vision": self._backbone("clip_vision"),
                    "clip_text": self._backbone("clip_text"),
                },
                jnp.asarray(arr, dtype=jnp.float32)[None],
                ids,
            )[0]
        )

    def _dino_impl(self, params, src, edit):
        layer = self.dino_cfg.num_layers - 1
        k_src = self.dino.apply({"params": params}, src, layer)
        k_edit = self.dino.apply({"params": params}, edit, layer)
        return dino_distance(k_src, k_edit)

    def calculate_dino_distance(
        self, source_img: Image.Image, edited_img: Image.Image
    ) -> float:
        if not self.learned_enabled:
            return float("nan")
        size = self.dino_cfg.image_size

        def prep(img):
            arr = (
                np.asarray(
                    img.convert("RGB").resize((size, size), Image.BILINEAR),
                    dtype=np.float32,
                )
                / 255.0
            )
            arr = (arr - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
            return jnp.asarray(arr, dtype=jnp.float32)[None]

        return float(
            self._jit_dino(self._backbone("dino"), prep(source_img), prep(edited_img))[0]
        )

    def calculate_all_metrics(
        self, source_img: Image.Image, edited_img: Image.Image, prompt: str
    ) -> dict:
        """All six metrics (reference src/metrics.py:349-381 conventions)."""
        return {
            "ssim": self.calculate_ssim(source_img, edited_img),
            "lpips": self.calculate_lpips(source_img, edited_img),
            "clip_score": self.calculate_clip_score(edited_img, prompt),
            "psnr": self.calculate_psnr(source_img, edited_img),
            "mse": self.calculate_mse(source_img, edited_img),
            "dino_distance": self.calculate_dino_distance(source_img, edited_img),
        }

    def calculate_all_metrics_batch(
        self, source_imgs, edited_imgs, prompts
    ) -> list:
        """Batched six-metric computation: same per-image values as
        calculate_all_metrics but one device dispatch per metric for the
        whole batch (the reference evaluates strictly per image; batching
        amortizes dispatch + pipeline overhead ~10x on TPU)."""
        n = len(source_imgs)
        assert len(edited_imgs) == n and len(prompts) == n

        def stack_512(images):
            return jnp.asarray(
                np.stack(
                    [
                        np.asarray(
                            img.convert("RGB").resize(
                                self.metric_size, Image.LANCZOS
                            )
                            if img.size != self.metric_size
                            else img.convert("RGB"),
                            dtype=np.float32,
                        )
                        for img in images
                    ]
                )
                / 255.0
            )

        src = stack_512(source_imgs)
        edt = stack_512(edited_imgs)
        ssim = np.asarray(self._jit_ssim_b(src, edt))
        psnr = np.asarray(self._jit_psnr_b(src, edt))
        mse = np.asarray(self._jit_mse_b(src, edt))
        if not self.learned_enabled:
            nan = np.full((n,), np.nan, np.float32)
            return [
                {
                    "ssim": float(ssim[i]),
                    "lpips": float(nan[i]),
                    "clip_score": float(nan[i]),
                    "psnr": float(psnr[i]),
                    "mse": float(mse[i]),
                    "dino_distance": float(nan[i]),
                }
                for i in range(n)
            ]
        lpips = np.asarray(
            self._jit_lpips(self._backbone("lpips"), src * 2 - 1, edt * 2 - 1)
        )

        size = self.clip_vision_cfg.image_size
        clip_pixels = np.stack(
            [
                (
                    np.asarray(
                        img.convert("RGB").resize((size, size), Image.BICUBIC),
                        dtype=np.float32,
                    )
                    / 255.0
                    - np.asarray(CLIP_IMAGE_MEAN)
                )
                / np.asarray(CLIP_IMAGE_STD)
                for img in edited_imgs
            ]
        ).astype(np.float32)
        ids = jnp.asarray(self.clip_tokenizer.batch_encode(list(prompts)))
        clip = np.asarray(
            self._jit_clip(
                {
                    "clip_vision": self._backbone("clip_vision"),
                    "clip_text": self._backbone("clip_text"),
                },
                jnp.asarray(clip_pixels),
                ids,
            )
        )

        dsize = self.dino_cfg.image_size

        def stack_dino(images):
            arr = np.stack(
                [
                    np.asarray(
                        img.convert("RGB").resize((dsize, dsize), Image.BILINEAR),
                        dtype=np.float32,
                    )
                    / 255.0
                    for img in images
                ]
            )
            arr = (arr - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
            return jnp.asarray(arr, dtype=jnp.float32)

        dino = np.asarray(
            self._jit_dino(
                self._backbone("dino"), stack_dino(source_imgs), stack_dino(edited_imgs)
            )
        )
        return [
            {
                "ssim": float(ssim[i]),
                "lpips": float(lpips[i]),
                "clip_score": float(clip[i]),
                "psnr": float(psnr[i]),
                "mse": float(mse[i]),
                "dino_distance": float(dino[i]),
            }
            for i in range(n)
        ]

    def clear_memory(self):
        """API parity no-op (no CUDA cache to empty on TPU)."""
