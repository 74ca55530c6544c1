"""Bring-up dry-run against mocked snapshots (round-2 verdict Next #9).

The first machine with network egress gets ONE cheap shot at
``tools/bring_up.sh``; a path typo or converter-arg drift there costs the
whole bring-up hour.  These tests execute the REAL script body (steps 2-5,
``SKIP_DOWNLOAD=1``) against fake snapshots whose config.json files are the
vendored fixtures verbatim and whose safetensors are zero tensors with the
exact ``hf_inventory`` shapes — so the config drift gate, the converter
invocations, the checkpoint layout, and the step-4/5 skip branches all run
for real; only the downloads and the weights' values are fake.

Reference artifact being defended: the weight-binding sequence of
run_benchmark_colab.ipynb cells 11-12 / src/pipeline.py:82-154.
"""

import json
import os
import subprocess

import numpy as np
import pytest
from safetensors.numpy import save_file

from fastedit_tpu.tools import hf_inventory as I, hf_vendored as V

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_config(d, cfg: dict):
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f)


def _write_sd(d, inv: dict, name="model.safetensors"):
    os.makedirs(d, exist_ok=True)
    save_file(
        {k: np.zeros(s, np.float16) for k, s in inv.items()},
        os.path.join(d, name),
    )


def _write_sd_random(d, inv: dict, name="model.safetensors", seed=0):
    """Random-valued mock weights: zero weights would zero the feature maps
    and make normalized embeddings 0/0 — the metrics flip test needs fake
    but non-degenerate values."""
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(seed)
    save_file(
        {
            # np.asarray: standard_normal(()) returns a python float, and
            # safetensors requires ndarrays (logit_scale is 0-d).
            k: np.asarray(rng.standard_normal(s) * 0.05, dtype=np.float16)
            for k, s in inv.items()
        },
        os.path.join(d, name),
    )


def _write_tokenizer(d):
    """Byte-complete mock vocab (every byte char + </w> variants), so BPE
    can encode arbitrary text — the token-golden capture step runs on it."""
    from fastedit_tpu.text.tokenizer import bytes_to_unicode

    os.makedirs(d, exist_ok=True)
    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1}
    for c in bytes_to_unicode().values():
        vocab[c] = len(vocab)
        vocab[c + "</w>"] = len(vocab)
    with open(os.path.join(d, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(d, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")


def _torch_meta_sd(ctor):
    torch = pytest.importorskip("torch")
    from accelerate import init_empty_weights

    with init_empty_weights():
        model = ctor()
    return {k: tuple(v.shape) for k, v in model.state_dict().items()}


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    """Scratch root for the mocked snapshots AND the converted outputs.

    ~1 GB of tensor bytes flows through here per test (two 160 MB mocked
    VAE safetensors in, bf16+fp32 checkpoints out); on this host's disk
    that is ~35 s of pure IO syscall time, on tmpfs it is seconds — so
    prefer /dev/shm when it exists."""
    import pathlib
    import shutil
    import tempfile

    if os.path.isdir("/dev/shm"):
        d = pathlib.Path(tempfile.mkdtemp(prefix="bring_up_", dir="/dev/shm"))
        yield d
        shutil.rmtree(d, ignore_errors=True)
    else:
        yield tmp_path_factory.mktemp("bring_up_root")


@pytest.fixture(scope="module")
def mock_snap(workdir):
    """Minimal snapshot tree: all five config.json files for step 2, plus
    the cheap component weights (VAE twice, tokenizers)."""
    work = workdir / "snapshots_work"
    work.mkdir()
    snap = work / "snapshots"
    s = snap / "stabilityai__stable-diffusion-xl-base-1.0"

    _write_config(s / "unet", V.SDXL_UNET_CONFIG)
    _write_config(snap / "segmind__SSD-1B" / "unet", V.SSD1B_UNET_CONFIG)
    _write_config(
        snap / "diffusers__controlnet-canny-sdxl-1.0-small",
        V.CONTROLNET_SMALL_CONFIG,
    )
    _write_config(
        snap / "diffusers__controlnet-canny-sdxl-1.0", V.CONTROLNET_FULL_CONFIG
    )
    _write_config(snap / "madebyollin__sdxl-vae-fp16-fix", V.VAE_CONFIG)
    _write_config(snap / "stabilityai__sdxl-vae", V.VAE_CONFIG)

    vae_inv = I.vae_inventory(V.VAE_CONFIG)
    _write_sd(snap / "madebyollin__sdxl-vae-fp16-fix", vae_inv)
    _write_sd(snap / "stabilityai__sdxl-vae", vae_inv)
    _write_tokenizer(s / "tokenizer")
    _write_tokenizer(s / "tokenizer_2")
    return work


def _run_script(work, ckpt_dir, components, timeout=1500, extra_env=None):
    env = dict(os.environ)
    env.update(
        SKIP_DOWNLOAD="1",
        SKIP_GOLDENS="1",
        MODEL="ssd-1b",
        DTYPE="bf16",
        COMPONENTS=components,
        CKPT_DIR=str(ckpt_dir),
        PIE_BENCH_DIR=str(work / "no_such_pie_bench"),
        # Mocked-vocab token goldens must never land in the repo fixture.
        TOKEN_GOLDENS_FIXTURE=str(work / "token_goldens.json"),
        # Likewise mocked config.json captures (step 2's capture phase).
        CONFIG_GOLDENS_FIXTURE=str(work / "config_goldens.json"),
        SCHED_GOLDENS_FIXTURE=str(work / "sched_goldens.json"),
    )
    if not (work / "token_goldens.json").exists():
        import shutil

        shutil.copy(
            os.path.join(REPO, "tests", "fixtures", "clip_token_goldens.json"),
            work / "token_goldens.json",
        )
    env.update(extra_env or {})
    return subprocess.run(
        ["bash", "tools/bring_up.sh", str(work)],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
    )


def test_bring_up_vae_tokenizer_dryrun(mock_snap, workdir):
    repo_fixture = os.path.join(
        REPO, "tests", "fixtures", "clip_token_goldens.json"
    )
    repo_fx_before = open(repo_fixture).read()
    ckpt = workdir / "ckpt_vae_tok"
    r = _run_script(mock_snap, ckpt, "vae tokenizer")
    assert r.returncode == 0, r.stdout + r.stderr
    # step 2 verified every vendored fixture
    for name in ("SDXL unet", "SSD-1B unet", "ControlNet small",
                 "ControlNet full", "fp16-fix VAE"):
        assert f"ok: {name}" in r.stdout, r.stdout
    # step 3 produced the checkpoint layout utils/checkpoint.py documents
    assert (ckpt / "vae" / "weights.safetensors").exists()
    assert (ckpt / "vae" / "config.json").exists()
    assert (ckpt / "vae-fp32" / "weights.safetensors").exists()
    assert (ckpt / "tokenizer" / "vocab.json").exists()
    assert (ckpt / "tokenizer_2" / "merges.txt").exists()
    # the token-golden capture ran against the scratch fixture (and the
    # repo fixture stayed untouched — enforced by TOKEN_GOLDENS_FIXTURE)
    scratch = json.loads((mock_snap / "token_goldens.json").read_text())
    assert scratch["input_ids"] is not None
    assert scratch["oracle"].startswith("transformers.CLIPTokenizer")
    assert open(repo_fixture).read() == repo_fx_before
    # steps 4/5 took their documented skip branches (SKIP_GOLDENS makes
    # step 4 deterministic whether or not diffusers is installed; step 5
    # refuses to run the parity gate on a COMPONENTS subset)
    assert "skipping golden capture" in r.stdout
    assert "COMPONENTS subset run" in r.stdout
    assert "bring-up complete" in r.stdout


def test_bring_up_detects_config_drift(mock_snap, workdir):
    """A drifted upstream config must abort the bring-up before conversion."""
    drifted = dict(V.SSD1B_UNET_CONFIG)
    drifted["layers_per_block"] = 3
    path = (
        mock_snap / "snapshots" / "segmind__SSD-1B" / "unet" / "config.json"
    )
    orig = path.read_text()
    try:
        path.write_text(json.dumps(drifted))
        r = _run_script(mock_snap, workdir / "ckpt_drift", "vae tokenizer")
        assert r.returncode != 0
        assert "DRIFT in SSD-1B unet" in r.stdout, r.stdout
        assert "hf_vendored.py" in r.stdout  # remediation hint prints
    finally:
        path.write_text(orig)


@pytest.mark.slow
def test_bring_up_metrics_dryrun_flips_evaluate_non_nan(mock_snap, workdir):
    """Metrics-only bring-up from mocked (random-valued) snapshots, then the
    NaN -> real-values flip: evaluate.py pointed at the converted metric
    checkpoints must emit non-NaN LPIPS/CLIP/DINO WITHOUT
    --allow_random_metrics (round-3 verdict Next #8).  Values are
    meaningless (fake weights); only the end-to-end enablement is under
    test."""
    torch = pytest.importorskip("torch")
    import transformers

    snap = mock_snap / "snapshots"
    b16 = snap / "openai__clip-vit-base-patch16"
    cfg_b16 = transformers.CLIPConfig(
        projection_dim=V.CLIP_B16_CONFIG["projection_dim"],
        text_config=V.CLIP_B16_CONFIG["text_config"],
        vision_config=V.CLIP_B16_CONFIG["vision_config"],
    )
    _write_config(b16, V.CLIP_B16_CONFIG)
    _write_sd_random(
        b16, _torch_meta_sd(lambda: transformers.CLIPModel(cfg_b16)), seed=1
    )
    _write_tokenizer(b16)

    rng = np.random.default_rng(2)

    def rand_pth(inv, path):
        torch.save(
            {
                k: torch.from_numpy(
                    np.asarray(rng.standard_normal(v) * 0.05, dtype=np.float32)
                )
                for k, v in inv.items()
            },
            path,
        )

    rand_pth(
        I.dino_vit_inventory(embed_dim=768, depth=12, patch_size=8, image_size=224),
        snap / "dino_vitbase8_pretrain.pth",
    )
    rand_pth(I.squeezenet_features_inventory(), snap / "squeezenet1_1.pth")
    rand_pth(I.lpips_heads_inventory(), snap / "lpips_squeeze_v0.1.pth")

    ckpt = workdir / "ckpt_metrics"
    r = _run_script(mock_snap, ckpt, "metrics", timeout=3600)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    for sub in (
        "metrics/clip_vision", "metrics/clip_text", "metrics/dino",
        "metrics/lpips",
    ):
        assert (ckpt / sub / "weights.safetensors").exists(), sub
    assert (ckpt / "metrics" / "clip_tokenizer" / "vocab.json").exists()

    # --- the flip: full-size backbones, learned metrics enabled, non-NaN ---
    import csv

    from PIL import Image

    import evaluate as evaluate_cli

    tree = workdir / "flip"
    rel = "0/img.jpg"
    for sub, seed in (("src", 3), ("out", 4)):
        p = tree / sub / rel
        os.makedirs(p.parent, exist_ok=True)
        Image.fromarray(
            np.random.default_rng(seed).integers(
                0, 255, (64, 64, 3), dtype=np.uint8
            ),
            "RGB",
        ).save(p)
    (tree / "mapping.json").write_text(
        json.dumps({"id0": {"image_path": rel, "editing_prompt": "a cat"}})
    )
    rc = evaluate_cli.main(
        [
            "--mapping_file", str(tree / "mapping.json"),
            "--source_dir", str(tree / "src"),
            "--outputs_dir", str(tree / "out"),
            "--results_file", str(tree / "metrics.csv"),
            "--summary_file", str(tree / "summary.json"),
            "--device", "cpu",
            "--metrics_weights", str(ckpt / "metrics"),
            "--batch_size", "1",
        ]
    )
    assert rc == 0
    with open(tree / "metrics.csv") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 1
    for col in ("ssim", "psnr", "mse", "lpips", "clip_score", "dino_distance"):
        v = float(rows[0][col])
        assert np.isfinite(v), f"{col} must be non-NaN with converted weights"


@pytest.mark.slow
def test_bring_up_full_dryrun(mock_snap, workdir):
    """Every step-3 component converts from mocked snapshots, including the
    1.3 B-param SSD-1B UNet, both ControlNets, CLIP towers, and the torch
    .pth metric backbones (several minutes of zero-tensor IO)."""
    torch = pytest.importorskip("torch")
    import transformers

    snap = mock_snap / "snapshots"
    s = snap / "stabilityai__stable-diffusion-xl-base-1.0"

    lcm = snap / "latent-consistency__lcm-ssd-1b" / "unet"
    _write_config(lcm, V.SSD1B_UNET_CONFIG)
    _write_sd(lcm, I.unet_inventory(V.SSD1B_UNET_CONFIG))
    _write_sd(
        snap / "diffusers__controlnet-canny-sdxl-1.0-small",
        I.controlnet_inventory(V.CONTROLNET_SMALL_CONFIG),
    )
    _write_sd(
        snap / "diffusers__controlnet-canny-sdxl-1.0",
        I.controlnet_inventory(V.CONTROLNET_FULL_CONFIG),
    )

    cfg_l = transformers.CLIPTextConfig(**V.CLIP_VIT_L_TEXT_CONFIG)
    _write_config(s / "text_encoder", V.CLIP_VIT_L_TEXT_CONFIG)
    _write_sd(
        s / "text_encoder",
        _torch_meta_sd(lambda: transformers.CLIPTextModel(cfg_l)),
    )
    cfg_g = transformers.CLIPTextConfig(**V.CLIP_BIGG_TEXT_CONFIG)
    _write_config(s / "text_encoder_2", V.CLIP_BIGG_TEXT_CONFIG)
    _write_sd(
        s / "text_encoder_2",
        _torch_meta_sd(
            lambda: transformers.CLIPTextModelWithProjection(cfg_g)
        ),
    )

    b16 = snap / "openai__clip-vit-base-patch16"
    cfg_b16 = transformers.CLIPConfig(
        projection_dim=V.CLIP_B16_CONFIG["projection_dim"],
        text_config=V.CLIP_B16_CONFIG["text_config"],
        vision_config=V.CLIP_B16_CONFIG["vision_config"],
    )
    _write_config(b16, V.CLIP_B16_CONFIG)
    _write_sd(b16, _torch_meta_sd(lambda: transformers.CLIPModel(cfg_b16)))
    _write_tokenizer(b16)

    dino_inv = I.dino_vit_inventory(
        embed_dim=768, depth=12, patch_size=8, image_size=224
    )
    torch.save(
        {k: torch.zeros(v) for k, v in dino_inv.items()},
        snap / "dino_vitbase8_pretrain.pth",
    )
    torch.save(
        {
            k: torch.zeros(v)
            for k, v in I.squeezenet_features_inventory().items()
        },
        snap / "squeezenet1_1.pth",
    )
    torch.save(
        {k: torch.zeros(v) for k, v in I.lpips_heads_inventory().items()},
        snap / "lpips_squeeze_v0.1.pth",
    )

    ckpt = workdir / "ckpt_full"
    r = _run_script(
        mock_snap, ckpt, "unet controlnet vae text metrics tokenizer",
        timeout=3600,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    for sub in (
        "ssd-1b/unet", "controlnet-small", "controlnet-full", "vae",
        "vae-fp32", "text_encoder", "text_encoder_2", "metrics/clip_vision",
        "metrics/clip_text", "metrics/dino", "metrics/lpips",
    ):
        assert (ckpt / sub / "weights.safetensors").exists(), sub
    assert "bring-up complete" in r.stdout
