"""Unit tests for the DP sweep's background chunk loader (parallel/batch.py).

The loader thread decodes, resizes and (when given ``editor.stage_inputs``)
device-places chunk i+1 while chunk i computes.  Per-image decode failures
are isolated; a *staging* failure (transient device_put error) must degrade
to the host-batch path rather than killing the whole sweep.
"""

import numpy as np
import pytest
from PIL import Image

from fastedit_tpu.parallel.batch import _load_chunk


@pytest.fixture
def chunk(tmp_path):
    paths = []
    for i in range(3):
        p = tmp_path / f"img_{i}.png"
        Image.fromarray(
            np.full((16, 16, 3), i * 40, dtype=np.uint8), "RGB"
        ).save(p)
        paths.append(str(p))
    return [(f"id{i}", {}, p, f"/out/{i}.jpg") for i, p in enumerate(paths)]


def test_load_chunk_decodes_and_resizes(chunk):
    batch, bad = _load_chunk(chunk, 32)
    assert bad == {}
    assert batch.shape == (3, 32, 32, 3) and batch.dtype == np.uint8


def test_load_chunk_isolates_bad_images(chunk, tmp_path):
    broken = tmp_path / "broken.png"
    broken.write_bytes(b"not an image")
    chunk[1] = ("id1", {}, str(broken), "/out/1.jpg")
    batch, bad = _load_chunk(chunk, 32)
    assert list(bad) == [1]
    # slot filled with a neighbor so the device batch shape is unaffected
    assert batch.shape == (3, 32, 32, 3)
    np.testing.assert_array_equal(batch[1], batch[0])


def test_load_chunk_all_bad(tmp_path):
    broken = tmp_path / "b.png"
    broken.write_bytes(b"junk")
    chunk = [("id0", {}, str(broken), "/out/0.jpg")]
    batch, bad = _load_chunk(chunk, 32)
    assert batch is None and list(bad) == [0]


def test_load_chunk_staging_failure_degrades_to_host_batch(chunk):
    """A device staging exception hands back the host batch (losing only the
    double-buffering for that chunk) instead of propagating into the sweep's
    unguarded ``load_fut.result()``."""

    def exploding_stage(batch):
        raise RuntimeError("transient device_put failure")

    batch, bad = _load_chunk(chunk, 32, stage=exploding_stage)
    assert bad == {}
    assert isinstance(batch, np.ndarray) and batch.shape == (3, 32, 32, 3)


def test_load_chunk_stage_result_passed_through(chunk):
    batch, bad = _load_chunk(chunk, 32, stage=lambda b: ("staged", b.shape))
    assert batch == ("staged", (3, 32, 32, 3))
