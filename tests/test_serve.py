"""Serving layer: dynamic batching semantics + the HTTP front-end.

The reference has no serving story (its only loop is the sequential batch
CLI, reference run_batch.py:176); fastedit_tpu/serve.py adds one for
online traffic.  These tests pin the properties that make batching safe:
coalescing is semantically invisible (a batched request returns the same
image it would get alone), groups with different sampler settings never
share a device batch, and backpressure/shutdown behave.
"""

import base64
import http.client
import io
import json
import threading
import time

import numpy as np
import pytest
from PIL import Image

from fastedit_tpu.serve import (
    EditParams,
    EditService,
    ServiceOverloaded,
    make_http_server,
)


def _img(seed=0, size=48):
    rng = np.random.default_rng(seed)
    return Image.fromarray(rng.integers(0, 255, (size, size, 3), dtype=np.uint8))


def _close(a: Image.Image, b: Image.Image, tol=2):
    x = np.asarray(a).astype(np.int16)
    y = np.asarray(b).astype(np.int16)
    assert x.shape == y.shape
    np.testing.assert_allclose(x, y, atol=tol)


@pytest.fixture(scope="module")
def service(tiny_editor_f32):
    svc = EditService(tiny_editor_f32, max_batch=4, batch_window_ms=300.0)
    yield svc
    svc.close()


def test_single_edit_roundtrip(service, tiny_editor_f32):
    out = service.edit(_img(1), "a red bicycle", timeout=300)
    r = tiny_editor_f32.resolution
    assert out.size == (r, r)
    s = service.stats()
    assert s["completed"] >= 1 and s["failed"] == 0


def test_concurrent_requests_coalesce_into_one_batch(service):
    before = service.stats()["batches"]
    params = EditParams(seed=7)
    futs = [
        service.submit(_img(i), f"prompt {i}", params) for i in range(4)
    ]
    outs = [f.result(timeout=300) for f in futs]
    assert len(outs) == 4
    after = service.stats()
    # all four shared one device batch (window is 300 ms; submissions took
    # microseconds) — the histogram gained exactly one size-4 entry
    assert after["batches"] == before + 1
    assert after["batch_size_hist"].get("4", 0) >= 1


def test_batched_result_matches_solo_result(service, tiny_editor_f32):
    """Coalescing must be invisible: same image whether batched or alone."""
    params = EditParams(seed=11)
    img_a, img_b = _img(21), _img(22)
    futs = [
        service.submit(img_a, "a red bicycle", params),
        service.submit(img_b, "a blue car", params),
    ]
    batched = [f.result(timeout=300) for f in futs]
    solo = [
        tiny_editor_f32.edit(img_a, "a red bicycle", seed=11),
        tiny_editor_f32.edit(img_b, "a blue car", seed=11),
    ]
    for b, s in zip(batched, solo):
        _close(b, s)


def test_different_params_never_share_a_batch(service):
    before = service.stats()["batches"]
    futs = [
        service.submit(_img(1), "p", EditParams(guidance_scale=1.5, seed=1)),
        service.submit(_img(2), "p", EditParams(guidance_scale=2.0, seed=1)),
    ]
    for f in futs:
        f.result(timeout=300)
    assert service.stats()["batches"] == before + 2


def test_padding_slices_results(service):
    """3 requests pad the program to batch 4 but return exactly 3 images."""
    params = EditParams(seed=3)
    futs = [service.submit(_img(i), f"q {i}", params) for i in range(3)]
    outs = [f.result(timeout=300) for f in futs]
    assert len(outs) == 3
    assert service.stats()["batch_size_hist"].get("3", 0) >= 1


def test_backpressure_rejects_when_queue_full(tiny_editor_f32):
    svc = EditService(tiny_editor_f32, max_batch=1, max_queue=0)
    try:
        with pytest.raises(ServiceOverloaded):
            svc.submit(_img(), "p")
        assert svc.stats()["rejected"] == 1
    finally:
        svc.close()


def test_close_rejects_new_work(tiny_editor_f32):
    svc = EditService(tiny_editor_f32, max_batch=2)
    svc.close()
    with pytest.raises(RuntimeError):
        svc.submit(_img(), "p")
    svc.close()  # idempotent


# ----------------------------------------------------------------- HTTP


@pytest.fixture(scope="module")
def http_port(service):
    httpd = make_http_server(service, "127.0.0.1", 0, request_timeout_s=300)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield httpd.server_address[1]
    httpd.shutdown()
    httpd.server_close()


def _request(port, method, path, body=None):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
    try:
        conn.request(
            method,
            path,
            body=None if body is None else json.dumps(body),
            headers={"Content-Type": "application/json"},
        )
        resp = conn.getresponse()
        return resp.status, json.loads(resp.read())
    finally:
        conn.close()


def test_http_healthz_and_stats(http_port):
    code, body = _request(http_port, "GET", "/healthz")
    assert code == 200 and body["status"] == "ok" and body["model"] == "tiny"
    code, body = _request(http_port, "GET", "/stats")
    assert code == 200 and "batches" in body and "queue_depth" in body


def test_http_edit_roundtrip(http_port, tiny_editor_f32):
    buf = io.BytesIO()
    _img(5).save(buf, format="PNG")
    code, body = _request(
        http_port,
        "POST",
        "/v1/edit",
        {
            "image": base64.b64encode(buf.getvalue()).decode("ascii"),
            "prompt": "a red bicycle",
            "seed": 4,
            "format": "png",
        },
    )
    assert code == 200, body
    out = Image.open(io.BytesIO(base64.b64decode(body["image"])))
    r = tiny_editor_f32.resolution
    assert out.size == (r, r) and body["format"] == "png"
    assert body["latency_ms"] > 0
    # PNG round-trip is lossless: must equal the direct editor result
    direct = tiny_editor_f32.edit(_img(5), "a red bicycle", seed=4)
    _close(out.convert("RGB"), direct)


def test_http_bad_requests(http_port):
    code, body = _request(http_port, "GET", "/nope")
    assert code == 404
    code, body = _request(http_port, "POST", "/v1/edit", {"prompt": "no image"})
    assert code == 400 and "error" in body
    code, body = _request(
        http_port, "POST", "/v1/edit", {"image": "!!notb64", "prompt": "x"}
    )
    assert code == 400


def test_cli_parser_defaults():
    import serve as serve_cli

    args = serve_cli.build_parser().parse_args([])
    assert args.model == "ssd-1b" and args.max_batch == 4 and args.port == 8000
