"""Production serving: dynamic request batching + a stdlib HTTP front-end.

The reference is a research repo — its only "serving" story is the
sequential CLI loop (reference run_batch.py:176).  On TPU, per-request
dispatch leaves the chip idle between edits, while the batch-4 edit
program sustains ~40% more edits/min than four single-image dispatches
(bench.py `edits_per_min_per_chip_batch4_device`).  This module closes
that gap for online traffic:

  * :class:`EditService` wraps one :class:`~fastedit_tpu.pipeline.editor.
    FastEditor` with a dispatcher thread that coalesces concurrent
    requests into device batches (grouped by identical sampler settings),
    and a completer thread that overlaps each batch's device->host
    readback with the next batch's host-side prep — the same lag-1
    pipeline the offline sweep runner uses (parallel/batch.py).
  * :func:`make_http_server` serves it over HTTP (stdlib
    ``ThreadingHTTPServer`` — no extra dependencies): ``POST /v1/edit``
    with a base64 image + prompt, ``GET /healthz``, ``GET /stats``.

Batch shapes are padded to powers of two (bounded set of compiled XLA
programs — the same policy the editor's prompt-encoder batching uses), so
a bursty open-world request mix compiles at most ``log2(max_batch)+1``
edit programs.

Requests whose sampler settings differ (guidance, steps, strength, seed,
...) never share a device batch: batching must be semantically invisible
— a request returns the same image it would have gotten alone.  With
``seed=None`` each image in a coalesced batch draws independent noise
(``tile_noise`` is only engaged for explicitly seeded requests, whose
group key pins the seed).
"""

from __future__ import annotations

import base64
import collections
import dataclasses
import io
import json
import threading
import time
from concurrent.futures import Future
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np
from PIL import Image

from fastedit_tpu.utils.logging import get_logger

log = get_logger("serve")


class ServiceOverloaded(RuntimeError):
    """Raised by :meth:`EditService.submit` when the queue is full.

    Backpressure signal: the HTTP front-end maps it to 503 so load
    balancers retry elsewhere instead of stacking unbounded work on a
    busy chip."""


@dataclasses.dataclass(frozen=True)
class EditParams:
    """Sampler settings that define a batchable group.

    Two requests may share a device batch iff their EditParams are equal
    (the batch program broadcasts these over the whole batch)."""

    negative_prompt: str = ""
    strength: float = 0.80
    num_inference_steps: int = 4
    guidance_scale: float = 1.5
    controlnet_conditioning_scale: float = 0.5
    canny_low_threshold: int = 100
    canny_high_threshold: int = 200
    seed: Optional[int] = None


@dataclasses.dataclass
class _WorkItem:
    future: Future
    image: Image.Image
    prompt: str
    params: EditParams
    enqueued: float


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


class EditService:
    """Dynamic-batching wrapper around one FastEditor.

    Parameters
    ----------
    editor:
        A constructed :class:`FastEditor` (the service takes ownership of
        its dispatch; concurrent direct ``editor.edit`` calls from other
        threads are not supported).
    max_batch:
        Largest device batch to form.  On a 16 GB v5e chip the SSD-1B
        editor runs batch 4 comfortably (UNet batch 8 under CFG).
    batch_window_ms:
        How long the dispatcher waits for more same-group requests after
        the first one arrives.  0 disables coalescing-by-waiting (only
        already-queued requests batch together).
    max_queue:
        Backpressure bound: ``submit`` raises :class:`ServiceOverloaded`
        when this many requests are already waiting.
    pad_to_pow2:
        Pad batches to the next power of two by repeating the last row
        (results sliced off) so the set of compiled programs is bounded.
    """

    def __init__(
        self,
        editor,
        max_batch: int = 4,
        batch_window_ms: float = 10.0,
        max_queue: int = 256,
        pad_to_pow2: bool = True,
    ):
        if max_batch < 1:
            raise ValueError("max_batch must be >= 1")
        self.editor = editor
        self.max_batch = int(max_batch)
        self.batch_window_s = float(batch_window_ms) / 1000.0
        self.max_queue = int(max_queue)
        self.pad_to_pow2 = bool(pad_to_pow2)

        self._q: collections.deque[_WorkItem] = collections.deque()
        self._cv = threading.Condition()
        self._closed = False
        # completion queue carries (PendingEdit, group, dispatch_t0);
        # bounded at 2 so the dispatcher can run at most one batch ahead
        # of the completer (lag-1 pipeline, same depth as parallel/batch.py)
        self._cq: "collections.deque" = collections.deque()
        self._cq_cv = threading.Condition()
        self._cq_capacity = 2

        self._stats_lock = threading.Lock()
        self._stats = {
            "requests": 0,
            "completed": 0,
            "failed": 0,
            "rejected": 0,
            "batches": 0,
            "batch_size_hist": {},
            "latency_ms_sum": 0.0,
            "latency_ms_max": 0.0,
        }

        self._dispatcher = threading.Thread(
            target=self._dispatch_loop, name="edit-dispatch", daemon=True
        )
        self._completer = threading.Thread(
            target=self._complete_loop, name="edit-complete", daemon=True
        )
        self._dispatcher.start()
        self._completer.start()

    # ------------------------------------------------------------- public

    def submit(
        self, image: Image.Image, prompt: str, params: Optional[EditParams] = None
    ) -> Future:
        """Enqueue one edit; returns a Future resolving to the PIL image."""
        params = params or EditParams()
        fut: Future = Future()
        item = _WorkItem(fut, image, str(prompt), params, time.monotonic())
        with self._cv:
            if self._closed:
                raise RuntimeError("EditService is closed")
            if len(self._q) >= self.max_queue:
                with self._stats_lock:
                    self._stats["rejected"] += 1
                raise ServiceOverloaded(
                    f"queue full ({self.max_queue} requests waiting)"
                )
            self._q.append(item)
            with self._stats_lock:
                self._stats["requests"] += 1
            self._cv.notify_all()
        return fut

    def edit(
        self,
        image: Image.Image,
        prompt: str,
        params: Optional[EditParams] = None,
        timeout: Optional[float] = None,
    ) -> Image.Image:
        """Synchronous convenience wrapper over :meth:`submit`."""
        return self.submit(image, prompt, params).result(timeout=timeout)

    def stats(self) -> dict:
        with self._stats_lock:
            s = dict(self._stats)
            s["batch_size_hist"] = dict(s["batch_size_hist"])
        with self._cv:
            s["queue_depth"] = len(self._q)
        done = s["completed"]
        s["latency_ms_mean"] = round(s["latency_ms_sum"] / done, 1) if done else None
        s["latency_ms_max"] = round(s["latency_ms_max"], 1)
        del s["latency_ms_sum"]
        s["model"] = getattr(self.editor, "model_name", None)
        s["max_batch"] = self.max_batch
        return s

    def warmup(self, batch_sizes=(1,)) -> float:
        """Pre-compile the edit program at the given (padded) batch sizes.

        Without this the first request of each new batch shape pays the
        XLA compile (~20-40 s cold on a real chip).  Returns seconds spent.
        """
        t0 = time.time()
        r = self.editor.resolution
        for b in sorted(set(int(x) for x in batch_sizes)):
            imgs = [Image.new("RGB", (r, r), (128, 128, 128))] * b
            self.editor.edit_batch(imgs, [f"warmup {i}" for i in range(b)])
        return time.time() - t0

    def close(self, timeout: float = 60.0):
        """Stop accepting work, drain in-flight batches, join the threads."""
        with self._cv:
            if self._closed:
                return
            self._closed = True
            self._cv.notify_all()
        with self._cq_cv:
            # the dispatcher may be blocked on completion-queue capacity;
            # its wait predicate re-checks _closed
            self._cq_cv.notify_all()
        self._dispatcher.join(timeout=timeout)
        with self._cq_cv:
            self._cq.append(None)
            self._cq_cv.notify_all()
        self._completer.join(timeout=timeout)
        # fail anything still queued (submit stopped accepting at close)
        with self._cv:
            leftovers = list(self._q)
            self._q.clear()
        for it in leftovers:
            if it.future.set_running_or_notify_cancel():
                it.future.set_exception(RuntimeError("EditService closed"))

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ------------------------------------------------------------ internals

    def _take_matching_locked(self, key, group: list) -> None:
        """Move same-key items from the queue into ``group`` (order kept)."""
        rest: collections.deque = collections.deque()
        while self._q and len(group) < self.max_batch:
            it = self._q.popleft()
            if it.params == key:
                group.append(it)
            else:
                rest.append(it)
        rest.extend(self._q)
        self._q.clear()
        self._q.extend(rest)

    def _dispatch_loop(self):
        while True:
            with self._cv:
                while not self._q and not self._closed:
                    self._cv.wait()
                if not self._q:
                    break  # closed and drained
                first = self._q.popleft()
            if not first.future.set_running_or_notify_cancel():
                continue  # caller cancelled while queued
            group = [first]
            deadline = time.monotonic() + self.batch_window_s
            while len(group) < self.max_batch:
                with self._cv:
                    self._take_matching_locked(first.params, group)
                    if len(group) >= self.max_batch or self._closed:
                        break
                    remaining = deadline - time.monotonic()
                    if remaining <= 0:
                        break
                    self._cv.wait(timeout=remaining)
            live = []
            for it in group:
                if it is first or it.future.set_running_or_notify_cancel():
                    live.append(it)
            if live:
                self._run_batch(live)
        # closed: wake the completer's capacity waiters
        with self._cq_cv:
            self._cq_cv.notify_all()

    def _run_batch(self, group: list) -> None:
        p = group[0].params
        images = [it.image for it in group]
        prompts = [it.prompt for it in group]
        n = len(group)
        if self.pad_to_pow2 and n < self.max_batch:
            padded = min(_next_pow2(n), self.max_batch)
            images = images + [images[-1]] * (padded - n)
            prompts = prompts + [prompts[-1]] * (padded - n)
        try:
            pending = self.editor.edit_batch_async(
                images,
                prompts,
                negative_prompt=p.negative_prompt,
                strength=p.strength,
                num_inference_steps=p.num_inference_steps,
                guidance_scale=p.guidance_scale,
                controlnet_conditioning_scale=p.controlnet_conditioning_scale,
                canny_low_threshold=p.canny_low_threshold,
                canny_high_threshold=p.canny_high_threshold,
                seed=p.seed,
            )
        except Exception as e:  # dispatch failed: fail the whole group
            log.info("batch dispatch failed: %r", e)
            with self._stats_lock:
                self._stats["failed"] += n
            for it in group:
                it.future.set_exception(e)
            return
        with self._stats_lock:
            self._stats["batches"] += 1
            hist = self._stats["batch_size_hist"]
            hist[str(n)] = hist.get(str(n), 0) + 1
        with self._cq_cv:
            while len(self._cq) >= self._cq_capacity and not self._closed:
                self._cq_cv.wait()
            self._cq.append((pending, group))
            self._cq_cv.notify_all()

    def _complete_loop(self):
        while True:
            with self._cq_cv:
                while not self._cq:
                    self._cq_cv.wait()
                item = self._cq.popleft()
                self._cq_cv.notify_all()
            if item is None:
                return
            pending, group = item
            try:
                results = pending.result()
            except Exception as e:
                log.info("batch readback failed: %r", e)
                with self._stats_lock:
                    self._stats["failed"] += len(group)
                for it in group:
                    it.future.set_exception(e)
                continue
            now = time.monotonic()
            with self._stats_lock:
                self._stats["completed"] += len(group)
                for it in group:
                    ms = 1000.0 * (now - it.enqueued)
                    self._stats["latency_ms_sum"] += ms
                    if ms > self._stats["latency_ms_max"]:
                        self._stats["latency_ms_max"] = ms
            for it, img in zip(group, results):
                it.future.set_result(img)


# ------------------------------------------------------------------- HTTP


_MAX_BODY_BYTES = 64 * 1024 * 1024


class _EditHandler(BaseHTTPRequestHandler):
    server_version = "fastedit-tpu"
    protocol_version = "HTTP/1.1"

    # ---- helpers

    def _send_json(self, code: int, payload: dict):
        body = json.dumps(payload).encode("utf-8")
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, fmt, *args):  # route through structured logging
        log.debug("%s - %s", self.address_string(), fmt % args)

    # ---- routes

    def do_GET(self):
        svc: EditService = self.server.service  # type: ignore[attr-defined]
        if self.path == "/healthz":
            self._send_json(
                200,
                {
                    "status": "ok",
                    "model": getattr(svc.editor, "model_name", None),
                    "backend": getattr(svc.editor, "device", None),
                    "resolution": getattr(svc.editor, "resolution", None),
                },
            )
        elif self.path == "/stats":
            self._send_json(200, svc.stats())
        else:
            self._send_json(404, {"error": f"no route {self.path}"})

    def do_POST(self):
        if self.path != "/v1/edit":
            self._send_json(404, {"error": f"no route {self.path}"})
            return
        svc: EditService = self.server.service  # type: ignore[attr-defined]
        try:
            length = int(self.headers.get("Content-Length", "0"))
            if length <= 0 or length > _MAX_BODY_BYTES:
                self._send_json(400, {"error": "missing or oversized body"})
                return
            req = json.loads(self.rfile.read(length))
            prompt = req["prompt"]
            image = Image.open(
                io.BytesIO(base64.b64decode(req["image"]))
            ).convert("RGB")
            params = EditParams(
                negative_prompt=str(req.get("negative_prompt", "")),
                strength=float(req.get("strength", 0.80)),
                num_inference_steps=int(req.get("num_inference_steps", 4)),
                guidance_scale=float(req.get("guidance_scale", 1.5)),
                controlnet_conditioning_scale=float(
                    req.get("controlnet_conditioning_scale", 0.5)
                ),
                canny_low_threshold=int(req.get("canny_low_threshold", 100)),
                canny_high_threshold=int(req.get("canny_high_threshold", 200)),
                seed=None if req.get("seed") is None else int(req["seed"]),
            )
            fmt = str(req.get("format", "jpeg")).lower()
            if fmt not in ("jpeg", "png"):
                self._send_json(400, {"error": f"unsupported format {fmt!r}"})
                return
        except Exception as e:
            self._send_json(400, {"error": f"bad request: {e!r}"})
            return

        t0 = time.monotonic()
        try:
            fut = svc.submit(image, prompt, params)
        except ServiceOverloaded as e:
            self._send_json(503, {"error": str(e)})
            return
        try:
            out = fut.result(timeout=self.server.request_timeout_s)  # type: ignore[attr-defined]
        except Exception as e:
            self._send_json(500, {"error": f"edit failed: {e!r}"})
            return
        buf = io.BytesIO()
        out.save(buf, format=fmt.upper(), **({"quality": 95} if fmt == "jpeg" else {}))
        self._send_json(
            200,
            {
                "image": base64.b64encode(buf.getvalue()).decode("ascii"),
                "format": fmt,
                "width": out.width,
                "height": out.height,
                "latency_ms": round(1000.0 * (time.monotonic() - t0), 1),
            },
        )


def make_http_server(
    service: EditService,
    host: str = "127.0.0.1",
    port: int = 8000,
    request_timeout_s: float = 600.0,
) -> ThreadingHTTPServer:
    """Build (but do not start) the HTTP server.  ``port=0`` picks a free
    port (``server.server_address[1]`` reports it)."""
    httpd = ThreadingHTTPServer((host, port), _EditHandler)
    httpd.service = service  # type: ignore[attr-defined]
    httpd.request_timeout_s = request_timeout_s  # type: ignore[attr-defined]
    return httpd
