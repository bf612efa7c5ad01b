"""Micro-batching generation server for production serving.

Beyond the reference (which only offers notebook inference): concurrent
txt2img requests are coalesced into device batches — callers block on a
future while a single worker thread drains the queue, groups requests that
share (resolution, steps, scheduler, guidance) into one batched ``pipe()``
call, and fans results back out.  The pipeline's jit cache makes every
(batch, resolution, steps) combination compile once; batching raises chip
utilization the same way the serving stack batches LLM requests.

``scripts/serve.py`` exposes this over HTTP.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future, InvalidStateError
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple


@dataclass
class _Request:
    prompt: str
    negative_prompt: str
    height: int
    width: int
    steps: int
    guidance_scale: float
    scheduler: str
    seed: int
    adapter: Optional[str] = None
    future: Future = field(default_factory=Future)

    def batch_key(self) -> Tuple:
        # adapter is part of the shape class: one batch = one LoRA tree set
        return (self.adapter, self.height, self.width, self.steps,
                self.guidance_scale, self.scheduler)

    def resolve(self, result) -> None:
        """set_result, tolerating futures the caller already cancelled —
        a cancelled future must not poison the rest of its batch."""
        try:
            self.future.set_result(result)
        except InvalidStateError:
            pass

    def fail(self, exc: BaseException) -> None:
        try:
            if not self.future.done():
                self.future.set_exception(exc)
        except InvalidStateError:
            pass


class GenerationServer:
    """Queue + worker thread micro-batching txt2img over one pipeline.

    Defaults come from the measured v5e batch ladder (BENCH_SERVE_r05.json,
    ladder table in PARITY.md): batch-8 is the throughput winner (1.24
    img/s vs 1.204 at batch-4 at 512^2/50 steps), and with partial batches
    splitting DOWN the ladder a larger ``max_batch`` never pads — under
    light load requests dispatch at whatever size is queued.  The latency
    cost only appears in full 8-request bursts, where requests 5-8 ride the
    same ~6.5 s dispatch instead of a second batch-4 wave; latency-critical
    deployments can pin ``max_batch=4`` (or ``allowed_batches=[1]``)."""

    def __init__(self, pipe, max_batch: int = 8, max_wait_ms: float = 20.0,
                 allowed_batches: Optional[List[int]] = None):
        self.pipe = pipe
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1000.0
        # jit compiles per batch size, so dispatched batches are restricted
        # to this ladder: partial batches split DOWN it (zero padding when 1
        # is a ladder step) and only pad up by repetition when smaller than
        # the smallest step; the ladder always contains max_batch
        if allowed_batches is None:
            # default power-of-two ladder, capped at max_batch
            allowed_batches = [b for b in (1, 2, 4, 8) if b <= max_batch]
        self.allowed_batches = sorted(set(allowed_batches) | {max_batch})
        # multi-chip pipelines (pipe.shard_over(mesh)) only accept batches
        # that are multiples of the data axis: round the ladder up to them
        mesh = getattr(pipe, "mesh", None)
        if mesh is not None:
            n = mesh.shape["data"]
            self.allowed_batches = sorted(
                {-(-b // n) * n for b in self.allowed_batches})
            self.max_batch = self.allowed_batches[-1]
        self._q: "queue.Queue[_Request]" = queue.Queue()
        # requests the worker already dequeued but did not dispatch: the
        # head of the next shape class, and/or the remainder of a partial
        # batch split down the ladder (see _loop)
        self._carry: List[_Request] = []
        # multi-tenant LoRA serving: named adapter tree sets, routed per
        # request (reference workflow: patch_pipe swapping LoRAs on one pipe,
        # lora.py:672-732 — here per-request instead of process-global)
        self._adapters: Dict[str, Dict[str, Any]] = {}
        self._adapter_lock = threading.Lock()
        self._stop = threading.Event()
        # serializes submit()-vs-close() so a request can't slip into the
        # queue after close() has drained it (the caller would hang forever)
        self._submit_lock = threading.Lock()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # -- client API ----------------------------------------------------------
    def register_adapter(self, name: str, source, **build_kwargs) -> None:
        """Register a named LoRA/TI adapter for per-request routing.

        ``source`` is a ``.safetensors`` / ``.pt`` path (loaded via
        ``pipelines.build_adapter``) or a ready dict with any of
        ``{"unet_lora", "text_encoder_lora", "text_params"}``.  Requests
        submitted with ``adapter=name`` generate with exactly these trees —
        never with the pipe's installed state — and the pipe's merged-LoRA
        LRU keeps each adapter's materialized params on device, so batches
        alternating between adapters re-merge nothing.  Re-registering a
        name swaps it atomically for subsequent batches."""
        if isinstance(source, str):
            from .pipelines.pipeline import build_adapter

            source = build_adapter(self.pipe, source, **build_kwargs)
        with self._adapter_lock:
            self._adapters[name] = dict(source)

    def _adapter_params(self, name: Optional[str]):
        if name is None:
            return None
        with self._adapter_lock:
            trees = self._adapters[name]
        return self.pipe.adapter_generation_params(
            unet_lora=trees.get("unet_lora"),
            text_lora=trees.get("text_encoder_lora"),
            text_params=trees.get("text_params"),
        )

    def submit(self, prompt: str, negative_prompt: str = "", height: int = 512,
               width: int = 512, steps: int = 30, guidance_scale: float = 7.5,
               scheduler: str = "dpm", seed: int = 0,
               adapter: Optional[str] = None) -> Future:
        if adapter is not None and adapter not in self._adapters:
            raise KeyError(f"unknown adapter {adapter!r}; register_adapter first")
        req = _Request(prompt, negative_prompt, height, width, steps,
                       guidance_scale, scheduler, seed, adapter)
        with self._submit_lock:
            if self._stop.is_set():
                raise RuntimeError("GenerationServer is closed")
            self._q.put(req)
        return req.future

    def generate(self, *args, **kwargs):
        return self.submit(*args, **kwargs).result()

    def close(self):
        with self._submit_lock:
            self._stop.set()
        self._thread.join(timeout=30)
        # fail anything still pending so callers never block forever.  The
        # worker also fails its own leftovers on exit (it may still be
        # mid-generation past the join timeout and park a request in
        # _carry afterwards); doing it in both places covers either
        # interleaving, and resolve/fail are idempotent.
        self._drain_and_fail()

    def _drain_and_fail(self):
        pending = list(self._carry)
        self._carry.clear()
        while True:
            try:
                pending.append(self._q.get_nowait())
            except queue.Empty:
                break
        for r in pending:
            r.fail(RuntimeError("server closed"))

    # -- worker --------------------------------------------------------------
    def _collect(self, block: bool = True) -> List[_Request]:
        if self._carry:
            first = self._carry.pop(0)
        elif block:
            try:
                first = self._q.get(timeout=0.1)
            except queue.Empty:
                return []
        else:
            # pipelined mode: a dispatch is already in flight on the device;
            # grab whatever is queued RIGHT NOW (no idle wait, no coalescing
            # window — the in-flight generation time is the window)
            try:
                first = self._q.get_nowait()
            except queue.Empty:
                return []
        batch = [first]
        if (block and
                len(self._carry) + self._q.qsize() < self.max_batch - 1):
            # coalescing window — skipped when a full batch is already queued
            self._stop.wait(self.max_wait_s)
        while len(batch) < self.max_batch:
            if self._carry:
                # carried requests are FIFO-older than anything queued
                if self._carry[0].batch_key() == first.batch_key():
                    batch.append(self._carry.pop(0))
                    continue
                break  # head of the next shape class stays carried
            try:
                nxt = self._q.get_nowait()
            except queue.Empty:
                break
            if nxt.batch_key() == first.batch_key():
                batch.append(nxt)
            else:
                # head of the NEXT batch (not requeued: a steady stream of
                # the current shape class must not starve it)
                self._carry.append(nxt)
                break
        return batch

    def _rounded(self, n: int) -> int:
        for b in self.allowed_batches:
            if b >= n:
                return b
        return self.allowed_batches[-1]

    def _resolve(self, pending) -> None:
        batch, n, dev_images = pending
        try:
            # np.asarray here is the host fetch — it waits for this batch's
            # device work, which has been overlapping the NEXT dispatch
            images = self.pipe._postprocess(dev_images, "pil")
            for r, img in zip(batch, images[:n]):
                r.resolve(img)
        except Exception as e:
            for r in batch:
                r.fail(e)

    def _loop(self):
        # Depth-2 dispatch pipeline: enqueue batch i+1 on the device
        # (output_type="device" returns without a host sync) BEFORE fetching
        # batch i's images, so per-dispatch host/RPC latency and the host
        # fetch hide under device compute.  `pending` holds the in-flight
        # batch; under sparse traffic (_collect(block=False) finds nothing)
        # it resolves immediately, adding no latency.
        pending = None
        try:
            while not self._stop.is_set():
                batch = self._collect(block=pending is None)
                dev = None
                if batch:
                    r0 = batch[0]
                    n = len(batch)
                    # split partial batches down the ladder instead of
                    # padding up: a padded slot costs a full image of device
                    # time (~0.8 s at 512²) while an extra pipelined dispatch
                    # costs ~25 ms, so (4+1) beats pad-to-8 for 5 requests at
                    # every measured batch size (ladder table, PARITY.md).
                    # Padding remains only when n is below the smallest
                    # ladder step (e.g. a mesh-rounded ladder).
                    down = max(
                        (b for b in self.allowed_batches if b <= n),
                        default=None)
                    if down is not None and down < n:
                        # remainder goes to the FRONT of the carry so it
                        # keeps FIFO priority over a parked next-shape head
                        self._carry[:0] = batch[down:]
                        batch = batch[:down]
                        n = down
                    nb = self._rounded(n)
                    prompts = ([r.prompt for r in batch]
                               + [r0.prompt] * (nb - n))
                    negs = ([r.negative_prompt for r in batch]
                            + [r0.negative_prompt] * (nb - n))
                    seeds = [r.seed for r in batch] + [r0.seed] * (nb - n)
                    try:
                        dev = self.pipe(
                            prompts, negative_prompt=negs, height=r0.height,
                            width=r0.width, num_inference_steps=r0.steps,
                            guidance_scale=r0.guidance_scale,
                            scheduler=r0.scheduler,
                            seed=seeds,  # per-request seeds, inside the jit
                            output_type="device",
                            adapter_params=self._adapter_params(r0.adapter),
                        )
                    except Exception as e:
                        for r in batch:
                            r.fail(e)
                        batch = None
                if pending is not None:
                    self._resolve(pending)
                    pending = None
                if batch and dev is not None:
                    pending = (batch, len(batch), dev)
        finally:
            # on shutdown, resolve the in-flight batch and fail whatever
            # this thread still holds (including a request parked in _carry
            # after close() already drained)
            if pending is not None:
                self._resolve(pending)
            self._drain_and_fail()
