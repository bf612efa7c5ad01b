"""Serving benchmark: batched txt2img throughput through GenerationServer.

Measures sustained images/sec when concurrent requests are coalesced into
device batches by ``diffusion_finetuning_tpu.serving.GenerationServer``
(max_batch=4), using the same SD1.5 512^2 50-step LoRA configuration as
bench.py so the two numbers are directly comparable (bench.py = latency of
an un-batched request; this = amortized throughput under load).

Random SD1.5-shape weights (no checkpoint download in this environment);
throughput depends on shapes only.  Prints ONE JSON line.
"""

from __future__ import annotations

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import os

STEPS = int(os.environ.get("DFT_BENCH_STEPS", "50"))
SCHED = os.environ.get("DFT_BENCH_SCHED", "ddim")
BATCH = int(os.environ.get("DFT_BENCH_BATCH", "4"))
N_REQUESTS = 4 * BATCH
# DFT_BENCH_MIXED=1: instead of a single pinned batch size, run the full
# ladder [1,2,4,8] and submit serialized bursts of awkward sizes so every
# burst exercises the split-down-ladder path (serving.GenerationServer._loop:
# 7 -> 4+2+1, 5 -> 4+1, ...).  Reports goodput (completed images / wall s)
# over the whole mixed stream.
MIXED = os.environ.get("DFT_BENCH_MIXED") == "1"
MIXED_LADDER = [1, 2, 4, 8]
MIXED_BURSTS = [7, 5, 3, 1, 6, 2, 8]  # 32 images


def _run_mixed(server, kwargs):
    import time as _t

    # warm every ladder executable (persistent cache makes repeats cheap)
    for b in MIXED_LADDER:
        futs = [server.submit(f"warm {i}", seed=i, **kwargs) for i in range(b)]
        for f in futs:
            f.result()
    t0 = _t.perf_counter()
    done = 0
    for burst in MIXED_BURSTS:
        futs = [server.submit(f"a photo of sks person {done + i}",
                              seed=done + i, **kwargs) for i in range(burst)]
        for f in futs:
            f.result()
        done += burst
    return done / (_t.perf_counter() - t0)


def main():
    from bench import build_pipe
    from diffusion_finetuning_tpu.serving import GenerationServer

    pipe = build_pipe()
    if MIXED:
        server = GenerationServer(pipe, max_batch=MIXED_LADDER[-1],
                                  max_wait_ms=50.0,
                                  allowed_batches=MIXED_LADDER)
        kwargs = dict(height=512, width=512, steps=STEPS, scheduler=SCHED)
        imgs_per_sec = _run_mixed(server, kwargs)
        server.close()
        print(json.dumps({
            "metric": (f"sd15_512_{STEPS}step_{SCHED}_lora_txt2img_serving_"
                       f"mixed_ladder"),
            "value": round(imgs_per_sec, 3),
            "unit": "img/s",
            "vs_baseline": round(imgs_per_sec / 0.5, 3),
            "bursts": MIXED_BURSTS,
            "ladder": MIXED_LADDER,
        }))
        return
    server = GenerationServer(pipe, max_batch=BATCH, max_wait_ms=50.0,
                              allowed_batches=[BATCH])
    kwargs = dict(height=512, width=512, steps=STEPS, scheduler=SCHED)

    # warmup: compile the batch-4 executable once
    futs = [server.submit(f"a photo of sks person {i}", seed=i, **kwargs)
            for i in range(BATCH)]
    for f in futs:
        f.result()

    t0 = time.perf_counter()
    futs = [server.submit(f"a photo of sks person {i}", seed=i, **kwargs)
            for i in range(N_REQUESTS)]
    for f in futs:
        f.result()
    elapsed = time.perf_counter() - t0
    server.close()

    imgs_per_sec = N_REQUESTS / elapsed
    # north star is <=2 s/image single-request; express batched throughput
    # against the same bar (0.5 img/s)
    print(json.dumps({
        "metric": (f"sd15_512_{STEPS}step_{SCHED}_lora_txt2img_serving_"
                   f"batch{BATCH}"),
        "value": round(imgs_per_sec, 3),
        "unit": "img/s",
        "vs_baseline": round(imgs_per_sec / 0.5, 3),
    }))


if __name__ == "__main__":
    main()
