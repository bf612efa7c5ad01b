"""Benchmark: SD 1.5 512^2 50-step LoRA txt2img seconds/image on one chip.

North star (BASELINE.json): <= 2 s per image per TPU v5e chip.
``vs_baseline`` = 2.0 / measured (>1 means beating the target).

Uses randomly initialized SD 1.5-shape weights (no checkpoint download in
this environment) — latency depends only on shapes, not weight values.
Prints ONE JSON line.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

# Persistent compilation cache: first-compile of the full pipeline over the
# TPU tunnel is slow; cached executables make repeat bench runs fast.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def build_pipe():
    from diffusion_finetuning_tpu import lora as lora_lib
    from diffusion_finetuning_tpu.data.tokenizer import CLIPTokenizer
    from diffusion_finetuning_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
    from diffusion_finetuning_tpu.models.schedulers import SchedulerConfig
    from diffusion_finetuning_tpu.models.unet import UNetConfig, UNet2DConditionModel
    from diffusion_finetuning_tpu.models.vae import VAEConfig, AutoencoderKL
    from diffusion_finetuning_tpu.pipelines.pipeline import StableDiffusionPipeline

    dtype = jnp.bfloat16
    ucfg, vcfg, tcfg = UNetConfig.sd15(), VAEConfig.sd15(), CLIPTextConfig.sd15()
    rng = jax.random.PRNGKey(0)

    unet_params = UNet2DConditionModel(ucfg, dtype=dtype).init(
        rng, jnp.zeros((1, 64, 64, 4), dtype), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, ucfg.cross_attention_dim), dtype),
    )["params"]
    vae_params = AutoencoderKL(vcfg, dtype=dtype).init(
        rng, jnp.zeros((1, 128, 128, 3), dtype), rng
    )["params"]
    text_params = CLIPTextModel(tcfg, dtype=dtype).init(
        rng, jnp.zeros((1, 77), jnp.int32)
    )["params"]

    tokenizer = CLIPTokenizer.tiny(["photo", "of", "sks", "person"])
    pipe = StableDiffusionPipeline(
        ucfg, unet_params, vcfg, vae_params, tcfg, text_params,
        tokenizer, SchedulerConfig(), dtype=dtype,
    )
    # rank-4 LoRA on the default UNet targets — the benchmark is the *LoRA*
    # txt2img path (BASELINE.json configs[0]).
    targets = pipe.lora_targets("unet", lora_lib.DEFAULT_TARGET_REPLACE)
    pipe.unet_lora = lora_lib.inject_trainable_lora(
        targets, jax.random.PRNGKey(1), r=4, dtype=dtype
    )
    return pipe


def _probe_cache_in_subprocess() -> None:
    """Validate the persistent cache in a child process before trusting it.

    After a CI host migration, deserializing an AOT executable compiled on
    the old host can SIGSEGV (observed for XLA:CPU entries; the same class
    of hazard exists for any serialized executable).  A segfault cannot be
    caught in-process, so the warmup first runs in a child sharing the
    cache dir: if the child dies on a *signal*, the cache is presumed
    poisoned and purged, and this run proceeds cold instead of crashing the
    driver's unattended bench.  A clean child failure (tunnel outage, OOM
    killer uses SIGKILL → treated as a signal but the purge is harmless
    then) does not purge.  Disable with DFT_BENCH_PROBE=0.
    """
    import os
    import shutil
    import subprocess
    import sys

    if os.environ.get("DFT_BENCH_PROBE", "1") == "0":
        return
    env = dict(os.environ, DFT_BENCH_PROBE="0")
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--probe"],
            env=env, timeout=3000, capture_output=True,
        )
    except subprocess.TimeoutExpired:
        return  # slow cold compile or hung tunnel: not a cache problem
    if proc.returncode < 0:  # killed by a signal: poisoned cache entry
        sys.stderr.write(
            f"bench: warmup probe died with signal {-proc.returncode}; "
            "purging .jax_cache and running cold\n")
        shutil.rmtree("/root/repo/.jax_cache", ignore_errors=True)


def main():
    import sys

    probe_only = "--probe" in sys.argv
    if not probe_only:
        _probe_cache_in_subprocess()
    pipe = build_pipe()
    prompt = "a photo of sks person"
    kwargs = dict(num_inference_steps=50, height=512, width=512, output_type="np")

    pipe(prompt, **kwargs)  # warmup: compile (or load from validated cache)
    if probe_only:
        print("probe ok")
        return
    n = 3
    # pipelined dispatch: enqueue every generation (device outputs), then
    # fetch in completion order — image i's host transfer overlaps image
    # i+1's device compute, hiding the tunnel's per-dispatch RPC latency.
    # This is how the serving stack drives the chip (GenerationServer);
    # sustained s/image is the metric.
    dev_kwargs = dict(kwargs, output_type="device")
    t0 = time.perf_counter()
    imgs = [pipe(prompt, seed=i, **dev_kwargs) for i in range(n)]
    import numpy as np

    imgs = [np.asarray(im) for im in imgs]
    per_image = (time.perf_counter() - t0) / n

    print(json.dumps({
        "metric": "sd15_512_50step_lora_txt2img",
        "value": round(per_image, 4),
        "unit": "s/image",
        "vs_baseline": round(2.0 / per_image, 3),
    }))


if __name__ == "__main__":
    main()
