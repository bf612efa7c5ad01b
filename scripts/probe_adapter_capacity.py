"""Measure how many merged-LoRA adapter trees actually fit on the chip.

The multi-tenant serving path (``pipelines.pipeline.adapter_generation_params``)
keeps each explicit adapter's MERGED UNet (~1.7 GB bf16 for SD1.5) in an
identity-keyed LRU so alternating requests re-merge nothing.  The LRU cap
(``DFT_MERGED_LORA_CACHE``) bounds HBM: this probe registers adapters one at
a time with the cap raised out of the way, generates one 512^2 image through
each (so the measurement includes live generation activations, not just
resident params), and reports the last count that worked before
RESOURCE_EXHAUSTED — the measured ceiling from which the production default
is set (see pipelines/pipeline.py MERGED_LORA_CACHE_SIZE).

Run on the real TPU: ``python scripts/probe_adapter_capacity.py``.
Prints one JSON line.  Run this LAST in a TPU job chain — an OOM can leave
the remote runtime in a bad state.
"""

from __future__ import annotations

import json
import os
import sys

os.environ.setdefault("DFT_MERGED_LORA_CACHE", "32")  # out of the way

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N_MAX = int(os.environ.get("DFT_PROBE_MAX", "12"))


def mem_gb():
    try:
        stats = jax.local_devices()[0].memory_stats()
        return round(stats["bytes_in_use"] / 2**30, 2)
    except Exception:
        return None


def main():
    from bench import build_pipe
    from diffusion_finetuning_tpu import lora as lora_lib

    pipe = build_pipe()
    # multi-tenant configuration: no pipe-installed LoRA (every adapter is
    # explicit); build_pipe installs one for the latency benchmark
    pipe.unet_lora = None
    targets = pipe.lora_targets("unet", lora_lib.DEFAULT_TARGET_REPLACE)

    kwargs = dict(num_inference_steps=50, height=512, width=512,
                  output_type="device")
    import numpy as np

    np.asarray(pipe("warmup", **kwargs))  # compile / load cached executable
    print(f"base pipeline resident: {mem_gb()} GB", file=sys.stderr)

    fit = 0
    err = None
    for i in range(1, N_MAX + 1):
        try:
            tree = lora_lib.inject_trainable_lora(
                targets, jax.random.PRNGKey(100 + i), r=4,
                dtype=pipe.dtype)
            ap = pipe.adapter_generation_params(unet_lora=tree)
            np.asarray(pipe(f"adapter {i}", adapter_params=ap, **kwargs))
            fit = i
            print(f"adapters resident: {i}  mem: {mem_gb()} GB",
                  file=sys.stderr)
        except Exception as e:  # RESOURCE_EXHAUSTED from the runtime
            err = f"{type(e).__name__}: {str(e)[:200]}"
            print(f"adapter {i} failed: {err}", file=sys.stderr)
            break

    print(json.dumps({
        "metric": "merged_lora_adapters_resident_v5e",
        "value": fit,
        "unit": "adapters",
        "vs_baseline": None,
        "cache_entries": len(pipe._merged_cache),
        "bytes_in_use_gb": mem_gb(),
        "first_failure": err,
    }))


if __name__ == "__main__":
    main()
