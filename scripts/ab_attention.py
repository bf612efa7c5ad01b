"""Isolated device-time A/B for flash-attention kernel variants.

Chained-dispatch microbenchmarks are unreliable over the axon tunnel
(~1 ms floors), so this measures the way profile_txt2img.py does: run the
kernel ``reps`` times inside ONE jitted scan on the real chip under
``jax.profiler.trace`` and read the pallas custom-call's device time out of
the 'XLA Ops' lane.  The scan carry perturbs q each iteration so XLA cannot
hoist the loop-invariant call.

Usage: python scripts/ab_attention.py [pack1,pack2,...] [reps]
Default sweeps head_pack 1/2/4/8 at the SD1.5 production self-attention
shapes (bf16, CFG-pair batch 2).
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from diffusion_finetuning_tpu.ops.flash_attention import flash_attention


def pallas_device_us(outdir: str) -> float:
    paths = glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert paths, f"no trace under {outdir}"
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    lanes = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            lanes[(e.get("pid"), e.get("tid"))] = e["args"]["name"]
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if "XLA Ops" not in lanes.get((e.get("pid"), e.get("tid")), ""):
            continue
        name = e.get("name", "").lstrip("%")
        if name.startswith("while"):
            continue
        # Pallas calls surface as %closed_call.N on this stack (the tiny
        # custom-call events are infeed/outfeed markers, ~1 ns).
        if name.startswith("closed_call") or name.startswith("tpu_custom_call"):
            total += e.get("dur", 0)
    return total


def measure(pack: int, b: int, s: int, heads: int, d: int, reps: int) -> float:
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, s, heads * d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, s, heads * d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, s, heads * d), jnp.bfloat16)

    def f(q, k, v):
        def body(c, _):
            qi = q * (1.0 + c * 1e-9).astype(q.dtype)
            o = flash_attention(qi, k, v, heads, head_pack=pack)
            return c + o.astype(jnp.float32).mean(), None

        return jax.lax.scan(body, jnp.float32(0.0), None, length=reps)[0]

    jf = jax.jit(f)
    jax.block_until_ready(jf(q, k, v))  # compile + warm
    outdir = f"/tmp/ab_attention_{pack}_{s}_{d}"
    shutil.rmtree(outdir, ignore_errors=True)
    with jax.profiler.trace(outdir):
        jax.block_until_ready(jf(q, k, v))
    return pallas_device_us(outdir) / reps


def main():
    packs = [int(x) for x in (sys.argv[1].split(",") if len(sys.argv) > 1
                              else ("1", "2", "4", "8"))]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    shapes = [
        (2, 4096, 8, 40),   # SD1.5 64x64 self-attn — the dominant shape
        (2, 1024, 8, 80),   # 32x32 self-attn
    ]
    print(f"{'shape':>24} | " + " | ".join(f"pack={p:>2}" for p in packs),
          flush=True)
    for b, s, heads, d in shapes:
        from diffusion_finetuning_tpu.ops.flash_attention import (
            head_pack_fits_vmem,
        )
        row = []
        for p in packs:
            if not head_pack_fits_vmem(p, s, d):
                cell = "   vmem"  # G full-KV streams exceed the 16MB scope
            else:
                try:
                    cell = f"{measure(p, b, s, heads, d, reps):7.1f}"
                except Exception as e:  # compile OOM / tunnel error
                    cell = "    ERR"
                    print(f"  [pack={p} S={s}: {type(e).__name__}: "
                          f"{str(e)[:120]}]", flush=True)
            row.append(cell)
            print(f"  B={b} S={s} d={d} pack={p}: {cell.strip()}", flush=True)
        print(f"B={b} S={s} H={heads} d={d:>4} | " +
              " | ".join(f"{r} us" for r in row), flush=True)


if __name__ == "__main__":
    main()
