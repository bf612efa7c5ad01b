"""Per-HLO-op device-time attribution for the txt2img pipeline.

Captures a ``jax.profiler`` trace around one 50-step 512^2 generation on the
real chip (the profiler works over the axon tunnel; raw microbenchmarks do
not — see CLAUDE.md) and aggregates the 'XLA Ops' lane by op kind and by
individual op, so conv/attention/elementwise time can be attributed before
touching any kernel.

Usage: ``python profile_txt2img.py [outdir]`` — prints a table; the raw
trace stays in ``outdir`` for deeper digging.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def capture(outdir: str, steps: int = 50, size: int = 512):
    from bench import build_pipe

    pipe = build_pipe()
    kwargs = dict(num_inference_steps=steps, height=size, width=size,
                  output_type="np")
    pipe("a photo of sks person", **kwargs)  # warm/compile
    with jax.profiler.trace(outdir):
        img = pipe("a photo of sks person", seed=1, **kwargs)
        jax.block_until_ready(img)
    return outdir


def load_xla_ops(outdir: str):
    """Yield (name, dur_us) for every event in the 'XLA Ops' lanes."""
    paths = glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert paths, f"no trace under {outdir}"
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    # map thread id -> lane name
    lanes = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            lanes[(e.get("pid"), e.get("tid"))] = e["args"]["name"]
    for e in events:
        if e.get("ph") != "X":
            continue
        lane = lanes.get((e.get("pid"), e.get("tid")), "")
        if "XLA Ops" not in lane:
            continue
        name = e.get("name", "")
        if name.startswith("while"):  # scan wrapper double-counts its body
            continue
        yield name, e.get("dur", 0)


KINDS = (
    ("flash/pallas", ("custom-call", "tpu_custom_call", "pallas")),
    ("convolution", ("convolution",)),
    ("matmul", ("dot", "einsum")),
    ("fusion", ("fusion",)),
    ("copy/transpose", ("copy", "transpose", "bitcast", "reshape", "pad",
                        "slice", "concatenate")),
    ("reduce", ("reduce",)),
)


def kind_of(name: str) -> str:
    base = name.lstrip("%").split(".")[0]
    for kind, keys in KINDS:
        if any(k in base for k in keys):
            return kind
    return "other:" + base


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/txt2img_trace"
    if not glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                     recursive=True):
        capture(outdir)

    by_kind = collections.Counter()
    by_op = collections.Counter()
    n_by_op = collections.Counter()
    for name, dur in load_xla_ops(outdir):
        by_kind[kind_of(name)] += dur
        by_op[name] += dur
        n_by_op[name] += 1

    total = sum(by_kind.values())
    print(f"total device op time: {total/1e6:.3f} s")
    print("\n-- by kind --")
    for k, v in by_kind.most_common(12):
        print(f"{v/1e6:8.3f} s  {100*v/total:5.1f}%  {k}")
    print("\n-- top ops --")
    for k, v in by_op.most_common(30):
        print(f"{v/1e6:8.3f} s  x{n_by_op[k]:<5d} {k[:110]}")


if __name__ == "__main__":
    main()
