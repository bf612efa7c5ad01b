"""Timing decomposition of the txt2img pipeline on the real chip.

Measures (a) full cached 50-step call, (b) text-encode-only jit, (c) VAE
decode-only jit, (d) batch-4 50-step call.  UNet scan share = a - b - c -
transfer.  Small jits compile fast; the full pipelines should be cache hits.
"""

import sys, time, json

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")
import importlib.util
spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)

pipe = bench.build_pipe()
prompt = "a photo of sks person"

def timeit(fn, n=5):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n

results = {}

# full 50-step batch 1 (cache hit expected)
t0 = time.perf_counter()
full = lambda: pipe(prompt, num_inference_steps=50, height=512, width=512,
                    output_type="np", seed=1)
img = full()
results["compile_full_b1_s"] = round(time.perf_counter() - t0, 2)
results["full_b1"] = timeit(full, n=4)
print("full_b1", results["full_b1"], flush=True)

# text encode only
ids = pipe.tokenizer(["", prompt])
enc = lambda: pipe.encode_prompt(["", prompt])
results["text_encode"] = timeit(enc, n=8)
print("text_encode", results["text_encode"], flush=True)

# VAE decode + postprocess only (jitted standalone)
lat = jnp.zeros((1, 64, 64, 4), jnp.bfloat16)

@jax.jit
def vae_dec(vp, z):
    img = pipe.vae.apply({"params": vp}, z, method=pipe.vae.decode).astype(jnp.float32)
    img = jnp.clip(img / 2 + 0.5, 0, 1)
    return jnp.round(img * 255).astype(jnp.uint8)

dec = lambda: np.asarray(vae_dec(pipe.vae_params, lat))
results["vae_decode_b1"] = timeit(dec, n=8)
print("vae_decode", results["vae_decode_b1"], flush=True)

# batch 4, 50 steps (serving config; may be cached from round 1)
t0 = time.perf_counter()
full4 = lambda: pipe([prompt] * 4, num_inference_steps=50, height=512,
                     width=512, output_type="np", seed=[1, 2, 3, 4])
img4 = full4()
results["compile_full_b4_s"] = round(time.perf_counter() - t0, 2)
results["full_b4"] = timeit(full4, n=3)
print("full_b4", results["full_b4"], flush=True)

results["unet_scan_share_b1"] = results["full_b1"] - results["text_encode"] - results["vae_decode_b1"]
print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v) for k, v in results.items()}))
