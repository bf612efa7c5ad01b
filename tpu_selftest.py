"""On-chip numerics self-test for the compiled (non-interpret) Pallas kernels.

Every pytest numerics check of the flash-attention kernel runs
``interpret=True`` on CPU; this script is the missing link — it runs the
Mosaic-COMPILED kernels on the real TPU at the production shapes with the
shipped defaults (``unroll=8``, ``exp2``, ``head_pad=8``) and compares
forward AND backward against the XLA paths, both evaluated against an
fp32 ground truth computed from the same inputs.

This mirrors the reference's runtime-probe discipline: the reference never
trusts a kernel it hasn't exercised on the target hardware
(lora_diffusion/xformers_utils.py:16-39 probes the xformers backward per
head-dim before enabling it).

Pass criterion per tensor: the Pallas error vs the fp32 ground truth must be
within ``REL_FACTOR`` x the XLA path's own error (they share the input
rounding), or under an absolute floor.  A Mosaic miscompile (wrong values,
not wrong speed) fails this loudly.

Writes ``TPU_SELFTEST_r{N}.json``: one result record per (kernel, shape,
dtype), plus an ``all_ok`` verdict.  Run: ``python tpu_selftest.py``.
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

if "--interpret" in sys.argv:  # CPU smoke mode: validates the harness only
    sys.argv.remove("--interpret")
    jax.config.update("jax_platforms", "cpu")
    INTERPRET = True
else:
    INTERPRET = False

from diffusion_finetuning_tpu.ops.attention import xla_attention
from diffusion_finetuning_tpu.ops.flash_attention import flash_attention
from diffusion_finetuning_tpu.ops.lora_matmul import lora_dense

# Pallas error may exceed XLA's because accumulation *order* differs (online
# softmax vs full-row), but a miscompile is orders of magnitude, not a small
# factor.  Floors cover the regimes where the XLA-relative ratio is
# uninformative:
#  - float32: the TPU MXU computes fp32 dots as bf16 passes at the shipped
#    DEFAULT precision (measured on this chip: 0.27 max-abs on a 512x512
#    f32 matmul vs 1.5e-5 at HIGHEST), and on fp32 inputs the "fp32 ground
#    truth" XLA path is the *same computation* as the working-dtype XLA
#    path (its error is trivially 0).  Kernel-vs-XLA disagreement from
#    accumulation order lands ~3e-3; forcing HIGHEST inside the kernel
#    VMEM-OOMs (multi-pass temporaries) and is not a production config.
#    1e-2 cleanly separates rounding from a miscompile (O(1)).
#  - bfloat16: input rounding alone is ~4e-3 relative; 2e-2 bounds it.
REL_FACTOR = 3.0
ABS_FLOOR = {"float32": 1e-2, "bfloat16": 2e-2}


def _err(a, ref):
    """(max_abs, max_rel) of a vs fp32 reference, computed on device."""
    a = a.astype(jnp.float32)
    d = jnp.abs(a - ref)
    scale = jnp.maximum(jnp.max(jnp.abs(ref)), 1e-6)
    return jnp.max(d), jnp.max(d) / scale


# ---------------------------------------------------------------------------
# Flash attention fwd + bwd
# ---------------------------------------------------------------------------

# Production shapes (SD1.5 512^2, batch 2 = CFG pair): the three self-attn
# levels and the KV=77 cross-attention masking path.  Cross-attn is routed to
# XLA in production (FLASH_MIN_KV) but the kernel must still be correct there.
ATTN_SHAPES = [
    ("self_s4096_d40", 2, 8, 4096, 4096, 40),
    ("self_s1024_d80", 2, 8, 1024, 1024, 80),
    ("self_s256_d160", 2, 8, 256, 256, 160),
    ("cross_s4096_kv77_d40", 2, 8, 4096, 77, 40),
]


def attn_case(name, b, heads, sq, skv, d, dtype):
    key = jax.random.PRNGKey(hash(name) % (2**31))
    kq, kk, kv, kg = jax.random.split(key, 4)
    q = jax.random.normal(kq, (b, sq, heads * d), dtype)
    k = jax.random.normal(kk, (b, skv, heads * d), dtype)
    v = jax.random.normal(kv, (b, skv, heads * d), dtype)
    g = jax.random.normal(kg, (b, sq, heads * d), dtype)

    # bf16 (the production dtype) runs the EXACT shipped config, fwd+bwd.
    # The fp32 tight-tolerance pass is fwd-only at S>=2048: the fp32
    # backward's whole-KV dK/dV accumulators + fp32 K/V exceed the 16MB
    # scoped-vmem budget at S=4096 under any block size, and no production
    # path runs an fp32 backward at that length (training is bf16); fp32
    # backward coverage comes from the S=1024/S=256/KV=77 cases.
    fwd_only = dtype == jnp.float32 and sq >= 2048

    @jax.jit
    def run(q, k, v, g):
        qf, kf, vf, gf = (t.astype(jnp.float32) for t in (q, k, v, g))

        if fwd_only:
            ref_out = xla_attention(qf, kf, vf, heads)
            fl_out = flash_attention(q, k, v, heads, interpret=INTERPRET)
            xl_out = xla_attention(q, k, v, heads)
            return {"fwd": (_err(fl_out, ref_out), _err(xl_out, ref_out))}

        # fp32 ground truth (fwd + grads) from the SAME (rounded) inputs
        ref_out, ref_vjp = jax.vjp(lambda *a: xla_attention(*a, heads), qf, kf, vf)
        ref_grads = ref_vjp(gf)

        # compiled Pallas kernel, production defaults (unroll/exp2/head_pad)
        fl_out, fl_vjp = jax.vjp(
            lambda *a: flash_attention(*a, heads, interpret=INTERPRET),
            q, k, v,
        )
        fl_grads = fl_vjp(g)

        # XLA path at the same working dtype (the fallback production path)
        xl_out, xl_vjp = jax.vjp(lambda *a: xla_attention(*a, heads), q, k, v)
        xl_grads = xl_vjp(g)

        res = {"fwd": (_err(fl_out, ref_out), _err(xl_out, ref_out))}
        for nm, fg, xg, rg in zip("qkv", fl_grads, xl_grads, ref_grads):
            res[f"d{nm}"] = (_err(fg, rg), _err(xg, rg))
        return res

    return run(q, k, v, g)


# ---------------------------------------------------------------------------
# Fused LoRA dense fwd + bwd
# ---------------------------------------------------------------------------

# (M, K, N, r): UNet level-1 attention projection at S=4096, level-2 at
# S=1024, and the wide GEGLU at S=256.
LORA_SHAPES = [
    ("lora_m4096_k320_n320_r4", 4096, 320, 320, 4),
    ("lora_m1024_k640_n640_r4", 1024, 640, 640, 4),
    ("lora_m256_k1280_n5120_r4", 256, 1280, 5120, 4),
]


def lora_case(name, m, k, n, r, dtype):
    key = jax.random.PRNGKey(hash(name) % (2**31))
    kx, kw, kb, ku, kd, kg = jax.random.split(key, 6)
    x = jax.random.normal(kx, (m, k), dtype)
    w = jax.random.normal(kw, (k, n), dtype) * (k**-0.5)
    b = jax.random.normal(kb, (n,), dtype)
    up = jax.random.normal(ku, (n, r), dtype)
    down = jax.random.normal(kd, (r, k), dtype) * (1.0 / r)
    g = jax.random.normal(kg, (m, n), dtype)
    scale = jnp.float32(0.7)

    def ref_fn(x, w, b, up, down):
        # keep scale in the working dtype so the output dtype matches the
        # inputs (f32*bf16 would promote and break the vjp cotangent dtype)
        s = jnp.asarray(scale, x.dtype)
        return (
            x @ w + b
            + s * ((x @ down.astype(x.dtype).T) @ up.astype(x.dtype).T)
        )

    @jax.jit
    def run(x, w, b, up, down, g):
        xf, wf, bf, uf, df, gf = (
            t.astype(jnp.float32) for t in (x, w, b, up, down, g)
        )
        ref_out, ref_vjp = jax.vjp(ref_fn, xf, wf, bf, uf, df)
        ref_grads = ref_vjp(gf)

        fl_out, fl_vjp = jax.vjp(
            lambda x, w, b, up, down: lora_dense(
                x, w, b, up, down, scale, interpret=INTERPRET),
            x, w, b, up, down,
        )
        fl_grads = fl_vjp(g)

        xl_out, xl_vjp = jax.vjp(ref_fn, x, w, b, up, down)
        xl_grads = xl_vjp(g)

        res = {"fwd": (_err(fl_out, ref_out), _err(xl_out, ref_out))}
        for nm, fg, xg, rg in zip(
            ("dx", "dw", "db", "dup", "ddown"), fl_grads, xl_grads, ref_grads
        ):
            res[nm] = (_err(fg, rg), _err(xg, rg))
        return res

    return run(x, w, b, up, down, g)


# ---------------------------------------------------------------------------
# Matmul conv formulations fwd + bwd (shipped TPU defaults route stride-1
# 3x3 convs through these below DFT_CONV_MM_MAX_ELEMS; see models/layers.py)
# ---------------------------------------------------------------------------

from diffusion_finetuning_tpu.models.layers import (  # noqa: E402
    _im2col_conv,
    _shifted_matmul_conv,
)
from diffusion_finetuning_tpu.ops import conv_pallas  # noqa: E402
from diffusion_finetuning_tpu.ops.conv_pallas import conv3x3  # noqa: E402

# Pallas-conv rows skipped because the production routing predicate
# (conv_pallas.supported) rejects the (shape, itemsize): recorded in the
# artifact so a skip is visible, not silent.
SKIPPED_ROWS = []

CONV_SHAPES = [  # (B, H, W, C) at the SD1.5 UNet levels
    ("conv_b2_64x64x320", 2, 64, 64, 320),
    ("conv_b2_32x32x640", 2, 32, 32, 640),
    ("conv_b1_16x16x1280", 1, 16, 16, 1280),
]


def conv_case(name, b, h, w, c, dtype):
    key = jax.random.PRNGKey(hash(name) % (2**31))
    kx, kk, kg = jax.random.split(key, 3)
    x = jax.random.normal(kx, (b, h, w, c), dtype)
    k = jax.random.normal(kk, (3, 3, c, c), dtype) * (9 * c) ** -0.5
    g = jax.random.normal(kg, (b, h, w, c), dtype)

    def conv_xla(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    # Mirror production routing: layers.py only calls conv3x3 where
    # supported() accepts the (shape, itemsize).  fp32 at C=1280 exceeds
    # the 16MB scoped-VMEM limit (the double-buffered (9,1280,128) fp32
    # weight block alone is 11.8MB) — the kernel is bf16-production-path
    # code, and these rows test exactly what ships.
    itemsize = jnp.dtype(dtype).itemsize
    run_pallas = conv_pallas.supported(
        (b, h, w, c), (3, 3, c, c), (1, 1), itemsize=itemsize)
    if not run_pallas:
        SKIPPED_ROWS.append({
            "kernel": "conv_formulations", "shape": name,
            "dtype": jnp.dtype(dtype).name, "rows": "pallas_*",
            "reason": "conv_pallas.supported()=False at this itemsize "
                      "(double-buffered VMEM > 16MB scoped limit); "
                      "production routing never selects the kernel here",
        })

    @jax.jit
    def run(x, k, g):
        xf, kf, gf = (t.astype(jnp.float32) for t in (x, k, g))
        ref_out, ref_vjp = jax.vjp(conv_xla, xf, kf)
        ref_grads = ref_vjp(gf)

        sh_out, sh_vjp = jax.vjp(lambda x, k: _shifted_matmul_conv(x, k, 1), x, k)
        sh_grads = sh_vjp(g)
        im_out, im_vjp = jax.vjp(lambda x, k: _im2col_conv(x, k, 1), x, k)
        im_grads = im_vjp(g)
        xl_out, xl_vjp = jax.vjp(conv_xla, x, k)
        xl_grads = xl_vjp(g)
        rows = [("shifted", sh_out, sh_grads), ("im2col", im_out, im_grads)]
        if run_pallas:
            # compiled (non-interpret) Pallas conv kernel; its custom-VJP
            # backward is the XLA conv vjp, so the fwd row is the new signal
            zb = jnp.zeros((k.shape[-1],), x.dtype)
            pa_out, pa_vjp = jax.vjp(
                lambda x, k: conv3x3(x, k, zb, INTERPRET), x, k)
            pa_grads = pa_vjp(g)
            rows.append(("pallas", pa_out, pa_grads))

        res = {}
        for tag, out, grads in rows:
            res[f"{tag}_fwd"] = (_err(out, ref_out), _err(xl_out, ref_out))
            for nm, fg, xg, rg in zip(("dx", "dk"), grads, xl_grads, ref_grads):
                res[f"{tag}_{nm}"] = (_err(fg, rg), _err(xg, rg))
        return res

    return run(x, k, g)


# ---------------------------------------------------------------------------
# fp32 rows at HIGHEST matmul precision (small shapes).
#
# The production-shape fp32 rows above compare at the MXU's DEFAULT precision
# (bf16 passes) with loose floors, because forcing HIGHEST inside the kernels
# VMEM-OOMs at S=4096 (the fp32 multi-pass emulation needs ~6x the dot
# temporaries).  At S=512/d=64 with 256/256 blocks everything fits, so these
# rows pin TRUE fp32 kernel numerics: Pallas vs an XLA oracle, both traced
# under jax.default_matmul_precision("highest"), tolerance 1e-5 relative —
# three orders tighter than the DEFAULT-precision floors.
# ---------------------------------------------------------------------------

HIGHEST_REL_TOL = 1e-5


def attn_highest_case():
    b, heads, sq, skv, d = 2, 4, 512, 512, 64
    key = jax.random.PRNGKey(11)
    kq, kk, kv, kg = jax.random.split(key, 4)
    q = jax.random.normal(kq, (b, sq, heads * d), jnp.float32)
    k = jax.random.normal(kk, (b, skv, heads * d), jnp.float32)
    v = jax.random.normal(kv, (b, skv, heads * d), jnp.float32)
    g = jax.random.normal(kg, (b, sq, heads * d), jnp.float32)
    scale = d ** -0.5

    def split(x):  # (B, S, H*d) -> (B, H, S, d)
        return x.reshape(x.shape[0], x.shape[1], heads, d).transpose(0, 2, 1, 3)

    def merge(x):
        return x.transpose(0, 2, 1, 3).reshape(x.shape[0], x.shape[2], heads * d)

    def flashform_bwd(q, k, v, g):
        """The flash backward FORMULATION (recompute p from lse, then
        ds = p * (dp - delta)) in plain XLA fp32 — the oracle for the
        gradient rows.  The softmax-autodiff gradient is mathematically
        equal but numerically different: (dp - delta) cancels
        catastrophically where dp ~ delta, so flash-form gradients sit
        ~2.5-4.4e-5 rel from autodiff at this shape IN PLAIN XLA (measured
        on v5e at HIGHEST; the pallas kernel matches flash-form to <=1e-5).
        That formulation delta is a property of flash attention itself —
        the reference's xformers backward has it too — so the kernel claim
        tested here is "computes its formulation exactly at fp32", with
        the formulation-vs-autodiff distance recorded informationally.
        """
        qh, kh, vh, gh = (split(t) for t in (q, k, v, g))
        s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) * scale
        m = s.max(-1, keepdims=True)
        e = jnp.exp(s - m)
        lse = m + jnp.log(e.sum(-1, keepdims=True))
        p = jnp.exp(s - lse)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, vh)
        delta = (gh * o).sum(-1, keepdims=True)
        dv = jnp.einsum("bhqk,bhqd->bhkd", p, gh)
        dp = jnp.einsum("bhqd,bhkd->bhqk", gh, vh)
        ds = p * (dp - delta) * scale
        dq = jnp.einsum("bhqk,bhkd->bhqd", ds, kh)
        dk = jnp.einsum("bhqk,bhqd->bhkd", ds, qh)
        return merge(dq), merge(dk), merge(dv)

    with jax.default_matmul_precision("highest"):
        @jax.jit
        def run(q, k, v, g):
            ref_out, ref_vjp = jax.vjp(
                lambda *a: xla_attention(*a, heads), q, k, v)
            ref_grads = ref_vjp(g)
            ff_grads = flashform_bwd(q, k, v, g)
            fl_out, fl_vjp = jax.vjp(
                lambda *a: flash_attention(
                    *a, heads, interpret=INTERPRET,
                    block_q=256, block_kv=256),
                q, k, v,
            )
            fl_grads = fl_vjp(g)
            res = {"fwd": _err(fl_out, ref_out)}
            for nm, fg, ffg, rg in zip("qkv", fl_grads, ff_grads, ref_grads):
                res[f"d{nm}"] = _err(fg, ffg)
                res[f"d{nm}_formulation_vs_autodiff:info"] = _err(ffg, rg)
            return res

        return run(q, k, v, g)


def lora_highest_case():
    m, k_dim, n, r = 512, 320, 320, 4
    key = jax.random.PRNGKey(12)
    kx, kw, kb, ku, kd, kg = jax.random.split(key, 6)
    x = jax.random.normal(kx, (m, k_dim), jnp.float32)
    w = jax.random.normal(kw, (k_dim, n), jnp.float32) * (k_dim**-0.5)
    b = jax.random.normal(kb, (n,), jnp.float32)
    up = jax.random.normal(ku, (n, r), jnp.float32)
    down = jax.random.normal(kd, (r, k_dim), jnp.float32) * (1.0 / r)
    g = jax.random.normal(kg, (m, n), jnp.float32)
    scale = jnp.float32(0.7)

    def ref_fn(x, w, b, up, down):
        return x @ w + b + scale * ((x @ down.T) @ up.T)

    with jax.default_matmul_precision("highest"):
        @jax.jit
        def run(x, w, b, up, down, g):
            ref_out, ref_vjp = jax.vjp(ref_fn, x, w, b, up, down)
            ref_grads = ref_vjp(g)
            fl_out, fl_vjp = jax.vjp(
                lambda x, w, b, up, down: lora_dense(
                    x, w, b, up, down, scale, interpret=INTERPRET),
                x, w, b, up, down,
            )
            fl_grads = fl_vjp(g)
            res = {"fwd": _err(fl_out, ref_out)}
            for nm, fg, rg in zip(
                ("dx", "dw", "db", "dup", "ddown"), fl_grads, ref_grads
            ):
                res[nm] = _err(fg, rg)
            return res

        return run(x, w, b, up, down, g)


def conv_highest_case():
    b, h, w_, c = 1, 16, 16, 256
    key = jax.random.PRNGKey(13)
    kx, kk = jax.random.split(key, 2)
    x = jax.random.normal(kx, (b, h, w_, c), jnp.float32)
    k = jax.random.normal(kk, (3, 3, c, c), jnp.float32) * (9 * c) ** -0.5

    def conv_xla(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    with jax.default_matmul_precision("highest"):
        @jax.jit
        def run(x, k):
            ref = conv_xla(x, k)
            zb = jnp.zeros((k.shape[-1],), x.dtype)
            # fwd only: conv3x3's custom-VJP backward IS the XLA conv vjp
            pa = conv3x3(x, k, zb, INTERPRET)
            sh = _shifted_matmul_conv(x, k, 1)
            return {"pallas_fwd": _err(pa, ref), "shifted_fwd": _err(sh, ref)}

        return run(x, k)


HIGHEST_CASES = [
    ("flash_attention", "highest_s512_d64_blk256", attn_highest_case),
    ("lora_dense", "highest_m512_k320_n320_r4", lora_highest_case),
    ("conv_formulations", "highest_b1_16x16x256", conv_highest_case),
]


# ---------------------------------------------------------------------------


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "TPU_SELFTEST_r04.json"
    platform = jax.devices()[0].platform
    results = []
    all_ok = True

    cases = [("flash_attention", nm, args, attn_case) for nm, *args in
             [(s[0], *s[1:]) for s in ATTN_SHAPES]]
    cases += [("lora_dense", nm, args, lora_case) for nm, *args in
              [(s[0], *s[1:]) for s in LORA_SHAPES]]
    cases += [("conv_formulations", nm, args, conv_case) for nm, *args in
              [(s[0], *s[1:]) for s in CONV_SHAPES]]

    for kernel, name, args, fn in cases:
        for dtype in (jnp.float32, jnp.bfloat16):
            dt = jnp.dtype(dtype).name
            res = jax.device_get(fn(name, *args, dtype))
            rec = {"kernel": kernel, "shape": name, "dtype": dt, "tensors": {}}
            ok = True
            floor = ABS_FLOOR[dt]
            for tensor, ((f_abs, f_rel), (x_abs, x_rel)) in res.items():
                f_abs, f_rel = float(f_abs), float(f_rel)
                x_abs, x_rel = float(x_abs), float(x_rel)
                t_ok = f_rel <= max(REL_FACTOR * x_rel, floor)
                ok &= t_ok
                rec["tensors"][tensor] = {
                    "pallas_max_abs": round(f_abs, 8),
                    "pallas_max_rel": round(f_rel, 8),
                    "xla_max_abs": round(x_abs, 8),
                    "xla_max_rel": round(x_rel, 8),
                    "ok": t_ok,
                }
            rec["ok"] = ok
            all_ok &= ok
            results.append(rec)
            print(json.dumps(rec))

    # fp32 @ HIGHEST precision, small shapes, tight tolerance vs the oracle
    for kernel, name, fn in HIGHEST_CASES:
        res = jax.device_get(fn())
        rec = {"kernel": kernel, "shape": name, "dtype": "float32_highest",
               "rel_tol": HIGHEST_REL_TOL, "tensors": {}}
        ok = True
        for tensor, (f_abs, f_rel) in res.items():
            f_abs, f_rel = float(f_abs), float(f_rel)
            row = {
                "pallas_max_abs": round(f_abs, 10),
                "pallas_max_rel": round(f_rel, 10),
            }
            # ":info" rows are recorded measurements (e.g. the flash-form
            # vs autodiff formulation distance), not kernel pass/fail
            if not tensor.endswith(":info"):
                row["ok"] = f_rel <= HIGHEST_REL_TOL
                ok &= row["ok"]
            rec["tensors"][tensor] = row
        rec["ok"] = ok
        all_ok &= ok
        results.append(rec)
        print(json.dumps(rec))

    summary = {
        "platform": platform,
        "defaults": {"unroll": 8, "exp2": True, "head_pad": 8,
                     "block_q": 512, "block_kv": 1024},
        "rel_factor": REL_FACTOR,
        "abs_floor": ABS_FLOOR,
        "n_cases": len(results),
        "all_ok": all_ok,
        "skipped_rows": SKIPPED_ROWS,
        "results": results,
    }
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({"tpu_selftest": "ok" if all_ok else "FAIL",
                      "platform": platform, "n_cases": len(results)}))
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
