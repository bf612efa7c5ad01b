"""Flash attention kernel numerics (interpret mode on CPU) vs XLA reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_finetuning_tpu.ops import attention as attention_ops
from diffusion_finetuning_tpu.ops.attention import xla_attention
from diffusion_finetuning_tpu.ops.flash_attention import flash_attention


def _mk(b, sq, skv, heads, d, seed=0, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (b, sq, heads * d), dtype)
    k = jax.random.normal(ks[1], (b, skv, heads * d), dtype)
    v = jax.random.normal(ks[2], (b, skv, heads * d), dtype)
    return q, k, v


@pytest.mark.parametrize(
    "sq,skv,heads,d",
    [
        (256, 256, 2, 40),    # SD self-attn head dim, blocked
        (512, 512, 2, 64),
        (128, 77, 2, 40),     # cross-attention with ragged kv
        (64, 64, 1, 160),
        (300, 300, 2, 32),    # non-multiple q length
    ],
)
def test_forward_matches_xla(sq, skv, heads, d):
    q, k, v = _mk(1, sq, skv, heads, d)
    ref = xla_attention(q, k, v, heads)
    out = flash_attention(q, k, v, heads, interpret=True,
                          block_q=128, block_kv=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("pack", [2, 4])
def test_head_pack_forward_bit_matches_unpacked(pack):
    """G-heads-per-program packing is a scheduling change only: outputs must
    equal the unpacked kernel exactly (same per-head math, same order)."""
    q, k, v = _mk(2, 256, 256, 2, 40)  # BH = 4: divisible by 2 and 4
    base = flash_attention(q, k, v, 2, interpret=True,
                           block_q=128, block_kv=128, head_pack=1)
    packed = flash_attention(q, k, v, 2, interpret=True,
                             block_q=128, block_kv=128, head_pack=pack)
    np.testing.assert_array_equal(np.asarray(packed), np.asarray(base))
    # indivisible BH falls back to the unpacked kernel
    q3, k3, v3 = _mk(1, 256, 77, 3, 40)
    a = flash_attention(q3, k3, v3, 3, interpret=True,
                        block_q=128, block_kv=128, head_pack=2)
    b = flash_attention(q3, k3, v3, 3, interpret=True,
                        block_q=128, block_kv=128, head_pack=1)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_head_pack_backward_matches_unpacked():
    """The VJP through a packed forward equals the unpacked one (backward
    always runs the per-head grid; the saved lse contract is identical)."""
    q, k, v = _mk(2, 256, 256, 2, 40, seed=3)

    def loss(fn_pack):
        def f(q, k, v):
            o = flash_attention(q, k, v, 2, interpret=True, block_q=128,
                                block_kv=128, head_pack=fn_pack)
            return jnp.sum(o * o)
        return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

    g1 = loss(1)
    g2 = loss(2)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_backward_matches_xla():
    q, k, v = _mk(1, 256, 256, 2, 40)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, 2, interpret=True,
                                       block_q=128, block_kv=128) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(xla_attention(q, k, v, 2) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4,
                                   err_msg=f"d{name} mismatch")


@pytest.mark.parametrize("sq,skv,heads,d", [(256, 256, 2, 40), (128, 77, 2, 80)])
def test_exp2_softmax_matches_xla(sq, skv, heads, d):
    """Base-2 online softmax (log2e folded into scale) — fwd and bwd."""
    q, k, v = _mk(1, sq, skv, heads, d, seed=5)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, heads, interpret=True,
                                       block_q=64, block_kv=128,
                                       exp2=True, unroll=8) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(xla_attention(q, k, v, heads) ** 2)

    out = flash_attention(q, k, v, heads, interpret=True,
                          block_q=64, block_kv=128, exp2=True)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(xla_attention(q, k, v, heads)),
                               atol=2e-5, rtol=2e-5)
    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4,
                                   err_msg=f"d{name} mismatch")


def test_backward_cross_attention_ragged():
    q, k, v = _mk(1, 128, 77, 2, 40, seed=3)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, 2, interpret=True,
                                       block_q=64, block_kv=128) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(xla_attention(q, k, v, 2) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4,
                                   err_msg=f"d{name} mismatch")


def test_bf16_forward_close():
    q, k, v = _mk(2, 256, 256, 2, 64, dtype=jnp.bfloat16)
    ref = xla_attention(q, k, v, 2).astype(jnp.float32)
    out = flash_attention(q, k, v, 2, interpret=True,
                          block_q=128, block_kv=128).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


class TestPerShapeOverrides:
    """Per-(seq, head_dim) dispatch granularity (reference shim disables
    xformers per BasicTransformerBlock, xformers_utils.py:48-70)."""

    def teardown_method(self):
        attention_ops.clear_flash_overrides()
        attention_ops.set_flash_enabled(True)

    def test_head_dim_failure_does_not_disable_globally(self):
        attention_ops.set_flash_override(head_dim=40, enabled=False)
        assert not attention_ops.flash_supported(4096, 4096, 40)
        assert attention_ops.flash_supported(4096, 4096, 80)
        # KV=77 cross-attention routes to XLA by default (measured faster)
        assert not attention_ops.flash_supported(1024, 77, 160)
        assert attention_ops.flash_supported(1024, 1024, 160)

    def test_most_specific_match_wins(self):
        attention_ops.set_flash_override(head_dim=40, enabled=False)
        attention_ops.set_flash_override(seq_len_q=4096, head_dim=40, enabled=True)
        assert attention_ops.flash_supported(4096, 4096, 40)
        assert not attention_ops.flash_supported(1024, 1024, 40)

    def test_override_beats_global_switch(self):
        attention_ops.set_flash_enabled(False)
        attention_ops.set_flash_override(seq_len_q=4096, head_dim=64, enabled=True)
        assert attention_ops.flash_supported(4096, 4096, 64)
        assert not attention_ops.flash_supported(4096, 4096, 80)

    def test_none_clears_override(self):
        attention_ops.set_flash_override(head_dim=40, enabled=False)
        attention_ops.set_flash_override(head_dim=40, enabled=None)
        assert attention_ops.flash_supported(4096, 4096, 40)

    def test_shim_enable_undoes_global_disable(self, monkeypatch):
        from diffusion_finetuning_tpu import xformers_utils
        from diffusion_finetuning_tpu.models.unet import UNetConfig

        attention_ops.set_flash_enabled(False)
        monkeypatch.setattr(xformers_utils, "test_flash_backwards",
                            lambda size: True)
        ok = xformers_utils.set_use_memory_efficient_attention_xformers(
            UNetConfig.sd15())
        assert ok
        # the enable request must actually re-enable dispatch
        assert attention_ops.flash_supported(4096, 4096, 40)

    def test_shim_probes_each_head_dim_independently(self, monkeypatch):
        from diffusion_finetuning_tpu import xformers_utils
        from diffusion_finetuning_tpu.models.unet import UNetConfig

        cfg = UNetConfig.sd15()  # head dims 40, 80, 160, 160
        probed = []

        def fake_probe(size):
            probed.append(size)
            return size != 40  # pretend head dim 40's backward is broken

        monkeypatch.setattr(xformers_utils, "test_flash_backwards", fake_probe)
        ok = xformers_utils.set_use_memory_efficient_attention_xformers(cfg)
        assert ok  # still enabled for the other head dims
        assert set(probed) == {40, 80, 160}
        assert not attention_ops.flash_supported(4096, 4096, 40)
        assert attention_ops.flash_supported(2048, 2048, 80)
        assert attention_ops.flash_supported(1024, 1024, 160)
