"""Fused Pallas LoRA dense kernel: numerics + gradients vs the XLA path
(interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_finetuning_tpu.ops.lora_matmul import lora_dense


def _ref(x, w, b, up, down, scale):
    y = x @ w
    if b is not None:
        y = y + b
    return y + scale * ((x @ down.T) @ up.T)


@pytest.mark.parametrize("m,k,n,r", [(64, 96, 80, 4), (300, 320, 1280, 1),
                                     (256, 1280, 320, 8)])
def test_fused_matches_reference(m, k, n, r):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, n)) * 0.02, jnp.float32)
    b = jnp.asarray(rng.standard_normal((n,)) * 0.1, jnp.float32)
    up = jnp.asarray(rng.standard_normal((n, r)) * 0.1, jnp.float32)
    down = jnp.asarray(rng.standard_normal((r, k)) * 0.1, jnp.float32)
    scale = jnp.asarray(0.7, jnp.float32)

    out = lora_dense(x, w, b, up, down, scale, interpret=True)
    ref = _ref(x, w, b, up, down, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_leading_dims_and_no_bias():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 17, 64)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((64, 48)) * 0.05, jnp.float32)
    up = jnp.asarray(rng.standard_normal((48, 2)) * 0.1, jnp.float32)
    down = jnp.asarray(rng.standard_normal((2, 64)) * 0.1, jnp.float32)
    out = lora_dense(x, w, None, up, down, 1.0, interpret=True)
    ref = _ref(x.reshape(-1, 64), w, None, up, down, 1.0).reshape(2, 17, 48)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_gradients_match():
    rng = np.random.default_rng(2)
    m, k, n, r = 40, 64, 56, 3
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, n)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal((n,)) * 0.1, jnp.float32)
    up = jnp.asarray(rng.standard_normal((n, r)) * 0.1, jnp.float32)
    down = jnp.asarray(rng.standard_normal((r, k)) * 0.1, jnp.float32)
    scale = jnp.asarray(0.5, jnp.float32)

    def loss_fused(x, w, b, up, down, scale):
        return jnp.sum(lora_dense(x, w, b, up, down, scale, interpret=True) ** 2)

    def loss_ref(x, w, b, up, down, scale):
        return jnp.sum(_ref(x, w, b, up, down, scale) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4, 5))(x, w, b, up, down, scale)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(x, w, b, up, down, scale)
    for a, e in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=1e-3, atol=1e-3)


def test_lora_dense_layer_fused_flag():
    """LoRADense(use_fused_lora=True) (interpret off-TPU is not supported, so
    exercise the module plumbing via direct kernel call parity)."""
    from diffusion_finetuning_tpu.models.layers import LoRADense

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((4, 32)), jnp.float32)
    layer = LoRADense(features=24, use_fused_lora=False)
    params = layer.init(jax.random.PRNGKey(0), x)["params"]
    up = jnp.asarray(rng.standard_normal((24, 2)) * 0.1, jnp.float32)
    down = jnp.asarray(rng.standard_normal((2, 32)) * 0.1, jnp.float32)
    lora = {"up": up, "down": down, "scale": jnp.asarray(0.3, jnp.float32)}

    y = layer.apply({"params": params, "lora": lora}, x)
    ref = _ref(x, params["kernel"], params["bias"], up, down, 0.3)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-5, atol=1e-5)
