"""Numerics tests for the Pallas fused 3x3 conv (interpret mode on CPU; the
compiled kernel is verified on the real chip by tpu_selftest.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_finetuning_tpu.ops.conv_pallas import (
    _xla_conv,
    conv3x3,
    supported,
)


@pytest.mark.parametrize(
    "shape",
    [
        (2, 16, 16, 64, 128),   # O = bn
        (1, 8, 8, 128, 320),    # O padded 320 -> 384
        (2, 16, 16, 128, 64),   # O < bn (padded up)
        (1, 32, 16, 64, 128),   # H > bh: multi row-block grid
    ],
)
def test_matches_xla_conv(shape):
    B, H, W, C, O = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, C, O)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal((O,)), jnp.float32)
    ref = _xla_conv(x, k, b)
    got = conv3x3(x, k, b, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_gradients_match_xla():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 64)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 64, 64)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal((64,)), jnp.float32)

    gp = jax.grad(lambda x, k, b: jnp.sum(conv3x3(x, k, b, True) ** 2),
                  (0, 1, 2))(x, k, b)
    gx = jax.grad(lambda x, k, b: jnp.sum(_xla_conv(x, k, b) ** 2),
                  (0, 1, 2))(x, k, b)
    for a, c in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-3, atol=1e-3)


def test_supported_predicate():
    # SD1.5 UNet levels at batch 2 (CFG pair)
    assert supported((2, 64, 64, 320), (3, 3, 320, 320), (1, 1))
    assert supported((2, 32, 32, 640), (3, 3, 640, 640), (1, 1))
    assert supported((2, 16, 16, 1280), (3, 3, 1280, 1280), (1, 1))
    assert supported((2, 8, 8, 1280), (3, 3, 1280, 1280), (1, 1))
    # rejected: stride-2, 1x1, RGB stem, tiny tests-only shapes
    assert not supported((2, 64, 64, 320), (3, 3, 320, 320), (2, 2))
    assert not supported((2, 64, 64, 320), (1, 1, 320, 320), (1, 1))
    assert not supported((1, 512, 512, 3), (3, 3, 3, 128), (1, 1))
    assert not supported((1, 8, 8, 16), (3, 3, 16, 16), (1, 1))
