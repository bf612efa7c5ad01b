"""Conv2d LoRA extension (LoraInjectedConv2d equivalent): target
enumeration matches real param shapes, forward effect, merge math,
serialization round-trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_finetuning_tpu import lora as L
from diffusion_finetuning_tpu.models.unet import (
    UNet2DConditionModel,
    UNetConfig,
    unet_all_lora_targets,
    unet_conv_lora_targets,
)
from diffusion_finetuning_tpu.tree_util import tree_get

from tests.jitutil import jit_apply, jit_init


@pytest.fixture(scope="module")
def tiny():
    cfg = UNetConfig.tiny()
    unet = UNet2DConditionModel(cfg)
    # jitted init: op-by-op init dispatch costs ~20 s on the 1-core box;
    # the executable lands in the persistent test compile cache
    params = jit_init(unet)(
        jax.random.PRNGKey(0), jnp.ones((1, 8, 8, 4)), jnp.zeros((1,), jnp.int32),
        jnp.ones((1, 77, cfg.cross_attention_dim)),
    )["params"]
    return cfg, unet, params


@pytest.fixture(scope="module")
def apply_jit(tiny):
    """One jitted apply shared by every test in the module (params and the
    lora tree are runtime args, so different trees never recompile)."""
    _, unet, _ = tiny

    @jax.jit
    def run(params, lora_tree, x, t, ctx):
        variables = {"params": params}
        if lora_tree is not None:
            variables["lora"] = lora_tree
        return unet.apply(variables, x, t, ctx)

    return run


def test_conv_targets_match_param_shapes(tiny):
    cfg, _, params = tiny
    targets = unet_conv_lora_targets(cfg)
    assert targets, "no conv targets enumerated"
    for t in targets:
        k = tree_get(params, t.path)["kernel"]  # flax (kh, kw, in, out)
        assert tuple(k.shape[:2]) == t.kernel_size, t.path
        assert k.shape[2] == t.in_features, (t.path, k.shape)
        assert k.shape[3] == t.out_features, (t.path, k.shape)


def test_conv_targets_match_sd15_param_count():
    cfg = UNetConfig.sd15()
    targets = unet_conv_lora_targets(cfg)
    # SD1.5: 22 resnets; each has conv1+conv2, shortcut only when cin != cout
    n_res = len([t for t in targets if t.path[1] == "conv1"])
    assert n_res == 22
    assert all(t.ancestor == "ResnetBlock2D" for t in targets)


def test_conv_lora_forward_effect_and_scale(tiny, apply_jit):
    cfg, unet, params = tiny
    targets = L.filter_targets(
        unet_all_lora_targets(cfg), L.UNET_EXTENDED_TARGET_REPLACE
    )
    assert any(t.is_conv for t in targets) and any(not t.is_conv for t in targets)
    tree = L.inject_trainable_lora(targets, jax.random.PRNGKey(1), r=2)

    x = jnp.ones((1, 8, 8, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.ones((1, 77, cfg.cross_attention_dim))
    base = apply_jit(params, None, x, t, ctx)
    # ups start at zero: identical output
    out0 = apply_jit(params, tree, x, t, ctx)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(base), atol=1e-6)

    # nonzero conv ups change the output
    def bump(leaf_tree):
        out = leaf_tree
        for tt in targets:
            if tt.is_conv:
                leaf = dict(tree_get(out, tt.path))
                leaf["up"] = jnp.ones_like(leaf["up"]) * 0.05
                from diffusion_finetuning_tpu.tree_util import tree_set

                out = tree_set(out, tt.path, leaf)
        return out

    tree2 = bump(tree)
    out1 = apply_jit(params, tree2, x, t, ctx)
    assert np.abs(np.asarray(out1) - np.asarray(base)).max() > 1e-4

    # scale 0 restores baseline
    tree3 = L.tune_lora_scale(tree2, 0.0)
    out2 = apply_jit(params, tree3, x, t, ctx)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(base), atol=1e-6)


def test_conv_weight_apply_matches_runtime(tiny, apply_jit):
    """Permanent merge == runtime LoRA for convs."""
    cfg, unet, params = tiny
    conv_targets = unet_conv_lora_targets(cfg)[:3]
    rng = np.random.default_rng(0)
    flat = []
    for t in conv_targets:
        flat.append(rng.standard_normal(
            (t.out_features, 2, 1, 1)).astype(np.float32) * 0.1)
        flat.append(rng.standard_normal(
            (2, t.in_features, *t.kernel_size)).astype(np.float32) * 0.1)

    tree = L.flat_to_lora_tree(flat, conv_targets)
    merged = L.weight_apply_lora(params, flat, conv_targets, alpha=1.0)

    x = jnp.ones((1, 8, 8, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.ones((1, 77, cfg.cross_attention_dim))
    out_rt = apply_jit(params, tree, x, t, ctx)
    out_mg = apply_jit(merged, None, x, t, ctx)
    np.testing.assert_allclose(np.asarray(out_rt), np.asarray(out_mg),
                               rtol=1e-4, atol=1e-4)


def test_conv_lora_safetensors_roundtrip(tiny, tmp_path):
    cfg, _, _ = tiny
    targets = L.filter_targets(
        unet_all_lora_targets(cfg), L.UNET_EXTENDED_TARGET_REPLACE
    )
    tree = L.inject_trainable_lora(targets, jax.random.PRNGKey(2), r=2)
    path = str(tmp_path / "conv_lora.safetensors")
    L.save_safeloras_with_embeds(
        {"unet": (tree, targets, L.UNET_EXTENDED_TARGET_REPLACE)}, None, path
    )
    from diffusion_finetuning_tpu.io import safetensors_io

    tensors, metadata = safetensors_io.read_safetensors(path)
    loras = L.parse_safeloras(tensors, metadata)
    flat, ranks, target = loras["unet"]
    assert "ResnetBlock2D" in target
    assert ranks == [2] * len(targets)
    back = L.flat_to_lora_tree(flat, targets)
    for t in targets:
        a = tree_get(tree, t.path)
        b = tree_get(back, t.path)
        np.testing.assert_array_equal(np.asarray(a["up"]), np.asarray(b["up"]))
        np.testing.assert_array_equal(np.asarray(a["down"]), np.asarray(b["down"]))


def test_conv_lora_grads_flow(tiny):
    cfg, unet, params = tiny
    conv_targets = unet_conv_lora_targets(cfg)[:2]
    tree = L.inject_trainable_lora(conv_targets, jax.random.PRNGKey(3), r=1)
    x = jnp.ones((1, 8, 8, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.ones((1, 77, cfg.cross_attention_dim))

    def loss(lora_tree):
        out = unet.apply({"params": params, "lora": lora_tree}, x, t, ctx)
        return jnp.sum(out ** 2)

    g = jax.jit(jax.grad(loss))(tree)
    up_g = tree_get(g, conv_targets[0].path)["up"]
    assert float(jnp.abs(up_g).max()) > 0

def test_im2col_conv_matches_xla_conv():
    """The DFT_CONV_IM2COL A/B path (patches-matmul formulation) must be a
    drop-in: same outputs as lax.conv for stride-1 padded 3x3 convs."""
    import jax
    import jax.numpy as jnp

    from diffusion_finetuning_tpu.models.layers import _im2col_conv

    rng = jax.random.PRNGKey(0)
    for (h, w, c, o, kh, pad) in [(8, 8, 16, 24, 3, 1), (5, 7, 4, 4, 1, 0),
                                  (6, 6, 8, 8, 3, 1)]:
        kx, kk = jax.random.split(jax.random.fold_in(rng, h * w))
        x = jax.random.normal(kx, (2, h, w, c))
        k = jax.random.normal(kk, (kh, kh, c, o)) * 0.1
        ref = jax.lax.conv_general_dilated(
            x, k, (1, 1), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = _im2col_conv(x, k, pad)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)


def test_shifted_matmul_conv_matches_xla_conv():
    """DFT_CONV_SHIFTED A/B path (accumulated shifted-view matmuls) must be a
    drop-in for stride-1 padded convs, like the im2col formulation."""
    import jax
    import jax.numpy as jnp

    from diffusion_finetuning_tpu.models.layers import _shifted_matmul_conv

    rng = jax.random.PRNGKey(1)
    for (h, w, c, o, kh, pad) in [(8, 8, 16, 24, 3, 1), (5, 7, 4, 4, 1, 0),
                                  (6, 6, 8, 8, 3, 1)]:
        kx, kk = jax.random.split(jax.random.fold_in(rng, h * w))
        x = jax.random.normal(kx, (2, h, w, c))
        k = jax.random.normal(kk, (kh, kh, c, o)) * 0.1
        ref = jax.lax.conv_general_dilated(
            x, k, (1, 1), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = _shifted_matmul_conv(x, k, pad)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)
