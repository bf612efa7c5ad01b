"""`lora_targets_from_module`: the reference `_find_modules` semantics
(class-name ancestor matching, lora.py:61-134) on ARBITRARY user Flax
models — the injection surface for models this framework does not ship."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from diffusion_finetuning_tpu import lora as lora_lib


# -- a toy NON-SD model whose class names match the reference target sets --
class CrossAttention(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        q = nn.Dense(self.dim, name="to_q", use_bias=False)(x)
        k = nn.Dense(self.dim, name="to_k", use_bias=False)(x)
        return nn.Dense(self.dim, name="to_out")(q * k)


class GEGLU(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim * 2, name="proj")(x)
        a, b = jnp.split(h, 2, axis=-1)
        return a * nn.gelu(b)


class Block(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        x = x + CrossAttention(self.dim, name="attn")(x)
        x = x + nn.Dense(self.dim, name="plain")(x)  # NOT under any target
        return x + GEGLU(self.dim, name="ff")(x)


class ToyModel(nn.Module):
    dim: int = 8

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.dim, name="embed")(x)  # NOT under any target
        x = Block(self.dim, name="block_0")(x)
        x = Block(self.dim, name="block_1")(x)
        return nn.Dense(4, name="head")(x)


def _toy():
    return ToyModel(), jax.random.PRNGKey(0), jnp.zeros((2, 6))


def test_derives_targets_in_ancestor_major_preorder():
    model, rng, x = _toy()
    ts = lora_lib.lora_targets_from_module(
        model, rng, x,
        target_replace_module={"CrossAttention", "GEGLU"})
    paths = [t.path for t in ts]
    assert paths == [
        ("block_0", "attn", "to_q"),
        ("block_0", "attn", "to_k"),
        ("block_0", "attn", "to_out"),
        ("block_0", "ff", "proj"),
        ("block_1", "attn", "to_q"),
        ("block_1", "attn", "to_k"),
        ("block_1", "attn", "to_out"),
        ("block_1", "ff", "proj"),
    ]
    assert all(t.ancestor == "CrossAttention" for t in ts if "attn" in t.path)
    assert all(t.ancestor == "GEGLU" for t in ts if "ff" in t.path)
    # shapes come from shape-level tracing of the real kernels
    proj = next(t for t in ts if t.path == ("block_0", "ff", "proj"))
    assert (proj.in_features, proj.out_features) == (8, 16)
    # the replace-set filter semantics compose as usual
    assert len(lora_lib.filter_targets(ts, {"GEGLU"})) == 2


def test_nested_ancestors_yield_each_layer_once():
    class Outer(nn.Module):  # class name in the set, containing another match
        @nn.compact
        def __call__(self, x):
            x = CrossAttention(4, name="inner")(x)
            return nn.Dense(4, name="own")(x)

    class Model(nn.Module):
        @nn.compact
        def __call__(self, x):
            return Outer(name="outer")(x)

    ts = lora_lib.lora_targets_from_module(
        Model(), jax.random.PRNGKey(0), jnp.zeros((1, 4)),
        target_replace_module={"Outer", "CrossAttention"})
    paths = [t.path for t in ts]
    assert len(paths) == len(set(paths)) == 4  # to_q,to_k,to_out,own — once
    # first-reaching ancestor claims the layer (reference skip-injected rule)
    assert {t.ancestor for t in ts
            if t.path[-1] in ("to_q", "to_k", "to_out")} == {"Outer"}


def test_dense_matching_its_own_class_name():
    class Model(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(4, name="lin")(x)

    ts = lora_lib.lora_targets_from_module(
        Model(), jax.random.PRNGKey(0), jnp.zeros((1, 4)),
        target_replace_module={"Dense"})
    assert [t.path for t in ts] == [("lin",)]


def test_conv_targets_opt_in():
    class ResnetBlock2D(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(8, (3, 3), padding=1, name="conv1")(x)

    class Model(nn.Module):
        @nn.compact
        def __call__(self, x):
            return ResnetBlock2D(name="res")(x)

    args = (jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 4)))
    no_conv = lora_lib.lora_targets_from_module(
        Model(), *args, target_replace_module={"ResnetBlock2D"})
    assert no_conv == []
    ts = lora_lib.lora_targets_from_module(
        Model(), *args, target_replace_module={"ResnetBlock2D"},
        include_conv=True)
    (t,) = ts
    assert t.path == ("res", "conv1")
    assert t.is_conv and t.kernel_size == (3, 3)
    assert (t.in_features, t.out_features) == (4, 8)


def test_derived_targets_drive_inject_and_merge_end_to_end():
    """The full user story for a custom model: derive targets -> inject a
    trainable tree -> permanently merge -> outputs shift by exactly the
    LoRA delta on the targeted layers."""
    model, rng, x = _toy()
    params = model.init(rng, x)["params"]
    ts = lora_lib.lora_targets_from_module(
        model, rng, x, target_replace_module={"CrossAttention", "GEGLU"})
    tree = lora_lib.inject_trainable_lora(ts, jax.random.PRNGKey(1), r=2)
    # fresh trees have up=0: merging them is an exact no-op
    flat = lora_lib.lora_tree_to_flat(tree, ts)
    merged = lora_lib.weight_apply_lora(params, flat, ts, alpha=1.0)
    np.testing.assert_array_equal(
        model.apply({"params": merged}, x), model.apply({"params": params}, x))

    # now give every pair a nonzero up and check one layer's exact delta
    flat = [np.full_like(np.asarray(a), 0.01) if i % 2 == 0 else np.asarray(a)
            for i, a in enumerate(flat)]
    merged = lora_lib.weight_apply_lora(params, flat, ts, alpha=0.5)
    t0 = ts[0]
    base_k = np.asarray(lora_lib.tree_get(params, t0.path)["kernel"])
    got_k = np.asarray(lora_lib.tree_get(merged, t0.path)["kernel"])
    want = base_k + 0.5 * (flat[0] @ flat[1]).T
    np.testing.assert_allclose(got_k, want, rtol=1e-6)
    # untargeted layers untouched
    np.testing.assert_array_equal(
        np.asarray(lora_lib.tree_get(merged, ("embed",))["kernel"]),
        np.asarray(lora_lib.tree_get(params, ("embed",))["kernel"]))
