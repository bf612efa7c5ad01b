"""UNet/VAE structural tests: shapes, jit, grads, LoRA target enumeration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_finetuning_tpu import lora as L
from diffusion_finetuning_tpu.models.unet import (
    UNet2DConditionModel,
    UNetConfig,
    timestep_embedding,
    unet_lora_targets,
)
from diffusion_finetuning_tpu.models.vae import AutoencoderKL, VAEConfig
from diffusion_finetuning_tpu.tree_util import tree_get

from tests.jitutil import jit_apply, jit_init

GOLDEN = "/root/reference/example_loras/lora_disney.safetensors"


@pytest.fixture(scope="module")
def tiny_unet():
    cfg = UNetConfig.tiny()
    model = UNet2DConditionModel(cfg)
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, cfg.sample_size, cfg.sample_size, 4))
    ctx = jnp.zeros((1, 77, cfg.cross_attention_dim))
    params = jit_init(model)(rng, sample, jnp.array([0]), ctx)["params"]
    return cfg, model, params


def test_unet_forward_shape(tiny_unet):
    cfg, model, params = tiny_unet
    x = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.sample_size, cfg.sample_size, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 77, cfg.cross_attention_dim))
    out = jit_apply(model)({"params": params}, x, jnp.array([10, 500]), ctx)
    assert out.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_unet_jit_and_grad(tiny_unet):
    cfg, model, params = tiny_unet
    targets = unet_lora_targets(cfg)
    tree = L.inject_trainable_lora(targets, jax.random.PRNGKey(0), r=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.sample_size, cfg.sample_size, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 77, cfg.cross_attention_dim))

    @jax.jit
    def loss_fn(lora_tree):
        out = model.apply({"params": params, "lora": lora_tree}, x, jnp.array([3]), ctx)
        return jnp.mean(out**2)

    g = jax.jit(jax.grad(loss_fn))(tree)
    # grads flow to every up and down
    for t in targets:
        leaf = tree_get(g, t.path)
        assert float(jnp.abs(leaf["down"]).max()) >= 0  # exists & finite
        assert np.isfinite(np.asarray(leaf["up"]).sum())
    # up starts at zero but receives gradient through down path
    some = tree_get(g, targets[0].path)
    assert float(jnp.abs(some["up"]).max()) > 0


def test_unet_lora_target_count_sd15():
    targets = unet_lora_targets(UNetConfig.sd15())
    assert len(targets) == 144
    te = [t for t in targets if t.ancestor == "GEGLU"]
    assert len(te) == 16


def test_unet_target_order_matches_golden_fingerprint():
    """The (in,out) sequence of our enumeration must equal the golden file's
    pair shapes index-by-index — this pins loader compatibility with every
    community LoRA file."""
    from diffusion_finetuning_tpu.io import safetensors_io as st

    tensors, metadata = st.read_safetensors(GOLDEN)
    loras = st.parse_safeloras(tensors, metadata)
    flat, ranks, _ = loras["unet"]
    targets = unet_lora_targets(UNetConfig.sd15())
    for i, t in enumerate(targets):
        up, down = flat[2 * i], flat[2 * i + 1]
        assert up.shape[0] == t.out_features, (i, t.path, up.shape)
        assert down.shape[1] == t.in_features, (i, t.path, down.shape)


def test_unet_golden_lora_applies(tiny_unet):
    """End-to-end: the golden UNet LoRA loads into SD1.5 target tree."""
    flat = L.load_safeloras(GOLDEN)["unet"][0]
    targets = unet_lora_targets(UNetConfig.sd15())
    tree = L.flat_to_lora_tree(flat, targets)
    leaf = tree_get(tree, ("down_blocks_0_attentions_0", "transformer_blocks_0",
                          "attn1", "to_q"))
    assert leaf["up"].shape == (320, 1)


def test_timestep_embedding_matches_formula():
    emb = timestep_embedding(jnp.array([0.0, 1.0, 999.0]), 320)
    assert emb.shape == (3, 320)
    # t=0: cos part all ones, sin part all zeros (flip_sin_to_cos => cos first)
    np.testing.assert_allclose(np.asarray(emb[0, :160]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(emb[0, 160:]), 0.0, atol=1e-6)


def test_gradient_checkpointing_same_output():
    cfg = UNetConfig.tiny()
    cfg_ckpt = UNetConfig.tiny()
    cfg_ckpt = type(cfg)(**{**cfg.__dict__, "gradient_checkpointing": True})
    m1 = UNet2DConditionModel(cfg)
    m2 = UNet2DConditionModel(cfg_ckpt)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 77, cfg.cross_attention_dim))
    params = jit_init(m1)(jax.random.PRNGKey(0), x, jnp.array([0]), ctx)["params"]
    o1 = jit_apply(m1)({"params": params}, x, jnp.array([5]), ctx)
    o2 = jit_apply(m2)({"params": params}, x, jnp.array([5]), ctx)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)


def test_vae_roundtrip_shapes():
    cfg = VAEConfig.tiny()
    model = AutoencoderKL(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    variables = jit_init(model)(jax.random.PRNGKey(1), x, jax.random.PRNGKey(2))
    params = variables["params"]
    @jax.jit
    def enc(p, xx, key):
        post = model.apply({"params": p}, xx, method=model.encode)
        return post.mean, post.sample(key)

    mean, z = enc(params, x, jax.random.PRNGKey(3))
    factor = 2 ** (len(cfg.block_out_channels) - 1)
    assert mean.shape == (1, 32 // factor, 32 // factor, cfg.latent_channels)
    rec = jax.jit(lambda p, zz: model.apply({"params": p}, zz, method=model.decode))(params, z)
    assert rec.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(rec)))


def test_vae_sample_statistics():
    """posterior.sample uses mean + std*eps with clipped logvar."""
    from diffusion_finetuning_tpu.models.vae import DiagonalGaussian

    moments = jnp.concatenate(
        [jnp.full((1, 2, 2, 4), 3.0), jnp.full((1, 2, 2, 4), -100.0)], axis=-1
    )
    dist = DiagonalGaussian(moments)
    np.testing.assert_allclose(np.asarray(dist.mean), 3.0)
    # logvar clipped at -30 => tiny std
    s = dist.sample(jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(s), 3.0, atol=1e-4)
