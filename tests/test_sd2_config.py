"""SD 2.x configuration path: use_linear_projection, per-block head counts,
v-prediction training target."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_finetuning_tpu.models.schedulers import DDPMScheduler, SchedulerConfig
from diffusion_finetuning_tpu.models.unet import UNet2DConditionModel, UNetConfig

from tests.jitutil import jit_apply, jit_init


def _tiny_sd2_cfg():
    return UNetConfig(
        sample_size=8,
        block_out_channels=(8, 16, 16, 16),
        layers_per_block=1,
        cross_attention_dim=32,
        attention_head_dim=(2, 4, 4, 4),
        norm_num_groups=4,
        use_linear_projection=True,
    )


def test_sd2_style_unet_forward_and_grad():
    cfg = _tiny_sd2_cfg()
    unet = UNet2DConditionModel(cfg)
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((1, 8, 8, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.ones((1, 77, 32))
    params = jit_init(unet)(rng, x, t, ctx)["params"]
    out = jit_apply(unet)({"params": params}, x, t, ctx)
    assert out.shape == (1, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()

    # linear projections: proj_in kernel is 2-D (dense), not 4-D (conv)
    from diffusion_finetuning_tpu.tree_util import tree_get

    k = tree_get(params, ("down_blocks_0_attentions_0", "proj_in"))["kernel"]
    assert k.ndim == 2

    # per-block head counts honored
    assert cfg.heads_for_block(0) == 2 and cfg.heads_for_block(2) == 4


def test_sd2_roundtrip_through_hf_export():
    from diffusion_finetuning_tpu.models import hf_export, hf_loading

    cfg = _tiny_sd2_cfg()
    unet = UNet2DConditionModel(cfg)
    params = jit_init(unet)(
        jax.random.PRNGKey(0), jnp.ones((1, 8, 8, 4)), jnp.zeros((1,), jnp.int32),
        jnp.ones((1, 77, 32)),
    )["params"]
    sd = hf_export.unet_state_dict(params, cfg)
    assert sd["down_blocks.0.attentions.0.proj_in.weight"].ndim == 2
    back = hf_loading.unet_params_from_hf_state_dict(sd, cfg)
    la = jax.tree_util.tree_leaves(params)
    lb = jax.tree_util.tree_leaves(back)
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_v_prediction_target_and_step():
    cfg = SchedulerConfig(prediction_type="v_prediction")
    sch = DDPMScheduler(cfg)
    x = jnp.ones((2, 4, 4, 4))
    noise = jax.random.normal(jax.random.PRNGKey(0), x.shape)
    t = jnp.array([10, 500])
    v = sch.training_target(x, noise, t)
    # v = sqrt(abar)*eps - sqrt(1-abar)*x0
    abar = sch.alphas_cumprod[t].reshape(-1, 1, 1, 1)
    expect = jnp.sqrt(abar) * noise - jnp.sqrt(1 - abar) * x
    np.testing.assert_allclose(np.asarray(v), np.asarray(expect), atol=1e-5)

    # DDIM step accepts v-prediction without NaNs
    from diffusion_finetuning_tpu.models.schedulers import DDIMScheduler

    dd = DDIMScheduler(cfg)
    ts = dd.timesteps(10)
    out = dd.step(v, ts[0], x, 10)
    assert np.isfinite(np.asarray(out)).all()
