"""Full-model differential oracle for the HF->flax weight mapping.

The plain-torch mirrors in ``tests/torch_oracle.py`` re-implement the
diffusers UNet2DConditionModel / AutoencoderKL forward independently (no
shared code with ``models/``).  Both sides load the SAME synthetic HF-format
state dict — the torch model's own ``state_dict()``, whose keys match the
diffusers checkpoint layout — so a transpose or block-wiring error in
``models/hf_loading.py`` (unet_params_from_hf_state_dict:103-177,
vae_params_from_hf_state_dict:185-261) shows up as a full-model output
mismatch.  Closes SURVEY.md §7 hard-part #1 at the model level.

Reference ground truth for the layout: /root/reference/lora_diffusion/
to_ckpt_v2.py:16-185 (the diffusers key structure its tables encode).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from diffusion_finetuning_tpu.models import hf_loading
from diffusion_finetuning_tpu.models.unet import UNet2DConditionModel, UNetConfig
from diffusion_finetuning_tpu.models.vae import AutoencoderKL, VAEConfig

from tests.jitutil import jit_apply, jit_init

from tests.torch_oracle import TorchUNet, TorchVAE, randomize_


def _np_state_dict(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


# SD2.1-style mini config: linear transformer projections + per-block head
# counts, plus a mixed topology with layers_per_block=2
_MINI_SD21 = UNetConfig(
    sample_size=8,
    block_out_channels=(16, 32, 32),
    layers_per_block=2,
    cross_attention_dim=24,
    attention_head_dim=(2, 4, 4),
    down_block_types=("CrossAttnDownBlock2D", "CrossAttnDownBlock2D",
                      "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D", "CrossAttnUpBlock2D"),
    norm_num_groups=8,
    use_linear_projection=True,
)


@pytest.mark.parametrize(
    "cfg", [UNetConfig.tiny(), _MINI_SD21], ids=["tiny-sd15", "mini-sd21"]
)
def test_unet_full_model_matches_torch_oracle(cfg):
    tm = TorchUNet(cfg)
    randomize_(tm, seed=1)
    tm.eval()

    params = hf_loading.unet_params_from_hf_state_dict(_np_state_dict(tm), cfg)

    rng = np.random.default_rng(0)
    b, size = 2, 16
    x = rng.standard_normal((b, size, size, cfg.in_channels)).astype(np.float32)
    t = np.asarray([7, 401], np.int32)
    ctx = rng.standard_normal((b, 5, cfg.cross_attention_dim)).astype(np.float32)

    with torch.no_grad():
        ref = tm(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            torch.from_numpy(t.astype(np.int64)),
            torch.from_numpy(ctx),
        ).permute(0, 2, 3, 1).numpy()

    # jit: unjitted op-by-op dispatch dominates runtime on the 1-core CI box;
    # the executable lands in the persistent test compile cache
    out = jit_apply(UNet2DConditionModel(cfg))(
        {"params": params}, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx)
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-4)


def test_vae_full_model_matches_torch_oracle():
    cfg = VAEConfig.tiny()
    tm = TorchVAE(cfg)
    randomize_(tm, seed=2)
    tm.eval()

    params = hf_loading.vae_params_from_hf_state_dict(_np_state_dict(tm), cfg)
    vae = AutoencoderKL(cfg)

    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 16, 16, cfg.in_channels)).astype(np.float32)
    factor = 2 ** (len(cfg.block_out_channels) - 1)
    z = rng.standard_normal(
        (1, 16 // factor, 16 // factor, cfg.latent_channels)
    ).astype(np.float32)

    with torch.no_grad():
        ref_moments = tm.encode_moments(
            torch.from_numpy(x).permute(0, 3, 1, 2)
        ).permute(0, 2, 3, 1).numpy()
        ref_dec = tm.decode(
            torch.from_numpy(z).permute(0, 3, 1, 2)
        ).permute(0, 2, 3, 1).numpy()

    @jax.jit
    def encode_moments(params, x):
        post = vae.apply({"params": params}, x, method=vae.encode)
        return jnp.concatenate([post.mean, post.logvar], axis=-1)

    moments = encode_moments(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(moments), ref_moments,
                               atol=1e-4, rtol=1e-4)

    dec = jax.jit(lambda p, z: vae.apply({"params": p}, z, method=vae.decode))(
        params, jnp.asarray(z)
    )
    np.testing.assert_allclose(np.asarray(dec), ref_dec, atol=1e-4, rtol=1e-4)
