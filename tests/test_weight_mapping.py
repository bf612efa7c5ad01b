"""Independent validation of the HF<->flax weight mapping (VERDICT r1 #2).

Two oracles break the hf_export<->hf_loading self-consistency loop:

1. The REFERENCE's own pure dict->dict conversion tables
   (/root/reference/lora_diffusion/to_ckpt_v2.py:16-185), loaded read-only at
   test time.  Both its converters and ours get the same diffusers-keyed
   state dict (produced by hf_export); key sets and values must agree
   exactly — the reference tables encode the true diffusers names, so a
   wrong key emitted by hf_export would pass through the reference converter
   unrenamed and diverge.

2. Real torch layers (torch-cpu is installed): _linear/_conv/_norm layout
   conventions are checked numerically against torch.nn.Linear/Conv2d/
   GroupNorm forward passes — a transpose error on both export and load
   sides cannot hide here.

Plus golden activation fixtures (tests/golden/*.npz) pinning the numeric
behavior of the tiny UNet/VAE/CLIP models themselves.
"""

import importlib.util
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_finetuning_tpu import to_ckpt_v2 as ours
from diffusion_finetuning_tpu.models import hf_export, hf_loading
from diffusion_finetuning_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
from diffusion_finetuning_tpu.models.unet import UNetConfig, UNet2DConditionModel
from diffusion_finetuning_tpu.models.vae import AutoencoderKL, VAEConfig

from tests.jitutil import jit_apply, jit_init

REF_TO_CKPT = "/root/reference/lora_diffusion/to_ckpt_v2.py"
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def ref():
    """Reference conversion tables, imported read-only as an oracle."""
    if not os.path.exists(REF_TO_CKPT):
        pytest.skip("reference tree not available")
    spec = importlib.util.spec_from_file_location("ref_to_ckpt_v2", REF_TO_CKPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def tiny_unet_sd():
    """Diffusers-keyed state dict for the tiny (full 4-block topology) UNet,
    every tensor filled with distinct values so misrouting is detectable."""
    cfg = UNetConfig.tiny()
    unet = UNet2DConditionModel(cfg)
    params = jit_init(unet)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 8, 8, 4)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, cfg.cross_attention_dim)),
    )["params"]
    return cfg, params, hf_export.unet_state_dict(params, cfg)


@pytest.fixture(scope="module")
def mini_sd_vae_sd():
    """4-block (SD-structured) narrow VAE: the reference table's decoder
    up-block reversal (up_blocks.i -> up.3-i) is only exercised at 4."""
    cfg = VAEConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=1,
                    norm_num_groups=4, sample_size=64)
    vae = AutoencoderKL(cfg)
    params = jit_init(vae)(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), jax.random.PRNGKey(1)
    )["params"]
    return cfg, params, hf_export.vae_state_dict(params, cfg)


def test_unet_ckpt_conversion_matches_reference_tables(ref, tiny_unet_sd):
    _, _, sd = tiny_unet_sd
    sd = {k: np.asarray(v) for k, v in sd.items()}
    got = ours.convert_unet_state_dict(dict(sd))
    want = ref.convert_unet_state_dict(dict(sd))
    assert set(got) == set(want)
    # every key actually moved out of diffusers namespace
    assert not any(k.startswith(("down_blocks.", "up_blocks.", "mid_block."))
                   for k in want)
    for k in want:
        np.testing.assert_array_equal(got[k], np.asarray(want[k]), err_msg=k)


def test_vae_ckpt_conversion_matches_reference_tables(ref, mini_sd_vae_sd):
    _, _, sd = mini_sd_vae_sd
    sd = {k: np.asarray(v) for k, v in sd.items()}
    got = ours.convert_vae_state_dict(dict(sd))
    want = ref.convert_vae_state_dict(dict(sd))
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_array_equal(got[k], np.asarray(want[k]), err_msg=k)
    # the mid-attention projections were reshaped to 1x1 convs
    for name in ("q", "k", "v", "proj_out"):
        for side in ("encoder", "decoder"):
            assert got[f"{side}.mid.attn_1.{name}.weight"].ndim == 4


def test_text_enc_conversion_matches_reference(ref):
    sd = {"text_model.encoder.layers.0.self_attn.q_proj.weight":
          np.arange(6, dtype=np.float32).reshape(2, 3)}
    got = ours.convert_text_enc_state_dict(dict(sd))
    want = ref.convert_text_enc_state_dict(dict(sd))
    assert set(got) == set(want)


# ---------------------------------------------------------------------------
# torch layout oracles for the loader primitives
# ---------------------------------------------------------------------------


def test_linear_layout_matches_torch():
    torch = pytest.importorskip("torch")

    torch.manual_seed(0)
    lin = torch.nn.Linear(5, 3)
    x = torch.randn(2, 5)
    want = lin(x).detach().numpy()

    sd = {"m.weight": lin.weight.detach().numpy(),
          "m.bias": lin.bias.detach().numpy()}
    p = hf_loading._linear(sd, "m")
    got = np.asarray(x.numpy() @ np.asarray(p["kernel"]) + np.asarray(p["bias"]))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_conv_layout_matches_torch():
    torch = pytest.importorskip("torch")
    from flax import linen as nn

    torch.manual_seed(0)
    conv = torch.nn.Conv2d(3, 4, kernel_size=3, padding=1)
    x = torch.randn(1, 3, 6, 6)
    want = conv(x).detach().numpy().transpose(0, 2, 3, 1)  # NCHW -> NHWC

    sd = {"c.weight": conv.weight.detach().numpy(),
          "c.bias": conv.bias.detach().numpy()}
    p = hf_loading._conv(sd, "c")
    fx = nn.Conv(4, (3, 3), padding=1)
    got = fx.apply({"params": p}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_groupnorm_layout_matches_torch():
    torch = pytest.importorskip("torch")
    from flax import linen as nn

    torch.manual_seed(0)
    gn = torch.nn.GroupNorm(2, 4)
    with torch.no_grad():
        gn.weight.copy_(torch.randn(4))
        gn.bias.copy_(torch.randn(4))
    x = torch.randn(1, 4, 5, 5)
    want = gn(x).detach().numpy().transpose(0, 2, 3, 1)

    sd = {"n.weight": gn.weight.detach().numpy(),
          "n.bias": gn.bias.detach().numpy()}
    p = hf_loading._norm(sd, "n")
    fx = nn.GroupNorm(num_groups=2, epsilon=1e-5)
    got = fx.apply({"params": p}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# loader completeness: every exported tensor must land in the flax tree
# ---------------------------------------------------------------------------


def test_unet_loader_consumes_every_hf_tensor(tiny_unet_sd):
    cfg, params, sd = tiny_unet_sd
    loaded = hf_loading.unet_params_from_hf_state_dict(sd, cfg)
    n_loaded = len(jax.tree_util.tree_leaves(loaded))
    assert n_loaded == len(sd)
    # and the trees match leaf-for-leaf (values + structure)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7),
        params, loaded,
    )


def test_vae_loader_consumes_every_hf_tensor(mini_sd_vae_sd):
    cfg, params, sd = mini_sd_vae_sd
    loaded = hf_loading.vae_params_from_hf_state_dict(sd, cfg)
    assert len(jax.tree_util.tree_leaves(loaded)) == len(sd)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7),
        params, loaded,
    )


# ---------------------------------------------------------------------------
# golden activation fixtures (regression pins; tests/golden/generate_fixtures.py)
# ---------------------------------------------------------------------------


def test_unet_tiny_golden_activations():
    d = np.load(os.path.join(GOLDEN_DIR, "unet_tiny_golden.npz"))
    cfg = UNetConfig.tiny()
    unet = UNet2DConditionModel(cfg)
    # jit-induced value shifts are ~1e-7 relative, far inside the pin
    # tolerance (rtol 1e-4); unjitted op-by-op dispatch costs ~10 s here
    params = jit_init(unet)(
        jax.random.PRNGKey(0), jnp.asarray(d["latents"]),
        jnp.asarray(d["t"]), jnp.asarray(d["ctx"]),
    )["params"]
    out = jit_apply(unet)({"params": params}, jnp.asarray(d["latents"]),
                              jnp.asarray(d["t"]), jnp.asarray(d["ctx"]))
    np.testing.assert_allclose(np.asarray(out), d["expected"], rtol=1e-4, atol=1e-5)


def test_vae_tiny_golden_activations():
    d = np.load(os.path.join(GOLDEN_DIR, "vae_tiny_golden.npz"))
    cfg = VAEConfig.tiny()
    vae = AutoencoderKL(cfg)
    params = jit_init(vae)(
        jax.random.PRNGKey(0), jnp.asarray(d["img"]), jax.random.PRNGKey(4)
    )["params"]
    posterior = jax.jit(lambda p, x: vae.apply({"params": p}, x,
                                               method=vae.encode))(
        params, jnp.asarray(d["img"]))
    np.testing.assert_allclose(np.asarray(posterior.mean), d["mean"],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(posterior.logvar), d["logvar"],
                               rtol=1e-4, atol=1e-5)
    dec = jax.jit(lambda p, z: vae.apply({"params": p}, z, method=vae.decode))(
        params, jnp.asarray(d["mean"]))
    np.testing.assert_allclose(np.asarray(dec), d["decoded"], rtol=1e-4, atol=1e-5)


def test_clip_tiny_golden_activations():
    d = np.load(os.path.join(GOLDEN_DIR, "clip_tiny_golden.npz"))
    cfg = CLIPTextConfig.tiny()
    enc = CLIPTextModel(cfg)
    params = jit_init(enc)(jax.random.PRNGKey(0), jnp.asarray(d["ids"]))["params"]
    out = jit_apply(enc)({"params": params}, jnp.asarray(d["ids"]))
    np.testing.assert_allclose(np.asarray(out), d["expected"], rtol=1e-4, atol=1e-5)
