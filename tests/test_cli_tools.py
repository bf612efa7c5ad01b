"""Tests for hf_export round-trip, the .ckpt converter, and the merge CLIs
(lora_add lpl/upl, cli_svd, cli_pt_to_safetensors)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_finetuning_tpu import lora as L
from diffusion_finetuning_tpu.data.tokenizer import CLIPTokenizer
from diffusion_finetuning_tpu.io import safetensors_io, torch_pickle
from diffusion_finetuning_tpu.models import hf_export, hf_loading
from diffusion_finetuning_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
from diffusion_finetuning_tpu.models.schedulers import SchedulerConfig
from diffusion_finetuning_tpu.models.unet import UNet2DConditionModel, UNetConfig
from diffusion_finetuning_tpu.models.vae import AutoencoderKL, VAEConfig
from diffusion_finetuning_tpu.pipelines.pipeline import StableDiffusionPipeline

from tests.jitutil import jit_apply, jit_init


_TINY_PARAMS_MEMO = {}


def _tiny_pipe():
    # Param trees are memoized per process: many test modules build a tiny
    # pipe, and on the 1-core CI box each unjitted init costs seconds.
    # Params are never mutated in place (all APIs are functional), so
    # sharing the trees across pipeline instances is safe.
    ucfg, vcfg, tcfg = UNetConfig.tiny(), VAEConfig.tiny(), CLIPTextConfig.tiny()
    if "trees" not in _TINY_PARAMS_MEMO:
        # jitted inits: the executables land in the persistent test compile
        # cache, so warm runs skip the op-by-op init dispatch entirely
        rng = jax.random.PRNGKey(0)
        unet_params = jit_init(UNet2DConditionModel(ucfg))(
            rng, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 77, ucfg.cross_attention_dim)),
        )["params"]
        vae_params = jit_init(AutoencoderKL(vcfg))(
            rng, jnp.zeros((1, 16, 16, 3)), rng
        )["params"]
        # CLIP init stays unjitted: under jit its initializer values change
        # bit-wise (fusion reassociation), which would shift every golden pin
        text_params = CLIPTextModel(tcfg).init(
            rng, jnp.zeros((1, 77), jnp.int32))["params"]
        _TINY_PARAMS_MEMO["trees"] = (unet_params, vae_params, text_params)
    unet_params, vae_params, text_params = _TINY_PARAMS_MEMO["trees"]
    tok = CLIPTokenizer.tiny(["photo", "of", "sks"])
    return StableDiffusionPipeline(
        ucfg, unet_params, vcfg, vae_params, tcfg, text_params,
        tok, SchedulerConfig(),
    )


def _write_tokenizer(tok: CLIPTokenizer, d: str):
    import json

    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "vocab.json"), "w") as f:
        json.dump(tok.encoder, f)
    merges = [m for m, _ in sorted(tok.bpe_ranks.items(), key=lambda kv: kv[1])]
    with open(os.path.join(d, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
        f.write("\n".join(" ".join(m) for m in merges))


@pytest.fixture(scope="module")
def pipe_dir(tmp_path_factory):
    pipe = _tiny_pipe()
    d = str(tmp_path_factory.mktemp("sd_tiny"))
    hf_export.save_pretrained(pipe, d)
    _write_tokenizer(pipe.tokenizer, os.path.join(d, "tokenizer"))
    return d, pipe


def _tree_allclose(a, b, atol=1e-6):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol)


# -- hf_export round-trips ---------------------------------------------------


def test_unet_export_import_roundtrip(pipe_dir):
    _, pipe = pipe_dir
    sd = hf_export.unet_state_dict(pipe.unet_params, pipe.unet_config)
    back = hf_loading.unet_params_from_hf_state_dict(sd, pipe.unet_config)
    _tree_allclose(pipe.unet_params, back)


def test_vae_export_import_roundtrip(pipe_dir):
    _, pipe = pipe_dir
    sd = hf_export.vae_state_dict(pipe.vae_params, pipe.vae_config)
    back = hf_loading.vae_params_from_hf_state_dict(sd, pipe.vae_config)
    _tree_allclose(pipe.vae_params, back)


def test_text_export_import_roundtrip(pipe_dir):
    _, pipe = pipe_dir
    sd = hf_export.text_state_dict(pipe.text_params, pipe.text_config)
    from diffusion_finetuning_tpu.models.clip_text import params_from_hf_state_dict

    back = params_from_hf_state_dict(sd, pipe.text_config)
    _tree_allclose(pipe.text_params, back)


def test_pipeline_from_pretrained_roundtrip(pipe_dir):
    d, pipe = pipe_dir
    pipe2 = StableDiffusionPipeline.from_pretrained(d)
    _tree_allclose(pipe.unet_params, pipe2.unet_params)
    _tree_allclose(pipe.vae_params, pipe2.vae_params)
    _tree_allclose(pipe.text_params, pipe2.text_params)


# -- .ckpt converter ---------------------------------------------------------


def test_unet_key_remap_spot_checks():
    from diffusion_finetuning_tpu.to_ckpt_v2 import convert_unet_state_dict

    cases = {
        "time_embedding.linear_1.weight": "time_embed.0.weight",
        "conv_in.weight": "input_blocks.0.0.weight",
        "conv_norm_out.bias": "out.0.bias",
        "conv_out.weight": "out.2.weight",
        "down_blocks.1.resnets.0.conv1.weight": "input_blocks.4.0.in_layers.2.weight",
        "down_blocks.0.attentions.1.proj_in.weight": "input_blocks.2.1.proj_in.weight",
        "down_blocks.2.downsamplers.0.conv.weight": "input_blocks.9.0.op.weight",
        "up_blocks.3.resnets.2.time_emb_proj.weight":
            "output_blocks.11.0.emb_layers.1.weight",
        "up_blocks.0.upsamplers.0.conv.weight": "output_blocks.2.1.conv.weight",
        "up_blocks.1.upsamplers.0.conv.weight": "output_blocks.5.2.conv.weight",
        "mid_block.attentions.0.norm.weight": "middle_block.1.norm.weight",
        "mid_block.resnets.1.conv_shortcut.weight":
            "middle_block.2.skip_connection.weight",
        "down_blocks.0.resnets.0.norm2.bias": "input_blocks.1.0.out_layers.0.bias",
    }
    sd = {k: np.zeros((2, 2), np.float32) for k in cases}
    out = convert_unet_state_dict(sd)
    assert set(out.keys()) == set(cases.values())


def test_vae_key_remap_and_attn_reshape():
    from diffusion_finetuning_tpu.to_ckpt_v2 import convert_vae_state_dict

    sd = {
        "encoder.down_blocks.2.resnets.1.conv1.weight": np.zeros((1, 1, 3, 3), np.float32),
        "decoder.up_blocks.1.resnets.0.conv_shortcut.weight": np.zeros((1, 1, 1, 1), np.float32),
        "decoder.up_blocks.0.upsamplers.0.conv.bias": np.zeros((4,), np.float32),
        # present so the converter infers the SD-standard 4 up blocks (the
        # reversal index adapts to the actual block count)
        "decoder.up_blocks.3.resnets.0.conv1.weight": np.zeros((1, 1, 3, 3), np.float32),
        "encoder.mid_block.attentions.0.query.weight": np.zeros((8, 8), np.float32),
        "encoder.mid_block.attentions.0.group_norm.weight": np.zeros((8,), np.float32),
        "encoder.mid_block.resnets.0.conv2.weight": np.zeros((1, 1, 3, 3), np.float32),
        "encoder.conv_norm_out.weight": np.zeros((4,), np.float32),
        "quant_conv.weight": np.zeros((8, 4, 1, 1), np.float32),
    }
    out = convert_vae_state_dict(sd)
    assert "encoder.down.2.block.1.conv1.weight" in out
    assert "decoder.up.2.block.0.nin_shortcut.weight" in out
    assert "decoder.up.3.upsample.conv.bias" in out
    assert "decoder.up.0.block.0.conv1.weight" in out  # up_blocks.3 reversed

    # non-4-block VAE: the reversal adapts (a 2-block decoder maps
    # up_blocks.1 -> up.0, not up.2)
    tiny = {
        "decoder.up_blocks.0.resnets.0.conv1.weight": np.zeros((1,), np.float32),
        "decoder.up_blocks.1.resnets.0.conv1.weight": np.zeros((1,), np.float32),
    }
    out2 = convert_vae_state_dict(tiny)
    assert set(out2) == {"decoder.up.1.block.0.conv1.weight",
                         "decoder.up.0.block.0.conv1.weight"}
    assert "encoder.mid.attn_1.q.weight" in out
    assert out["encoder.mid.attn_1.q.weight"].shape == (8, 8, 1, 1)
    assert "encoder.mid.attn_1.norm.weight" in out
    assert "encoder.mid.block_1.conv2.weight" in out
    assert "encoder.norm_out.weight" in out
    assert "quant_conv.weight" in out


def test_convert_to_ckpt_end_to_end(pipe_dir, tmp_path):
    from diffusion_finetuning_tpu.to_ckpt_v2 import convert_to_ckpt

    d, pipe = pipe_dir
    ckpt_path = str(tmp_path / "model.ckpt")
    convert_to_ckpt(d, ckpt_path, as_half=True)
    obj = torch_pickle.load(ckpt_path)
    sd = obj["state_dict"]
    prefixes = {"model.diffusion_model.", "first_stage_model.",
                "cond_stage_model.transformer."}
    assert all(any(k.startswith(p) for p in prefixes) for k in sd)
    # fp16 everywhere
    assert all(np.asarray(v).dtype == np.float16 for v in sd.values())
    # text encoder is a no-op remap: same count as export
    n_text = sum(k.startswith("cond_stage_model.transformer.") for k in sd)
    assert n_text == len(hf_export.text_state_dict(pipe.text_params, pipe.text_config))


# -- lora_add ----------------------------------------------------------------


def _random_flat(targets, rank, rng):
    flat = []
    for t in targets:
        flat.append(rng.standard_normal((t.out_features, rank)).astype(np.float16))
        flat.append(rng.standard_normal((rank, t.in_features)).astype(np.float16))
    return flat


def test_lora_add_lpl(tmp_path):
    from diffusion_finetuning_tpu.cli_lora_add import add

    pipe = _tiny_pipe()
    targets = pipe.lora_targets("unet", L.DEFAULT_TARGET_REPLACE)
    rng = np.random.default_rng(0)
    f1, f2 = _random_flat(targets, 2, rng), _random_flat(targets, 2, rng)
    p1, p2 = str(tmp_path / "a.pt"), str(tmp_path / "b.pt")
    out = str(tmp_path / "m.pt")
    torch_pickle.save(f1, p1)
    torch_pickle.save(f2, p2)

    add(p1, p2, out, alpha=0.3, mode="lpl")
    merged = torch_pickle.load(out)
    for m, a, b in zip(merged, f1, f2):
        np.testing.assert_allclose(
            np.asarray(m, np.float32),
            0.3 * np.asarray(a, np.float32) + 0.7 * np.asarray(b, np.float32),
            atol=1e-2,
        )


def test_lora_add_upl_matches_manual_merge(pipe_dir, tmp_path):
    from diffusion_finetuning_tpu.cli_lora_add import add
    from diffusion_finetuning_tpu.tree_util import tree_get

    d, pipe = pipe_dir
    targets = pipe.lora_targets("unet", L.DEFAULT_TARGET_REPLACE)
    rng = np.random.default_rng(1)
    flat = _random_flat(targets, 2, rng)
    lora_path = str(tmp_path / "w.pt")
    torch_pickle.save(flat, lora_path)
    out_dir = str(tmp_path / "merged")

    add(d, lora_path, out_dir, alpha=0.8, mode="upl")

    pipe2 = StableDiffusionPipeline.from_pretrained(out_dir)
    t = targets[0]
    base_k = np.asarray(tree_get(pipe.unet_params, t.path)["kernel"], np.float32)
    merged_k = np.asarray(tree_get(pipe2.unet_params, t.path)["kernel"], np.float32)
    up = np.asarray(flat[0], np.float32)
    down = np.asarray(flat[1], np.float32)
    np.testing.assert_allclose(merged_k, base_k + 0.8 * (up @ down).T, atol=1e-3)


def test_lora_add_upl_ckpt_v2(pipe_dir, tmp_path):
    from diffusion_finetuning_tpu.cli_lora_add import add

    d, pipe = pipe_dir
    targets = pipe.lora_targets("unet", L.DEFAULT_TARGET_REPLACE)
    flat = _random_flat(targets, 2, np.random.default_rng(2))
    lora_path = str(tmp_path / "w.pt")
    torch_pickle.save(flat, lora_path)
    ckpt = str(tmp_path / "out.ckpt")

    add(d, lora_path, ckpt, alpha=0.5, mode="upl-ckpt-v2")
    obj = torch_pickle.load(ckpt)
    assert "state_dict" in obj and len(obj["state_dict"]) > 50
    assert not os.path.exists(ckpt + ".tmp")


# -- cli_svd -----------------------------------------------------------------


def test_svd_distill_reconstructs_delta(pipe_dir, tmp_path):
    from diffusion_finetuning_tpu.cli_svd import svd_distill
    from diffusion_finetuning_tpu.tree_util import tree_get, tree_set

    d, pipe = pipe_dir
    # make a "tuned" model: base + a low-rank (rank-2) perturbation on every
    # unet/text target, so rank-4 SVD should reconstruct it near-exactly
    rng = np.random.default_rng(3)
    tuned = _tiny_pipe()
    tuned.unet_params = pipe.unet_params
    tuned.text_params = pipe.text_params
    deltas = {}
    for name in ("unet", "text_encoder"):
        targets = pipe.lora_targets(
            name,
            L.DEFAULT_TARGET_REPLACE if name == "unet"
            else L.TEXT_ENCODER_DEFAULT_TARGET_REPLACE,
        )
        params = tuned.unet_params if name == "unet" else tuned.text_params
        for t in targets:
            layer = dict(tree_get(params, t.path))
            u = rng.standard_normal((t.out_features, 2)).astype(np.float32) * 0.01
            v = rng.standard_normal((2, t.in_features)).astype(np.float32) * 0.01
            deltas[(name, t.path)] = u @ v
            layer["kernel"] = layer["kernel"] + jnp.asarray((u @ v).T)
            params = tree_set(params, t.path, layer)
        if name == "unet":
            tuned.unet_params = params
        else:
            tuned.text_params = params

    tuned_dir = str(tmp_path / "tuned")
    hf_export.save_pretrained(tuned, tuned_dir, source_dir=d)

    save_path = str(tmp_path / "svd.pt")
    svd_distill(tuned_dir, d, rank=4, clamp_quantile=1.0, save_path=save_path)

    flat = torch_pickle.load(save_path)
    targets = pipe.lora_targets("unet", L.DEFAULT_TARGET_REPLACE)
    assert len(flat) == 2 * len(targets)
    for i, t in enumerate(targets):
        U = np.asarray(flat[2 * i], np.float32)
        Vh = np.asarray(flat[2 * i + 1], np.float32)
        np.testing.assert_allclose(
            U @ Vh, deltas[("unet", t.path)], atol=2e-3
        )
    assert os.path.exists(str(tmp_path / "svd.text_encoder.pt"))


# -- cli_pt_to_safetensors ---------------------------------------------------


def test_pt_to_safetensors(tmp_path):
    from diffusion_finetuning_tpu.cli_pt_to_safetensors import convert

    pipe = _tiny_pipe()
    targets = pipe.lora_targets("unet", L.DEFAULT_TARGET_REPLACE)
    flat = _random_flat(targets, 2, np.random.default_rng(4))
    pt = str(tmp_path / "lora_weight.pt")
    torch_pickle.save(flat, pt)
    ti = {"<s1>": np.random.default_rng(5).standard_normal(16).astype(np.float32)}
    ti_pt = str(tmp_path / "lora_weight.ti.pt")
    torch_pickle.save(ti, ti_pt)
    out = str(tmp_path / "out.safetensors")

    convert(pt, ti_pt, outpath=out, **{"unet.rank": 2})

    tensors, metadata = safetensors_io.read_safetensors(out)
    loras = L.parse_safeloras(tensors, metadata)
    assert "unet" in loras
    flat_back, ranks, target = loras["unet"]
    assert ranks == [2] * len(targets)
    embeds = L.parse_safeloras_embeds(tensors, metadata)
    assert "<s1>" in embeds and embeds["<s1>"].shape == (16,)


# -- scripts/run_inference.py -------------------------------------------------


def test_run_inference_script(pipe_dir, tmp_path):
    """End-to-end smoke of the patch-and-generate script (the reference's
    run_inference.ipynb workflow): tiny saved pipeline + safetensors LoRA
    with a TI embed -> two PNGs on disk."""
    import importlib.util

    d, pipe = pipe_dir
    targets = pipe.lora_targets("unet", L.DEFAULT_TARGET_REPLACE)
    flat = _random_flat(targets, 2, np.random.default_rng(7))
    pt = str(tmp_path / "lora_weight.pt")
    torch_pickle.save(flat, pt)
    ti = {"<s1>": 0.01 * np.random.default_rng(8).standard_normal(32).astype(np.float32)}
    ti_pt = str(tmp_path / "lora_weight.ti.pt")
    torch_pickle.save(ti, ti_pt)
    lora_path = str(tmp_path / "lora.safetensors")
    from diffusion_finetuning_tpu.cli_pt_to_safetensors import convert

    convert(pt, ti_pt, outpath=lora_path, **{"unet.rank": 2})

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts", "run_inference.py",
    )
    spec = importlib.util.spec_from_file_location("run_inference", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    out = str(tmp_path / "img.png")
    mod.run(d, lora_path, prompt="a photo of <s1>", out=out, n=2,
            height=64, width=64, steps=2, scheduler="dpm",
            unet_scale=0.7, seed=3, dtype="float32")
    from PIL import Image

    for p in (str(tmp_path / "img-0.png"), str(tmp_path / "img-1.png")):
        assert os.path.exists(p)
        img = Image.open(p)
        assert img.size == (64, 64)


# -- scripts/sweep_lr.py --------------------------------------------------


def test_sweep_lr_script(pipe_dir, tmp_path):
    """LR sweep through one compiled train step (runtime lr_scale): three
    points, per-point trajectories + best LoRA on disk."""
    import importlib.util
    import json

    from PIL import Image

    d, pipe = pipe_dir
    inst = tmp_path / "inst"
    inst.mkdir()
    Image.fromarray(np.full((16, 16, 3), 90, np.uint8)).save(inst / "a.png")

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts", "sweep_lr.py",
    )
    spec = importlib.util.spec_from_file_location("sweep_lr", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    out = str(tmp_path / "out")
    mod.run(d, str(inst), out, prompt="a photo of sks", base_lr=1e-3,
            scales="0.5,2", steps=4, rank=1, resolution=16,
            steps_per_dispatch=2, mixed_precision="no")
    with open(os.path.join(out, "sweep.json")) as f:
        sweep = json.load(f)
    assert set(sweep) == {"0.5", "2.0"}
    assert all(len(v["losses"]) == 4 for v in sweep.values())
    flat = torch_pickle.load(os.path.join(out, "lora_best.pt"))
    assert len(flat) == 2 * len(pipe.lora_targets("unet", L.DEFAULT_TARGET_REPLACE))
