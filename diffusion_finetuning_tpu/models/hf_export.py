"""Export our Flax parameter trees back to HuggingFace-diffusers state dicts.

The inverse of :mod:`hf_loading` — needed by ``lora_add --mode upl`` (the
reference merges LoRA into a base pipeline then ``save_pretrained``s a
diffusers directory, cli_lora_add.py:72-88) and by the SD ``.ckpt``
converter (to_ckpt_v2.py:198-232).

Transforms (flax -> torch):
* dense ``kernel`` (in, out)        -> ``weight`` (out, in)
* conv ``kernel`` (kh, kw, in, out) -> ``weight`` (out, in, kh, kw)
* norm ``scale``                    -> ``weight``
* ``embedding``                     -> ``weight``

VAE attention is written with the SD-era diffusers names
(``query/key/value/proj_attn``) that the reference's ckpt converter maps
(to_ckpt_v2.py:152-158); :func:`hf_loading.vae_params_from_hf_state_dict`
reads both old and new spellings, so exports round-trip.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Mapping, Optional

import numpy as np

from ..tree_util import tree_get, tree_has
from .unet import UNetConfig
from .vae import VAEConfig
from .clip_text import CLIPTextConfig


def _np(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


class _Writer:
    def __init__(self, params: Mapping[str, Any]):
        self.params = params
        self.sd: Dict[str, np.ndarray] = {}

    def has(self, path) -> bool:
        return tree_has(self.params, path)

    def linear(self, path, key, bias=True):
        leaf = tree_get(self.params, path)
        self.sd[key + ".weight"] = _np(leaf["kernel"]).T
        if bias and "bias" in leaf:
            self.sd[key + ".bias"] = _np(leaf["bias"])

    def conv(self, path, key):
        leaf = tree_get(self.params, path)
        self.sd[key + ".weight"] = _np(leaf["kernel"]).transpose(3, 2, 0, 1)
        if "bias" in leaf:
            self.sd[key + ".bias"] = _np(leaf["bias"])

    def norm(self, path, key):
        leaf = tree_get(self.params, path)
        self.sd[key + ".weight"] = _np(leaf["scale"])
        self.sd[key + ".bias"] = _np(leaf["bias"])


def unet_state_dict(params: Mapping[str, Any], config: UNetConfig) -> Dict[str, np.ndarray]:
    w = _Writer(params)
    cfg = config

    w.conv(("conv_in",), "conv_in")
    w.linear(("time_embedding", "linear_1"), "time_embedding.linear_1")
    w.linear(("time_embedding", "linear_2"), "time_embedding.linear_2")
    w.norm(("conv_norm_out",), "conv_norm_out")
    w.conv(("conv_out",), "conv_out")

    def resnet(ours, hf):
        w.norm((ours, "norm1"), hf + ".norm1")
        w.conv((ours, "conv1"), hf + ".conv1")
        w.linear((ours, "time_emb_proj"), hf + ".time_emb_proj")
        w.norm((ours, "norm2"), hf + ".norm2")
        w.conv((ours, "conv2"), hf + ".conv2")
        if w.has((ours, "conv_shortcut")):
            w.conv((ours, "conv_shortcut"), hf + ".conv_shortcut")

    def attention(ours, hf):
        w.norm((ours, "norm"), hf + ".norm")
        proj = w.linear if cfg.use_linear_projection else w.conv
        proj((ours, "proj_in"), hf + ".proj_in")
        proj((ours, "proj_out"), hf + ".proj_out")
        tb, tb_hf = (ours, "transformer_blocks_0"), hf + ".transformer_blocks.0"
        for attn in ("attn1", "attn2"):
            for p in ("to_q", "to_k", "to_v"):
                w.linear(tb + (attn, p), f"{tb_hf}.{attn}.{p}", bias=False)
            w.linear(tb + (attn, "to_out"), f"{tb_hf}.{attn}.to_out.0")
        for norm in ("norm1", "norm2", "norm3"):
            w.norm(tb + (norm,), f"{tb_hf}.{norm}")
        w.linear(tb + ("ff", "net_0", "proj"), tb_hf + ".ff.net.0.proj")
        w.linear(tb + ("ff", "net_2"), tb_hf + ".ff.net.2")

    n = len(cfg.block_out_channels)
    for i, btype in enumerate(cfg.down_block_types):
        for j in range(cfg.layers_per_block):
            resnet(f"down_blocks_{i}_resnets_{j}", f"down_blocks.{i}.resnets.{j}")
            if btype == "CrossAttnDownBlock2D":
                attention(f"down_blocks_{i}_attentions_{j}", f"down_blocks.{i}.attentions.{j}")
        if i < n - 1:
            w.conv((f"down_blocks_{i}_downsamplers_0", "conv"),
                   f"down_blocks.{i}.downsamplers.0.conv")

    resnet("mid_block_resnets_0", "mid_block.resnets.0")
    attention("mid_block_attentions_0", "mid_block.attentions.0")
    resnet("mid_block_resnets_1", "mid_block.resnets.1")

    for i, btype in enumerate(cfg.up_block_types):
        for j in range(cfg.layers_per_block + 1):
            resnet(f"up_blocks_{i}_resnets_{j}", f"up_blocks.{i}.resnets.{j}")
            if btype == "CrossAttnUpBlock2D":
                attention(f"up_blocks_{i}_attentions_{j}", f"up_blocks.{i}.attentions.{j}")
        if i < n - 1:
            w.conv((f"up_blocks_{i}_upsamplers_0", "conv"),
                   f"up_blocks.{i}.upsamplers.0.conv")
    return w.sd


def vae_state_dict(params: Mapping[str, Any], config: VAEConfig) -> Dict[str, np.ndarray]:
    w = _Writer(params)
    cfg = config

    def resnet(ours, hf):
        w.norm(ours + ("norm1",), hf + ".norm1")
        w.conv(ours + ("conv1",), hf + ".conv1")
        w.norm(ours + ("norm2",), hf + ".norm2")
        w.conv(ours + ("conv2",), hf + ".conv2")
        if w.has(ours + ("conv_shortcut",)):
            w.conv(ours + ("conv_shortcut",), hf + ".conv_shortcut")

    def attn(ours, hf):
        w.norm(ours + ("group_norm",), hf + ".group_norm")
        for name in ("query", "key", "value", "proj_attn"):
            w.linear(ours + (name,), f"{hf}.{name}")

    def mid(ours, hf):
        resnet(ours + ("resnets_0",), hf + ".resnets.0")
        attn(ours + ("attentions_0",), hf + ".attentions.0")
        resnet(ours + ("resnets_1",), hf + ".resnets.1")

    n = len(cfg.block_out_channels)
    w.conv(("encoder", "conv_in"), "encoder.conv_in")
    for i in range(n):
        for j in range(cfg.layers_per_block):
            resnet(("encoder", f"down_blocks_{i}_resnets_{j}"),
                   f"encoder.down_blocks.{i}.resnets.{j}")
        if i < n - 1:
            w.conv(("encoder", f"down_blocks_{i}_downsamplers_0", "conv"),
                   f"encoder.down_blocks.{i}.downsamplers.0.conv")
    mid(("encoder", "mid_block"), "encoder.mid_block")
    w.norm(("encoder", "conv_norm_out"), "encoder.conv_norm_out")
    w.conv(("encoder", "conv_out"), "encoder.conv_out")

    w.conv(("decoder", "conv_in"), "decoder.conv_in")
    mid(("decoder", "mid_block"), "decoder.mid_block")
    for i in range(n):
        for j in range(cfg.layers_per_block + 1):
            resnet(("decoder", f"up_blocks_{i}_resnets_{j}"),
                   f"decoder.up_blocks.{i}.resnets.{j}")
        if i < n - 1:
            w.conv(("decoder", f"up_blocks_{i}_upsamplers_0", "conv"),
                   f"decoder.up_blocks.{i}.upsamplers.0.conv")
    w.norm(("decoder", "conv_norm_out"), "decoder.conv_norm_out")
    w.conv(("decoder", "conv_out"), "decoder.conv_out")

    w.conv(("quant_conv",), "quant_conv")
    w.conv(("post_quant_conv",), "post_quant_conv")
    return w.sd


def text_state_dict(params: Mapping[str, Any], config: CLIPTextConfig) -> Dict[str, np.ndarray]:
    """transformers CLIPTextModel keys (with the ``text_model.`` prefix)."""
    w = _Writer(params)
    pre = "text_model."
    w.sd[pre + "embeddings.token_embedding.weight"] = _np(
        tree_get(params, ("token_embedding", "embedding"))
    )
    w.sd[pre + "embeddings.position_embedding.weight"] = _np(
        tree_get(params, ("position_embedding", "embedding"))
    )
    w.norm(("final_layer_norm",), pre + "final_layer_norm")
    for i in range(config.num_hidden_layers):
        ours = (f"layers_{i}",)
        hf = pre + f"encoder.layers.{i}"
        for p in ("q_proj", "k_proj", "v_proj", "out_proj"):
            w.linear(ours + ("self_attn", p), f"{hf}.self_attn.{p}")
        w.linear(ours + ("mlp", "fc1"), hf + ".mlp.fc1")
        w.linear(ours + ("mlp", "fc2"), hf + ".mlp.fc2")
        w.norm(ours + ("layer_norm1",), hf + ".layer_norm1")
        w.norm(ours + ("layer_norm2",), hf + ".layer_norm2")
    return w.sd


# ---------------------------------------------------------------------------
# save_pretrained: write a diffusers-format pipeline directory
# ---------------------------------------------------------------------------


def save_pretrained(
    pipe,
    out_dir: str,
    source_dir: Optional[str] = None,
    as_half: bool = False,
) -> None:
    """Write ``pipe`` as a diffusers directory (unet/vae/text_encoder weights
    in safetensors + configs).  Non-weight files (configs, tokenizer,
    scheduler) are copied from ``source_dir`` when given, else synthesized
    from our configs."""
    from ..io import safetensors_io

    dtype = np.float16 if as_half else np.float32

    def write(subdir: str, filename: str, sd: Dict[str, np.ndarray]):
        d = os.path.join(out_dir, subdir)
        os.makedirs(d, exist_ok=True)
        safetensors_io.write_safetensors(
            {k: np.asarray(v, dtype) for k, v in sd.items()},
            os.path.join(d, filename),
        )

    write("unet", "diffusion_pytorch_model.safetensors",
          unet_state_dict(pipe.unet_params, pipe.unet_config))
    write("vae", "diffusion_pytorch_model.safetensors",
          vae_state_dict(pipe.vae_params, pipe.vae_config))
    write("text_encoder", "model.safetensors",
          text_state_dict(pipe.text_params, pipe.text_config))

    if source_dir is not None:
        for sub in ("unet", "vae", "text_encoder", "scheduler", "tokenizer"):
            src = os.path.join(source_dir, sub)
            if not os.path.isdir(src):
                continue
            dst = os.path.join(out_dir, sub)
            os.makedirs(dst, exist_ok=True)
            for f in os.listdir(src):
                if f.endswith((".json", ".txt")):
                    shutil.copy(os.path.join(src, f), os.path.join(dst, f))
        idx = os.path.join(source_dir, "model_index.json")
        if os.path.exists(idx):
            # model_index.json may reference components we do not rewrite
            # (safety_checker, feature_extractor, ...): copy them wholesale
            # when present, and DROP entries whose directory is still
            # missing — otherwise diffusers refuses to load the export
            with open(idx) as f:
                index = json.load(f)
            for name in list(index):
                if name.startswith("_") or not isinstance(index[name], list):
                    continue
                if os.path.isdir(os.path.join(out_dir, name)):
                    continue
                src = os.path.join(source_dir, name)
                if os.path.isdir(src):
                    shutil.copytree(
                        src, os.path.join(out_dir, name), dirs_exist_ok=True)
                else:
                    index[name] = [None, None]
            with open(os.path.join(out_dir, "model_index.json"), "w") as f:
                json.dump(index, f, indent=2)
    else:
        _write_configs(pipe, out_dir)
        _write_tokenizer_files(pipe.tokenizer, os.path.join(out_dir, "tokenizer"))


def _write_tokenizer_files(tok, d: str) -> None:
    """Persist the in-memory tokenizer (vocab.json + merges.txt) so a
    from-scratch export is reloadable by our own from_pretrained."""
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "vocab.json"), "w") as f:
        json.dump(tok.encoder, f)
    merges = [m for m, _ in sorted(tok.bpe_ranks.items(), key=lambda kv: kv[1])]
    with open(os.path.join(d, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
        f.write("\n".join(" ".join(m) for m in merges))


def _write_configs(pipe, out_dir: str) -> None:
    u, v, t = pipe.unet_config, pipe.vae_config, pipe.text_config

    def dump(subdir, name, obj):
        d = os.path.join(out_dir, subdir)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, name), "w") as f:
            json.dump(obj, f, indent=2)

    dump("unet", "config.json", {
        "_class_name": "UNet2DConditionModel",
        "sample_size": u.sample_size, "in_channels": u.in_channels,
        "out_channels": u.out_channels,
        "block_out_channels": list(u.block_out_channels),
        "layers_per_block": u.layers_per_block,
        "cross_attention_dim": u.cross_attention_dim,
        "attention_head_dim": (
            list(u.attention_head_dim)
            if isinstance(u.attention_head_dim, (tuple, list))
            else u.attention_head_dim
        ),
        "down_block_types": list(u.down_block_types),
        "up_block_types": list(u.up_block_types),
        "norm_num_groups": u.norm_num_groups,
        "use_linear_projection": u.use_linear_projection,
        "flip_sin_to_cos": u.flip_sin_to_cos, "freq_shift": u.freq_shift,
    })
    dump("vae", "config.json", {
        "_class_name": "AutoencoderKL",
        "in_channels": v.in_channels, "out_channels": v.out_channels,
        "latent_channels": v.latent_channels,
        "block_out_channels": list(v.block_out_channels),
        "layers_per_block": v.layers_per_block,
        "norm_num_groups": v.norm_num_groups, "sample_size": v.sample_size,
    })
    dump("text_encoder", "config.json", {
        "architectures": ["CLIPTextModel"], "vocab_size": t.vocab_size,
        "hidden_size": t.hidden_size, "intermediate_size": t.intermediate_size,
        "num_hidden_layers": t.num_hidden_layers,
        "num_attention_heads": t.num_attention_heads,
        "max_position_embeddings": t.max_position_embeddings,
        "hidden_act": t.hidden_act,
    })
    sc = pipe.scheduler_config
    dump("scheduler", "scheduler_config.json", {
        "_class_name": "DDPMScheduler",
        "num_train_timesteps": sc.num_train_timesteps,
        "beta_start": sc.beta_start, "beta_end": sc.beta_end,
        "beta_schedule": sc.beta_schedule,
        "prediction_type": sc.prediction_type,
        "steps_offset": sc.steps_offset,
        "set_alpha_to_one": sc.set_alpha_to_one,
    })
