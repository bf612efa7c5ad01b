"""Load HuggingFace diffusers/transformers checkpoints into our Flax trees.

The reference loads models with ``from_pretrained`` (cli_lora_pti.py:56-126);
here a local diffusers-format model directory (or individual safetensors /
torch .bin files) is mapped onto the NHWC Flax parameter trees.

Key translations (torch -> flax):
* Linear ``weight`` (out,in) -> ``kernel`` (in,out): transpose
* Conv ``weight`` (out,in,kh,kw) -> ``kernel`` (kh,kw,in,out): transpose(2,3,1,0)
* ``norm.weight/bias`` -> ``scale``/``bias``
* dotted module paths -> our flattened block names
  (``down_blocks.0.attentions.1.`` -> ``down_blocks_0_attentions_1``,
  ``transformer_blocks.0`` -> ``transformer_blocks_0``, ``ff.net.0.proj`` ->
  ``ff/net_0/proj``, ``to_out.0`` -> ``to_out``)

The name-structure knowledge mirrors what the reference's ckpt converter
encodes in its mapping tables (to_ckpt_v2.py:16-195), rebuilt here for the
diffusers->flax direction.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Mapping, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..io import safetensors_io, torch_pickle
from ..tree_util import tree_set
from .clip_text import CLIPTextConfig, params_from_hf_state_dict
from .unet import UNetConfig
from .vae import VAEConfig


def _load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read one weights file (.safetensors or torch .bin) to numpy."""
    if path.endswith(".safetensors"):
        tensors, _ = safetensors_io.read_safetensors(path)
        return dict(tensors)
    obj = torch_pickle.load(path)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: np.asarray(v) for k, v in obj.items()}


def load_model_dir_state_dict(model_dir: str) -> Dict[str, np.ndarray]:
    """Load all weight shards in a diffusers model subdirectory."""
    candidates = [
        "diffusion_pytorch_model.safetensors",
        "diffusion_pytorch_model.bin",
        "model.safetensors",
        "pytorch_model.bin",
    ]
    sd: Dict[str, np.ndarray] = {}
    found = False
    for name in candidates:
        p = os.path.join(model_dir, name)
        if os.path.exists(p):
            sd.update(_load_state_dict(p))
            found = True
            break
    if not found:
        # sharded checkpoints
        for name in sorted(os.listdir(model_dir)):
            if re.match(r".*-\d{5}-of-\d{5}\.(safetensors|bin)$", name):
                sd.update(_load_state_dict(os.path.join(model_dir, name)))
                found = True
    if not found:
        raise FileNotFoundError(f"no weights found in {model_dir}")
    return sd


def _linear(sd, key_prefix, bias=True) -> Dict[str, jnp.ndarray]:
    out = {"kernel": jnp.asarray(np.asarray(sd[key_prefix + ".weight"], np.float32).T)}
    if bias and key_prefix + ".bias" in sd:
        out["bias"] = jnp.asarray(np.asarray(sd[key_prefix + ".bias"], np.float32))
    return out


def _conv(sd, key_prefix) -> Dict[str, jnp.ndarray]:
    w = np.asarray(sd[key_prefix + ".weight"], np.float32)
    out = {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0))}
    if key_prefix + ".bias" in sd:
        out["bias"] = jnp.asarray(np.asarray(sd[key_prefix + ".bias"], np.float32))
    return out


def _norm(sd, key_prefix) -> Dict[str, jnp.ndarray]:
    return {
        "scale": jnp.asarray(np.asarray(sd[key_prefix + ".weight"], np.float32)),
        "bias": jnp.asarray(np.asarray(sd[key_prefix + ".bias"], np.float32)),
    }


# ---------------------------------------------------------------------------
# UNet
# ---------------------------------------------------------------------------


def unet_params_from_hf_state_dict(sd: Mapping[str, np.ndarray], config: UNetConfig) -> dict:
    cfg = config
    p: dict = {}

    def put(path, value):
        nonlocal p
        p = tree_set(p, path, value)

    put(("conv_in",), _conv(sd, "conv_in"))
    put(("time_embedding", "linear_1"), _linear(sd, "time_embedding.linear_1"))
    put(("time_embedding", "linear_2"), _linear(sd, "time_embedding.linear_2"))
    put(("conv_norm_out",), _norm(sd, "conv_norm_out"))
    put(("conv_out",), _conv(sd, "conv_out"))

    def map_resnet(hf, ours, has_shortcut_key):
        put((ours, "norm1"), _norm(sd, hf + ".norm1"))
        put((ours, "conv1"), _conv(sd, hf + ".conv1"))
        put((ours, "time_emb_proj"), _linear(sd, hf + ".time_emb_proj"))
        put((ours, "norm2"), _norm(sd, hf + ".norm2"))
        put((ours, "conv2"), _conv(sd, hf + ".conv2"))
        if has_shortcut_key in sd:
            put((ours, "conv_shortcut"), _conv(sd, hf + ".conv_shortcut"))

    def map_attention(hf, ours):
        """Transformer2DModel: norm, proj_in/out, one BasicTransformerBlock."""
        put((ours, "norm"), _norm(sd, hf + ".norm"))
        proj_fn = _linear if cfg.use_linear_projection else _conv
        put((ours, "proj_in"), proj_fn(sd, hf + ".proj_in"))
        put((ours, "proj_out"), proj_fn(sd, hf + ".proj_out"))
        tb_hf = hf + ".transformer_blocks.0"
        tb = (ours, "transformer_blocks_0")
        for attn in ("attn1", "attn2"):
            for proj in ("to_q", "to_k", "to_v"):
                put(tb + (attn, proj), _linear(sd, f"{tb_hf}.{attn}.{proj}", bias=False))
            put(tb + (attn, "to_out"), _linear(sd, f"{tb_hf}.{attn}.to_out.0"))
        for norm in ("norm1", "norm2", "norm3"):
            put(tb + (norm,), _norm(sd, f"{tb_hf}.{norm}"))
        put(tb + ("ff", "net_0", "proj"), _linear(sd, tb_hf + ".ff.net.0.proj"))
        put(tb + ("ff", "net_2"), _linear(sd, tb_hf + ".ff.net.2"))

    n_blocks = len(cfg.block_out_channels)
    for i, btype in enumerate(cfg.down_block_types):
        for j in range(cfg.layers_per_block):
            hf = f"down_blocks.{i}.resnets.{j}"
            map_resnet(hf, f"down_blocks_{i}_resnets_{j}", hf + ".conv_shortcut.weight")
            if btype == "CrossAttnDownBlock2D":
                map_attention(
                    f"down_blocks.{i}.attentions.{j}", f"down_blocks_{i}_attentions_{j}"
                )
        if i < n_blocks - 1:
            put(
                (f"down_blocks_{i}_downsamplers_0", "conv"),
                _conv(sd, f"down_blocks.{i}.downsamplers.0.conv"),
            )

    map_resnet("mid_block.resnets.0", "mid_block_resnets_0",
               "mid_block.resnets.0.conv_shortcut.weight")
    map_attention("mid_block.attentions.0", "mid_block_attentions_0")
    map_resnet("mid_block.resnets.1", "mid_block_resnets_1",
               "mid_block.resnets.1.conv_shortcut.weight")

    for i, btype in enumerate(cfg.up_block_types):
        for j in range(cfg.layers_per_block + 1):
            hf = f"up_blocks.{i}.resnets.{j}"
            map_resnet(hf, f"up_blocks_{i}_resnets_{j}", hf + ".conv_shortcut.weight")
            if btype == "CrossAttnUpBlock2D":
                map_attention(
                    f"up_blocks.{i}.attentions.{j}", f"up_blocks_{i}_attentions_{j}"
                )
        if i < n_blocks - 1:
            put(
                (f"up_blocks_{i}_upsamplers_0", "conv"),
                _conv(sd, f"up_blocks.{i}.upsamplers.0.conv"),
            )
    return p


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------


def vae_params_from_hf_state_dict(sd: Mapping[str, np.ndarray], config: VAEConfig) -> dict:
    cfg = config
    p: dict = {}

    def put(path, value):
        nonlocal p
        p = tree_set(p, path, value)

    def map_resnet(hf, ours):
        put(ours + ("norm1",), _norm(sd, hf + ".norm1"))
        put(ours + ("conv1",), _conv(sd, hf + ".conv1"))
        put(ours + ("norm2",), _norm(sd, hf + ".norm2"))
        put(ours + ("conv2",), _conv(sd, hf + ".conv2"))
        if hf + ".conv_shortcut.weight" in sd:
            put(ours + ("conv_shortcut",), _conv(sd, hf + ".conv_shortcut"))

    def map_attn(hf, ours):
        # old-format keys (query/key/value/proj_attn) or new (to_q/to_k/...)
        old = hf + ".query.weight" in sd
        names = (
            ("query", "key", "value", "proj_attn")
            if old
            else ("to_q", "to_k", "to_v", "to_out.0")
        )
        ours_names = ("query", "key", "value", "proj_attn")
        put(ours + ("group_norm",), _norm(sd, hf + ".group_norm"))
        for hf_n, our_n in zip(names, ours_names):
            w = np.asarray(sd[f"{hf}.{hf_n}.weight"], np.float32)
            if w.ndim == 4:  # some converters store 1x1 convs
                w = w[:, :, 0, 0]
            put(ours + (our_n,), {
                "kernel": jnp.asarray(w.T),
                "bias": jnp.asarray(np.asarray(sd[f"{hf}.{hf_n}.bias"], np.float32)),
            })

    def map_mid(hf, ours):
        map_resnet(hf + ".resnets.0", ours + ("resnets_0",))
        map_attn(hf + ".attentions.0", ours + ("attentions_0",))
        map_resnet(hf + ".resnets.1", ours + ("resnets_1",))

    # encoder
    put(("encoder", "conv_in"), _conv(sd, "encoder.conv_in"))
    for i in range(len(cfg.block_out_channels)):
        for j in range(cfg.layers_per_block):
            map_resnet(
                f"encoder.down_blocks.{i}.resnets.{j}",
                ("encoder", f"down_blocks_{i}_resnets_{j}"),
            )
        if i < len(cfg.block_out_channels) - 1:
            put(
                ("encoder", f"down_blocks_{i}_downsamplers_0", "conv"),
                _conv(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv"),
            )
    map_mid("encoder.mid_block", ("encoder", "mid_block"))
    put(("encoder", "conv_norm_out"), _norm(sd, "encoder.conv_norm_out"))
    put(("encoder", "conv_out"), _conv(sd, "encoder.conv_out"))

    # decoder
    put(("decoder", "conv_in"), _conv(sd, "decoder.conv_in"))
    map_mid("decoder.mid_block", ("decoder", "mid_block"))
    for i in range(len(cfg.block_out_channels)):
        for j in range(cfg.layers_per_block + 1):
            map_resnet(
                f"decoder.up_blocks.{i}.resnets.{j}",
                ("decoder", f"up_blocks_{i}_resnets_{j}"),
            )
        if i < len(cfg.block_out_channels) - 1:
            put(
                ("decoder", f"up_blocks_{i}_upsamplers_0", "conv"),
                _conv(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv"),
            )
    put(("decoder", "conv_norm_out"), _norm(sd, "decoder.conv_norm_out"))
    put(("decoder", "conv_out"), _conv(sd, "decoder.conv_out"))

    put(("quant_conv",), _conv(sd, "quant_conv"))
    put(("post_quant_conv",), _conv(sd, "post_quant_conv"))
    return p


# ---------------------------------------------------------------------------
# Pipeline directory loading
# ---------------------------------------------------------------------------


def read_json(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def unet_config_from_hf(config: dict) -> UNetConfig:
    head = config.get("attention_head_dim", 8)
    return UNetConfig(
        sample_size=config.get("sample_size", 64),
        in_channels=config.get("in_channels", 4),
        out_channels=config.get("out_channels", 4),
        block_out_channels=tuple(config.get("block_out_channels", (320, 640, 1280, 1280))),
        layers_per_block=config.get("layers_per_block", 2),
        cross_attention_dim=config.get("cross_attention_dim", 768),
        attention_head_dim=tuple(head) if isinstance(head, list) else head,
        down_block_types=tuple(config.get("down_block_types", UNetConfig().down_block_types)),
        up_block_types=tuple(config.get("up_block_types", UNetConfig().up_block_types)),
        norm_num_groups=config.get("norm_num_groups", 32),
        use_linear_projection=config.get("use_linear_projection", False),
        flip_sin_to_cos=config.get("flip_sin_to_cos", True),
        freq_shift=config.get("freq_shift", 0),
    )


def vae_config_from_hf(config: dict) -> VAEConfig:
    return VAEConfig(
        in_channels=config.get("in_channels", 3),
        out_channels=config.get("out_channels", 3),
        latent_channels=config.get("latent_channels", 4),
        block_out_channels=tuple(config.get("block_out_channels", (128, 256, 512, 512))),
        layers_per_block=config.get("layers_per_block", 2),
        norm_num_groups=config.get("norm_num_groups", 32),
        sample_size=config.get("sample_size", 512),
    )


def clip_config_from_hf(config: dict) -> CLIPTextConfig:
    return CLIPTextConfig(
        vocab_size=config.get("vocab_size", 49408),
        hidden_size=config.get("hidden_size", 768),
        intermediate_size=config.get("intermediate_size", 3072),
        num_hidden_layers=config.get("num_hidden_layers", 12),
        num_attention_heads=config.get("num_attention_heads", 12),
        max_position_embeddings=config.get("max_position_embeddings", 77),
        hidden_act=config.get("hidden_act", "quick_gelu"),
    )


def load_pipeline_components(model_dir: str):
    """Load unet/vae/text_encoder configs+params from a local diffusers dir.

    Returns a dict with configs and param trees; tokenizer files are read by
    data.tokenizer.  Mirrors StableDiffusionPipeline.from_pretrained for the
    components the reference uses.
    """
    out: Dict[str, Any] = {}
    unet_dir = os.path.join(model_dir, "unet")
    vae_dir = os.path.join(model_dir, "vae")
    text_dir = os.path.join(model_dir, "text_encoder")

    ucfg = unet_config_from_hf(read_json(os.path.join(unet_dir, "config.json")))
    out["unet_config"] = ucfg
    out["unet_params"] = unet_params_from_hf_state_dict(
        load_model_dir_state_dict(unet_dir), ucfg
    )
    vcfg = vae_config_from_hf(read_json(os.path.join(vae_dir, "config.json")))
    out["vae_config"] = vcfg
    out["vae_params"] = vae_params_from_hf_state_dict(
        load_model_dir_state_dict(vae_dir), vcfg
    )
    tcfg = clip_config_from_hf(read_json(os.path.join(text_dir, "config.json")))
    out["text_config"] = tcfg
    out["text_params"] = params_from_hf_state_dict(
        load_model_dir_state_dict(text_dir), tcfg
    )
    sched_cfg_path = os.path.join(model_dir, "scheduler", "scheduler_config.json")
    out["scheduler_config"] = read_json(sched_cfg_path) if os.path.exists(sched_cfg_path) else {}
    return out
