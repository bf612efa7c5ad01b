"""Flax CLIP text encoder (the SD 1.x/2.x conditioning model).

Replaces the reference's dependency on ``transformers.CLIPTextModel``
(reference: training_scripts/train_lora_dreambooth.py:571-575,
cli_lora_pti.py:56-66).  The attention projections are
:class:`~diffusion_finetuning_tpu.models.layers.LoRADense` so the
``{"CLIPAttention"}`` target set (lora.py:54) maps onto module paths
``layers_{i}/self_attn/{k,v,q,out}_proj`` — enumerated in the reference's
``_find_modules`` order (k, v, q, out per layer; verified against
transformers' registration order and example_loras/lora_disney.safetensors).

Numerics verified against ``transformers.CLIPTextModel`` (torch CPU) to
<=1e-4 in tests/test_clip_text.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..lora import LoraTarget
from .layers import ACT2FN, LoRADense


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    max_position_embeddings: int = 77
    hidden_act: str = "quick_gelu"
    layer_norm_eps: float = 1e-5

    @staticmethod
    def sd15() -> "CLIPTextConfig":
        """openai/clip-vit-large-patch14 text config (SD 1.x)."""
        return CLIPTextConfig()

    @staticmethod
    def sd21() -> "CLIPTextConfig":
        """OpenCLIP ViT-H text config (SD 2.x) — gelu activation, 23 layers."""
        return CLIPTextConfig(
            hidden_size=1024,
            intermediate_size=4096,
            num_hidden_layers=23,
            num_attention_heads=16,
            hidden_act="gelu",
        )

    @staticmethod
    def tiny() -> "CLIPTextConfig":
        """CPU-fast config for tests."""
        return CLIPTextConfig(
            vocab_size=1000,
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            max_position_embeddings=77,
        )


class CLIPAttention(nn.Module):
    """Multi-head self-attention with causal mask (HF CLIPAttention parity)."""

    config: CLIPTextConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, causal_mask: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        heads = cfg.num_attention_heads
        head_dim = cfg.hidden_size // heads
        scale = head_dim**-0.5

        # Projection registration order k, v, q, out matches transformers
        # CLIPAttention.__init__ so LoRA pair indices line up with reference
        # checkpoints (fingerprint: tests/test_lora_core.py).
        k = LoRADense(cfg.hidden_size, dtype=self.dtype, name="k_proj")(x)
        v = LoRADense(cfg.hidden_size, dtype=self.dtype, name="v_proj")(x)
        q = LoRADense(cfg.hidden_size, dtype=self.dtype, name="q_proj")(x) * scale

        B, S, _ = x.shape
        split = lambda t: t.reshape(B, S, heads, head_dim).transpose(0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)

        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        attn = attn + causal_mask
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, S, cfg.hidden_size)
        return LoRADense(cfg.hidden_size, dtype=self.dtype, name="out_proj")(out)


class CLIPMLP(nn.Module):
    config: CLIPTextConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = ACT2FN[self.config.hidden_act]
        x = nn.Dense(self.config.intermediate_size, dtype=self.dtype, name="fc1")(x)
        x = act(x)
        return nn.Dense(self.config.hidden_size, dtype=self.dtype, name="fc2")(x)


class CLIPEncoderLayer(nn.Module):
    config: CLIPTextConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, causal_mask: jnp.ndarray) -> jnp.ndarray:
        eps = self.config.layer_norm_eps
        residual = x
        x = nn.LayerNorm(epsilon=eps, dtype=self.dtype, name="layer_norm1")(x)
        x = CLIPAttention(self.config, dtype=self.dtype, name="self_attn")(x, causal_mask)
        x = residual + x
        residual = x
        x = nn.LayerNorm(epsilon=eps, dtype=self.dtype, name="layer_norm2")(x)
        x = CLIPMLP(self.config, dtype=self.dtype, name="mlp")(x)
        return residual + x


class CLIPTextModel(nn.Module):
    """Returns last_hidden_state (B, S, hidden) — what the UNet conditions on
    (reference loss_step: cli_lora_pti.py:199-213 uses text_encoder(ids)[0]).
    """

    config: CLIPTextConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        B, S = input_ids.shape
        tok = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, dtype=self.dtype, name="token_embedding"
        )(input_ids)
        pos_ids = jnp.arange(S)[None, :]
        pos = nn.Embed(
            cfg.max_position_embeddings,
            cfg.hidden_size,
            dtype=self.dtype,
            name="position_embedding",
        )(pos_ids)
        x = tok + pos

        # causal mask, large-negative in fp32
        mask = jnp.triu(jnp.full((S, S), -3.4e38, dtype=jnp.float32), k=1)
        mask = mask[None, None, :, :]

        for i in range(cfg.num_hidden_layers):
            x = CLIPEncoderLayer(cfg, dtype=self.dtype, name=f"layers_{i}")(x, mask)
        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="final_layer_norm"
        )(x)
        return x


def text_encoder_lora_targets(config: CLIPTextConfig) -> List[LoraTarget]:
    """Canonical LoRA target enumeration for the text encoder.

    Order = layer 0..N, within each layer k_proj, v_proj, q_proj, out_proj —
    torch ``named_modules`` order for ``transformers`` CLIPAttention, which is
    what reference ``_find_modules`` yields (lora.py:78-114) and what
    community safetensors indices assume.
    """
    targets = []
    h = config.hidden_size
    for i in range(config.num_hidden_layers):
        for proj in ("k_proj", "v_proj", "q_proj", "out_proj"):
            targets.append(
                LoraTarget(
                    (f"layers_{i}", "self_attn", proj), h, h, "CLIPAttention"
                )
            )
    return targets


def resize_token_embeddings(
    params: dict, new_size: int, rng: Optional[jax.Array] = None
) -> dict:
    """Grow the token embedding matrix (reference: tokenizer.add_tokens +
    text_encoder.resize_token_embeddings, cli_lora_pti.py:70-107).  New rows
    are N(0, 0.02) unless rng is None (zeros)."""
    emb = params["token_embedding"]["embedding"]
    old_size, dim = emb.shape
    if new_size <= old_size:
        return params
    if rng is not None:
        new_rows = 0.02 * jax.random.normal(rng, (new_size - old_size, dim), emb.dtype)
    else:
        new_rows = jnp.zeros((new_size - old_size, dim), emb.dtype)
    new_emb = jnp.concatenate([emb, new_rows], axis=0)
    out = dict(params)
    out["token_embedding"] = {"embedding": new_emb}
    return out


# ---------------------------------------------------------------------------
# HF weight conversion (torch state_dict -> our flax params)
# ---------------------------------------------------------------------------


def params_from_hf_state_dict(state_dict, config: CLIPTextConfig) -> dict:
    """Map a ``transformers`` CLIPTextModel state_dict (numpy-valued) onto our
    param tree.  Linear weights transpose (out,in)->(in,out); embeddings and
    layer norms copy through."""

    def g(key):
        arr = state_dict[key]
        return jnp.asarray(np.asarray(arr, dtype=np.float32))

    prefix = "text_model." if any(k.startswith("text_model.") for k in state_dict) else ""
    p: dict = {
        "token_embedding": {
            "embedding": g(f"{prefix}embeddings.token_embedding.weight")
        },
        "position_embedding": {
            "embedding": g(f"{prefix}embeddings.position_embedding.weight")
        },
        "final_layer_norm": {
            "scale": g(f"{prefix}final_layer_norm.weight"),
            "bias": g(f"{prefix}final_layer_norm.bias"),
        },
    }
    for i in range(config.num_hidden_layers):
        lp = f"{prefix}encoder.layers.{i}."
        layer = {
            "self_attn": {},
            "mlp": {
                "fc1": {
                    "kernel": g(lp + "mlp.fc1.weight").T,
                    "bias": g(lp + "mlp.fc1.bias"),
                },
                "fc2": {
                    "kernel": g(lp + "mlp.fc2.weight").T,
                    "bias": g(lp + "mlp.fc2.bias"),
                },
            },
            "layer_norm1": {
                "scale": g(lp + "layer_norm1.weight"),
                "bias": g(lp + "layer_norm1.bias"),
            },
            "layer_norm2": {
                "scale": g(lp + "layer_norm2.weight"),
                "bias": g(lp + "layer_norm2.bias"),
            },
        }
        for proj in ("k_proj", "v_proj", "q_proj", "out_proj"):
            layer["self_attn"][proj] = {
                "kernel": g(lp + f"self_attn.{proj}.weight").T,
                "bias": g(lp + f"self_attn.{proj}.bias"),
            }
        p[f"layers_{i}"] = layer
    return p
