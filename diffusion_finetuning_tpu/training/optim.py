"""Optimizers and LR schedules for LoRA/TI training.

Covers the reference's optimizer surface: AdamW with per-group learning
rates (UNet LoRA / text-encoder LoRA / TI embeddings,
train_lora_dreambooth.py:659-669, cli_lora_pti.py:700-738), the
``get_scheduler`` LR schedule names (constant / constant_with_warmup /
linear / cosine, train_lora_dreambooth.py:737-742), gradient accumulation
(optax.MultiSteps), global-norm clipping (cli_lora_pti.py:452-457), and an
int8 optimizer-state mode standing in for bitsandbytes AdamW8bit
(train_lora_dreambooth.py:641-651) implemented as a block-quantized moment
store.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import optax


def lr_schedule(
    name: str,
    learning_rate: float,
    num_warmup_steps: int = 0,
    num_training_steps: int = 10000,
) -> optax.Schedule:
    """HF diffusers get_scheduler parity for the names the reference uses.

    Memoized on its (all-scalar) arguments: equal specs return the *same*
    callable, which keeps schedule identity stable so downstream
    config-keyed executable caches (see ``build_train_step``) can hit.
    """
    key = (name.lower(), learning_rate, num_warmup_steps, num_training_steps)
    hit = _LR_SCHEDULE_CACHE.get(key)
    if hit is None:
        hit = _LR_SCHEDULE_CACHE[key] = _lr_schedule_uncached(*key)
    return hit


_LR_SCHEDULE_CACHE: Dict[Any, optax.Schedule] = {}


def _lr_schedule_uncached(
    name: str,
    learning_rate: float,
    num_warmup_steps: int = 0,
    num_training_steps: int = 10000,
) -> optax.Schedule:
    if name == "constant":
        return optax.constant_schedule(learning_rate)
    if name == "constant_with_warmup":
        return optax.join_schedules(
            [
                optax.linear_schedule(0.0, learning_rate, max(1, num_warmup_steps)),
                optax.constant_schedule(learning_rate),
            ],
            [num_warmup_steps],
        )
    if name == "linear":
        return optax.join_schedules(
            [
                optax.linear_schedule(0.0, learning_rate, max(1, num_warmup_steps)),
                optax.linear_schedule(
                    learning_rate, 0.0, max(1, num_training_steps - num_warmup_steps)
                ),
            ],
            [num_warmup_steps],
        )
    if name == "cosine":
        return optax.join_schedules(
            [
                optax.linear_schedule(0.0, learning_rate, max(1, num_warmup_steps)),
                optax.cosine_decay_schedule(
                    learning_rate, max(1, num_training_steps - num_warmup_steps)
                ),
            ],
            [num_warmup_steps],
        )
    raise ValueError(f"unknown lr schedule {name}")


@dataclasses.dataclass(frozen=True)
class StepGate:
    """Declarative 0/1 LR gate on the step counter.

    Evaluates to 1.0 when ``(count >= threshold) == on_after`` — the staged
    TI-then-LoRA schedule of the reference (train_lora_w_ti.py:988-994:
    LoRA groups gated on after ``unfreeze_lora_step``, TI gated off).
    Being a frozen dataclass it is hashable, so optimizers built from it
    participate in the config-keyed executable caches.
    """

    threshold: int
    on_after: bool = True

    def __call__(self, count):
        cond = count >= self.threshold
        if not self.on_after:
            cond = ~cond if hasattr(cond, "dtype") else (not cond)
        if hasattr(cond, "astype"):
            return cond.astype(jnp.float32)
        return float(cond)


@dataclasses.dataclass
class ParamGroup:
    """One optimizer parameter group (reference per-group dict entries)."""

    lr: float
    schedule: str = "constant"
    warmup_steps: int = 0
    total_steps: int = 10000
    weight_decay: float = 1e-2
    betas: tuple = (0.9, 0.999)
    eps: float = 1e-8
    # The reference steps its LR scheduler once per *batch* even under
    # gradient accumulation (cli_lora_pti.py:296); with optax.MultiSteps the
    # inner optimizer only sees one count per accumulated update, so the
    # schedule is evaluated at ``count * step_multiplier`` to keep the same
    # per-batch LR trajectory.
    step_multiplier: int = 1
    # multiplied pointwise onto the schedule — used for the staged
    # TI-then-LoRA gating of train_lora_w_ti.py:988-994 (group LRs forced to
    # 0 before/after ``unfreeze_lora_step``)
    lr_gate: Optional[Any] = None  # Callable[[count], float 0/1]

    def cache_key(self):
        """Hashable identity tuple (raises TypeError for opaque lr_gate
        callables — callers treat that as 'not cacheable')."""
        gate = self.lr_gate
        if gate is not None and not isinstance(gate, StepGate):
            raise TypeError("opaque lr_gate callable is not cacheable")
        key = (self.lr, self.schedule, self.warmup_steps, self.total_steps,
               self.weight_decay, tuple(self.betas), self.eps,
               self.step_multiplier, gate)
        hash(key)
        return key

    def make(self, use_8bit: bool = False) -> optax.GradientTransformation:
        base = lr_schedule(self.schedule, self.lr, self.warmup_steps, self.total_steps)
        mult = self.step_multiplier
        gate = self.lr_gate

        def sched(count):
            c = count * mult
            lr = base(c)
            if gate is not None:
                lr = lr * gate(c)
            return lr
        if use_8bit:
            return adamw8bit(
                sched, b1=self.betas[0], b2=self.betas[1], eps=self.eps,
                weight_decay=self.weight_decay,
            )
        return optax.adamw(
            sched, b1=self.betas[0], b2=self.betas[1], eps=self.eps,
            weight_decay=self.weight_decay,
        )


def _runtime_lr_scale():
    """Multiply the group's final update by a state-carried scalar.

    The scalar is a *runtime* value (an opt_state leaf, not a trace
    constant): sweeping it with :func:`set_lr_scale` never re-traces or
    re-compiles the train step — one executable serves a whole LR sweep,
    where a trace constant would cost a fresh full-pipeline compile
    (10-30 min over a remote-runtime TPU tunnel) per sweep point.
    Scaling the post-AdamW update is exactly scaling the learning rate
    (decoupled weight decay is lr-coupled in AdamW, torch and optax both).
    """

    def init(params):
        del params
        return {"lr_scale": jnp.ones((), jnp.float32)}

    def update(updates, state, params=None):
        del params
        s = state["lr_scale"]
        return jax.tree_util.tree_map(lambda u: u * s, updates), state

    return optax.GradientTransformation(init, update)


def set_lr_scale(opt_state, group: str, value: float):
    """Functionally set a group's runtime LR scale inside an opt_state.

    Requires the optimizer to have been built with
    ``multi_group_optimizer(..., runtime_lr_scale=True)``.  Returns a new
    opt_state pytree; pass it back into the (unchanged, already-compiled)
    train step.
    """
    from jax.tree_util import DictKey, tree_flatten_with_path, tree_unflatten

    leaves_with_paths, treedef = tree_flatten_with_path(opt_state)
    found = False
    out = []
    for path, leaf in leaves_with_paths:
        keys = [k.key for k in path if isinstance(k, DictKey)]
        if "lr_scale" in keys and group in keys:
            leaf = jnp.asarray(value, jnp.float32)
            found = True
        out.append(leaf)
    if not found:
        raise ValueError(
            f"no runtime lr_scale state for group {group!r} — build the "
            "optimizer with multi_group_optimizer(..., runtime_lr_scale=True)"
        )
    return tree_unflatten(treedef, out)


def _identity_labels(tree):
    """Label every leaf under each top-level subtree with that subtree's
    name — the routing every trainer uses (torch param-group dicts keyed by
    unet_lora / text_lora / ti_embeddings)."""
    return {k: jax.tree_util.tree_map(lambda _: k, v) for k, v in tree.items()}


_OPTIMIZER_CACHE: Dict[Any, optax.GradientTransformation] = {}


def multi_group_optimizer(
    groups: Mapping[str, ParamGroup],
    param_labels: Any = None,
    grad_accum_steps: int = 1,
    max_grad_norm: Optional[float] = None,
    use_8bit: bool = False,
    runtime_lr_scale: bool = False,
) -> optax.GradientTransformation:
    """Build the reference's multi-LR optimizer as one optax transform.

    ``param_labels``: pytree (or callable) labelling each leaf with a group
    name.  Mirrors torch param-group dicts (train_lora_dreambooth.py:659-669).
    ``None`` (the default, and what every trainer wants) labels each
    top-level subtree with its own name.

    With default labeling and declarative groups (scalar hyperparams,
    ``StepGate`` gates), equal specs return the *same* transform object, so
    ``build_train_step``'s config-keyed cache can reuse traced/compiled
    train-step executables across trainer invocations in one process —
    repeat runs and hyperparameter sweeps re-trace nothing that matches.
    """
    key = None
    if param_labels is None:
        try:
            key = (tuple(sorted((n, g.cache_key()) for n, g in groups.items())),
                   grad_accum_steps, max_grad_norm, use_8bit, runtime_lr_scale)
            hit = _OPTIMIZER_CACHE.get(key)
            if hit is not None:
                return hit
        except TypeError:
            key = None
        param_labels = _identity_labels

    def make(g):
        tx = g.make(use_8bit)
        if runtime_lr_scale:
            # per-group state-carried scalar, swept via set_lr_scale with
            # NO recompile (``runtime_lr_scale=True`` + set_lr_scale)
            tx = optax.chain(tx, _runtime_lr_scale())
        return tx

    tx = optax.multi_transform(
        {name: make(g) for name, g in groups.items()}, param_labels
    )
    chain = []
    if max_grad_norm is not None:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(tx)
    out = optax.chain(*chain)
    if grad_accum_steps > 1:
        out = optax.MultiSteps(out, every_k_schedule=grad_accum_steps)
    if key is not None:
        _OPTIMIZER_CACHE[key] = out
    return out


# ---------------------------------------------------------------------------
# 8-bit AdamW (bitsandbytes stand-in): block-quantized int8 moments
# ---------------------------------------------------------------------------


def _quantize_blockwise(x: jnp.ndarray, block: int = 256):
    flat = x.reshape(-1)
    pad = (-flat.size) % block
    flat = jnp.pad(flat, (0, pad))
    blocks = flat.reshape(-1, block)
    scale = jnp.max(jnp.abs(blocks), axis=1, keepdims=True) / 127.0
    scale = jnp.where(scale == 0, 1.0, scale)
    q = jnp.clip(jnp.round(blocks / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def _dequantize_blockwise(q: jnp.ndarray, scale: jnp.ndarray, shape, size):
    flat = (q.astype(jnp.float32) * scale).reshape(-1)[:size]
    return flat.reshape(shape)


def adamw8bit(
    learning_rate, b1=0.9, b2=0.999, eps=1e-8, weight_decay=1e-2, block=256
) -> optax.GradientTransformation:
    """AdamW with int8 block-quantized first/second moments.

    TPU-native equivalent of bitsandbytes AdamW8bit
    (train_lora_dreambooth.py:641-651): moments are stored as int8 + per-block
    fp32 scales (~4x state memory reduction), dequantized/requantized inside
    the (jitted, fused) update.
    """

    def init(params):
        def per_leaf(p):
            q, s = _quantize_blockwise(jnp.zeros_like(p, dtype=jnp.float32), block)
            return {"m_q": q, "m_s": s, "v_q": q, "v_s": s}

        return {
            "count": jnp.zeros([], jnp.int32),
            "moments": jax.tree_util.tree_map(per_leaf, params),
        }

    def update(grads, state, params):
        count = state["count"] + 1
        # schedule evaluated at the PRE-increment count, matching
        # optax.adamw (first update uses lr(0) — diffusers LambdaLR step-0
        # semantics); bias correction still uses the post-increment count
        sched_lr = (learning_rate(state["count"])
                    if callable(learning_rate) else learning_rate)

        def per_leaf(g, st, p):
            g = g.astype(jnp.float32)
            m = _dequantize_blockwise(st["m_q"], st["m_s"], g.shape, g.size)
            # v is stored in sqrt domain: linear int8 on sqrt(v) keeps small
            # second moments representable (floor (max/127)^2 of the block
            # max instead of max/127 — the role bitsandbytes' nonlinear
            # dynamic map plays); quantizing v linearly zeroes small entries
            # and explodes their effective LR
            v = _dequantize_blockwise(st["v_q"], st["v_s"], g.shape, g.size) ** 2
            m = b1 * m + (1 - b1) * g
            v = b2 * v + (1 - b2) * g * g
            mhat = m / (1 - b1 ** count.astype(jnp.float32))
            vhat = v / (1 - b2 ** count.astype(jnp.float32))
            upd = -sched_lr * (mhat / (jnp.sqrt(vhat) + eps) + weight_decay * p)
            mq, ms = _quantize_blockwise(m, block)
            vq, vs = _quantize_blockwise(jnp.sqrt(v), block)
            return upd.astype(p.dtype), {"m_q": mq, "m_s": ms, "v_q": vq, "v_s": vs}

        flat_g, treedef = jax.tree_util.tree_flatten(grads)
        flat_s = treedef.flatten_up_to(state["moments"])
        flat_p = treedef.flatten_up_to(params)
        outs = [per_leaf(g, s, p) for g, s, p in zip(flat_g, flat_s, flat_p)]
        updates = treedef.unflatten([o[0] for o in outs])
        moments = treedef.unflatten([o[1] for o in outs])
        return updates, {"count": count, "moments": moments}

    return optax.GradientTransformation(init, update)


# ---------------------------------------------------------------------------
# TI embedding constraints (reference cli_lora_pti.py:315-346)
# ---------------------------------------------------------------------------


def apply_ti_constraints(
    embeddings: jnp.ndarray,
    orig_embeddings: jnp.ndarray,
    index_updates: jnp.ndarray,   # bool (vocab,) True for placeholder rows
    lr: float,
    clip_ti_decay: bool = True,
    target_norm: float = 0.4,
) -> jnp.ndarray:
    """Post-step TI embedding treatment:

    * if ``clip_ti_decay``: renormalize updated rows to
      ``pre_norm + min(1, 100*lr) * (0.4 - pre_norm)`` (cli_lora_pti.py:318-336)
    * restore all frozen rows from the pre-training copy
      (cli_lora_pti.py:344-346)
    """
    emb = embeddings
    if clip_ti_decay:
        norms = jnp.linalg.norm(emb, axis=-1, keepdims=True)
        lam = jnp.minimum(1.0, 100.0 * lr)
        safe = jnp.where(norms == 0, 1.0, norms)
        renormed = emb / safe * (norms + lam * (target_norm - norms))
        emb = jnp.where(index_updates[:, None], renormed, emb)
    emb = jnp.where(index_updates[:, None], emb, orig_embeddings)
    return emb
