"""The jitted data-parallel train step.

One compiled function per phase covers what the reference does across
``loss.backward`` / ``optimizer.step`` / grad clipping / TI post-step
constraints (cli_lora_pti.py:291-346, 433-489;
train_lora_dreambooth.py:811-888): compute grads of ``loss_step`` w.r.t. the
trainable trees, apply the multi-group optimizer, then re-apply TI embedding
constraints.  Batches arrive sharded over the mesh's ``data`` axis; XLA
inserts the gradient all-reduce over ICI (the NCCL-DDP replacement).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from .loss import loss_step
from .optim import apply_ti_constraints


def _restore_scale_leaves(new_tree, old_tree):
    """Copy every ``scale`` leaf of LoRA subtrees from old to new."""
    if isinstance(new_tree, dict):
        out = {}
        for k, v in new_tree.items():
            if k == "scale":
                out[k] = old_tree[k]
            else:
                out[k] = _restore_scale_leaves(v, old_tree[k])
        return out
    return new_tree


def _zero_scale_grads(tree):
    """Zero every ``scale`` leaf of a gradient tree.

    The LoRA scale is a runtime knob, not a trainable (reference: a plain
    float constant, lora.py:44).  Its gradient is nonzero (it multiplies the
    whole delta) and must not reach the optimizer: restoring the value
    post-step is not enough — a scale grad would still inflate the
    clip_by_global_norm denominator and silently shrink every real update.
    """
    if isinstance(tree, dict):
        return {
            k: (jnp.zeros_like(v) if k == "scale" else _zero_scale_grads(v))
            for k, v in tree.items()
        }
    return tree


@dataclasses.dataclass
class TrainablePartition:
    """What is being optimized in a phase.

    ``unet_lora`` / ``text_lora`` are LoRA trees (or None); ``ti`` True means
    the text token-embedding matrix trains.  ``ti_constrained`` applies the
    inversion-phase treatment (frozen-row masking + norm decay,
    cli_lora_pti.py:315-346); the tuning phase with ``continue_inversion``
    trains the matrix unconstrained (cli_lora_pti.py:706-723 has no
    post-step restore), so it sets ``ti_constrained=False``.
    """

    unet_lora: bool = True
    text_lora: bool = False
    ti: bool = False
    ti_constrained: bool = True


# Config-keyed process-wide cache of step closures (the analogue of the
# pipeline layer's _SHARED_EXEC_CACHE, pipelines/pipeline.py:44).  A step
# closure is a pure function of: the flax modules (frozen dataclasses,
# equal-by-config), the scheduler config, the optimizer object (equal specs
# return the SAME object via multi_group_optimizer's cache), the partition
# fields, and the scalar knobs.  Returning the same closure for an equal
# key lets jit_train_step / multi_step reuse traced executables across
# trainer invocations in one process — a hyperparameter sweep or a repeat
# phase re-traces (and over a remote-compile TPU tunnel, re-compiles)
# nothing.  Unhashable components (hand-built optimizers, opaque schedule
# callables) silently fall back to a fresh build.
_STEP_CACHE: Dict[Any, Callable] = {}


def build_train_step(
    *,
    unet,
    text_encoder,
    vae,
    scheduler,
    optimizer: optax.GradientTransformation,
    partition: TrainablePartition,
    t_mutliplier: float = 1.0,
    with_prior_preservation: bool = False,
    prior_loss_weight: float = 1.0,
    clip_ti_decay: bool = True,
    ti_lr_schedule: Optional[Callable] = None,
    grad_accum_steps: int = 1,
) -> Callable:
    """Returns ``step(state, batch, rng) -> (state, metrics)`` (jittable).

    ``state`` is a dict:
      params:    {"unet_lora": tree|None, "text_lora": tree|None,
                  "ti_embeddings": (vocab, dim)|None}
      static:    {"unet_params", "text_params", "vae_params",
                  "orig_embeddings", "index_updates"}
      opt_state: optax state
      step:      int32
    """
    if partition.ti and partition.ti_constrained and clip_ti_decay and ti_lr_schedule is None:
        raise ValueError(
            "clip_ti_decay needs ti_lr_schedule (lambda = min(1, 100*lr)); "
            "without it the norm decay would silently be a no-op"
        )
    # snapshot: the closure must not observe later caller mutations
    partition = dataclasses.replace(partition)
    try:
        key = (
            unet, text_encoder, vae,
            type(scheduler).__name__, dataclasses.astuple(scheduler.config),
            optimizer, dataclasses.astuple(partition),
            t_mutliplier, with_prior_preservation, prior_loss_weight,
            clip_ti_decay, ti_lr_schedule, grad_accum_steps,
        )
        hash(key)
    except (TypeError, AttributeError):
        key = None
    if key is not None and key in _STEP_CACHE:
        return _STEP_CACHE[key]
    # bound the pinned-executable footprint: a sweep over many distinct
    # configs evicts oldest entries FIFO (their fused/jit wrappers live in
    # the evicted function's own __dict__, so cyclic GC frees the lot)
    if key is not None and len(_STEP_CACHE) >= 64:
        _STEP_CACHE.pop(next(iter(_STEP_CACHE)))

    def trainable_loss(train_params, static, batch, rng):
        text_params = static["text_params"]
        if partition.ti:
            text_params = {
                **text_params,
                "token_embedding": {"embedding": train_params["ti_embeddings"]},
            }
        loss = loss_step(
            rng,
            batch,
            unet=unet,
            unet_params=static["unet_params"],
            text_encoder=text_encoder,
            text_params=text_params,
            vae=vae,
            vae_params=static["vae_params"],
            scheduler=scheduler,
            unet_lora=train_params.get("unet_lora"),
            text_lora=train_params.get("text_lora"),
            t_mutliplier=t_mutliplier,
            with_prior_preservation=with_prior_preservation,
            prior_loss_weight=prior_loss_weight,
        )
        return loss

    def step(state, batch, rng):
        train_params = state["params"]
        static = state["static"]
        loss, grads = jax.value_and_grad(trainable_loss)(
            train_params, static, batch, rng
        )
        grads = _zero_scale_grads(grads)
        if partition.ti and partition.ti_constrained:
            # frozen vocab rows receive zero gradient (masked-update TI:
            # functional form of the reference's post-step row restoration)
            mask = static["index_updates"][:, None]
            grads = {
                **grads,
                "ti_embeddings": jnp.where(mask, grads["ti_embeddings"], 0.0),
            }
        updates, opt_state = optimizer.update(
            grads, state["opt_state"], train_params
        )
        new_params = optax.apply_updates(train_params, updates)
        # the per-layer LoRA 'scale' leaves are runtime knobs (reference:
        # a fixed constant, lora.py:44), NOT trainables — restore them so
        # neither gradients nor AdamW's decoupled weight decay move them
        train_params = _restore_scale_leaves(new_params, train_params)

        if partition.ti and partition.ti_constrained:
            lr = (
                ti_lr_schedule(state["step"])
                if ti_lr_schedule is not None
                else 0.0
            )
            emb = apply_ti_constraints(
                train_params["ti_embeddings"],
                static["orig_embeddings"],
                static["index_updates"],
                lr,
                clip_ti_decay=clip_ti_decay,
            )
            # the reference renorms/restores only when the optimizer actually
            # stepped, i.e. on gradient-accumulation boundaries
            # (cli_lora_pti.py:311-346)
            if grad_accum_steps > 1:
                boundary = (state["step"] + 1) % grad_accum_steps == 0
                emb = jnp.where(boundary, emb, train_params["ti_embeddings"])
            train_params = {**train_params, "ti_embeddings": emb}

        new_state = {
            **state,
            "params": train_params,
            "opt_state": opt_state,
            "step": state["step"] + 1,
        }
        return new_state, {"loss": loss}

    if key is not None:
        _STEP_CACHE[key] = step
    return step


def _per_fn_cache(fn: Callable, attr: str) -> dict:
    """Per-function memo dict stored ON the function object.

    A module-level ``WeakKeyDictionary[fn] -> closure`` would leak: the
    cached closure strongly references ``fn`` (it calls it), so the weakref
    never dies and evicting ``fn`` from ``_STEP_CACHE`` frees nothing.
    Attaching the cache to ``fn.__dict__`` instead makes the whole chain
    (fn -> cache -> fused closure / jit wrapper -> fn) one reference cycle
    that cyclic GC reclaims as soon as the step function is dropped.
    Callables without a mutable ``__dict__`` fall back to a plain dict keyed
    by id (bounded: only ever holds exotic non-function callables).
    """
    try:
        cache = fn.__dict__.get(attr)
        if cache is None:
            cache = {}
            setattr(fn, attr, cache)
        return cache
    except AttributeError:
        per_obj = _EXOTIC_FN_CACHES.setdefault(id(fn), ({}, fn))
        return per_obj[0].setdefault(attr, {})


# id -> (caches, strong ref); only for callables without __dict__
_EXOTIC_FN_CACHES: Dict[int, Any] = {}


def _check_static_untouched(new_static, static):
    """Trace-time guard: the ``static`` subtree is contractually invariant.

    Both the scan-carry hoist (:func:`multi_step`) and the jit boundary
    split (:func:`jit_train_step`) return the CALLER's static leaves and
    discard whatever the step function produced for them — sound only if
    the step passed them through.  ``build_train_step`` steps always do;
    a custom step that rebuilds a static leaf would otherwise lose its
    update silently, so fail loudly at trace time (leaf identity: a
    pass-through leaf is the very same tracer object).
    """
    try:
        same = jax.tree_util.tree_all(jax.tree_util.tree_map(
            lambda a, b: a is b, new_static, static))
    except ValueError:  # structure changed — definitely modified
        same = False
    if not same:
        raise ValueError(
            "step_fn modified state['static']; the fused/jit train-step "
            "wrappers treat static (frozen model params) as loop-invariant "
            "and would drop the modification. Move mutable values into "
            "state['params'] or another top-level key."
        )


def multi_step(step_fn: Callable, k: int, carry_dtype=None) -> Callable:
    """Fuse ``k`` train steps into ONE dispatch via ``lax.scan``.

    Per-step Python dispatch costs real wall time on remote/tunneled TPU
    runtimes (measured ~18 ms/step vs a 57 ms device step on v5e via the
    axon tunnel — 24% of the step).  Feeding ``k`` prefetched batches
    stacked on a leading axis amortizes that to 1/k.  The returned function
    has signature ``(state, batches, rng) -> (state, metrics)`` where every
    ``batches`` leaf is ``(k, ...)`` and each metrics leaf is stacked
    ``(k,)``; the rng is split per step, so results are identical to ``k``
    sequential ``step_fn`` calls with those keys.

    ``state["static"]`` (the frozen UNet/CLIP/VAE params, ~1.1k leaves at
    SD1.5 size) is hoisted OUT of the scan carry and closure-captured as a
    loop invariant: carried-through frozen buffers otherwise get copied by
    XLA every iteration (measured 3.4 ms/step of pure ``copy`` ops on v5e —
    8% of the device step).  The step function must not modify it
    (trace-time checked).

    Memoized on ``(step_fn, k, carry_dtype)``: repeat wrapping of the same
    step function returns the same closure, so downstream jit caches can hit.

    ``carry_dtype`` is a MEASUREMENT knob (bench_train DFT_BENCH_CARRY_BF16):
    float32 leaves of the scan carry (master LoRA params + optimizer
    moments) are stored between steps at this dtype and upcast to fp32 for
    each update — halving the carry's HBM write/read traffic at the cost of
    rounding master state to bf16 every step.  NOT a production default:
    the trajectory is no longer fp32-master training.  None = exact.
    """
    per_fn = _per_fn_cache(step_fn, "_dft_multi_step_cache")
    memo_key = (k, None if carry_dtype is None else jnp.dtype(carry_dtype).name)
    if memo_key in per_fn:
        return per_fn[memo_key]

    def down(tree):
        if carry_dtype is None:
            return tree
        return jax.tree_util.tree_map(
            lambda x: x.astype(carry_dtype)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, tree)

    def up(tree, like):
        if carry_dtype is None:
            return tree
        return jax.tree_util.tree_map(
            lambda x, ref: x.astype(jnp.float32)
            if hasattr(ref, "dtype") and ref.dtype == jnp.float32 else x,
            tree, like)

    def fused(state, batches, rng):
        keys = jax.random.split(rng, k)
        static = state.get("static") if isinstance(state, dict) else None
        if static is None:
            def body(st, xs):
                b, key = xs
                return step_fn(st, b, key)

            return jax.lax.scan(body, state, (batches, keys))

        full0 = {kk: v for kk, v in state.items() if kk != "static"}
        carry0 = down(full0)

        def body(st, xs):
            b, key = xs
            new, metrics = step_fn(
                dict(up(st, full0), static=static), b, key)
            _check_static_untouched(new.get("static"), static)
            return down(
                {kk: v for kk, v in new.items() if kk != "static"}), metrics

        carry, ms = jax.lax.scan(body, carry0, (batches, keys))
        return dict(up(carry, full0), static=static), ms

    per_fn[memo_key] = fused
    return fused


def stack_batches(batches):
    """Stack a list of host batches along a new leading axis (multi_step
    input)."""
    import numpy as np

    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *batches)


class FusedDispatcher:
    """Drives a train step with ``spd``-step fused dispatch.

    Wraps :func:`multi_step` + :func:`jit_train_step` + batch stacking/mesh
    sharding behind one call so every trainer shares the same loop
    mechanics: full groups go through the fused executable, partial
    (trailing / boundary-clipped) groups fall back to a lazily-compiled
    per-step executable, preserving exact step counts and save cadence.
    """

    def __init__(self, step_fn: Callable, spd: int = 1, mesh=None,
                 state_shardings=None):
        self.spd = max(1, spd)
        self.mesh = mesh
        self._step_fn = step_fn
        self._state_shardings = state_shardings
        self.jitted = jit_train_step(
            step_fn if self.spd == 1 else multi_step(step_fn, self.spd),
            mesh=mesh, state_shardings=state_shardings,
            batch_ndims=1 if self.spd == 1 else 2,
        )
        # group size -> fused executable; a one-off partial group (the run's
        # tail) uses the per-step fallback, but a RECURRING size (e.g. spd
        # clipped by a save boundary every window) gets its own fused
        # executable so fusion never silently degrades to per-step dispatch
        self._fused = {self.spd: self.jitted} if self.spd > 1 else {}
        self._size_seen: Dict[int, int] = {}
        self._tail = self.jitted if self.spd == 1 else None

    def _shard(self, batch, spec=None):
        if self.mesh is None:
            return batch
        from ..parallel import mesh as mesh_lib

        return mesh_lib.shard_batch(batch, self.mesh, spec=spec)

    def _fused_for(self, n: int):
        fn = self._fused.get(n)
        if fn is not None:
            return fn
        self._size_seen[n] = self._size_seen.get(n, 0) + 1
        if self._size_seen[n] < 2:
            return None  # one-off tail: not worth a compile
        # Full-pipeline compiles can cost 10-30 min over a remote-runtime TPU
        # tunnel; a recurring clipped size usually means spd does not divide
        # the save/eval window.  Say so rather than silently stalling.
        print(
            f"FusedDispatcher: compiling a second fused executable for "
            f"recurring group size {n} (spd={self.spd}); pick "
            f"steps_per_dispatch dividing the save/eval window to avoid "
            f"the extra compile"
        )
        fn = jit_train_step(
            multi_step(self._step_fn, n), mesh=self.mesh,
            state_shardings=self._state_shardings, batch_ndims=2,
        )
        self._fused[n] = fn
        return fn

    def prepare(self, group):
        """Start the host→device move of a full group NOW, overlapping the
        in-flight dispatch — the trainer analogue of the serving worker's
        dispatch-behind-fetch (`serving.py:_loop`).  Returns an opaque
        token for ``run(..., prepared=...)``; ``None`` for groups that
        would take the per-step fallback (prepare never compiles).

        Trainers call this for group i+1 right after dispatching group i:
        the stack/shard/transfer host work (the dominant per-dispatch host
        cost over a tunneled runtime) then hides under group i's device
        time instead of sitting on the critical path."""
        from jax.sharding import PartitionSpec as P

        n = len(group)
        if self.spd == 1 or n <= 1 or n not in self._fused:
            return None
        batches = stack_batches(group)
        if self.mesh is not None:
            batches = self._shard(batches, spec=P(None, "data"))
        else:
            # async device_put: returns immediately, transfer in flight
            batches = jax.device_put(batches)
        return (n, batches)

    def drive(self, state, rng, take_group, total_steps, start_step=0):
        """Pipelined fused-dispatch loop — the ONE loop driver all trainers
        share (see CLAUDE.md: extend FusedDispatcher, don't fork per-trainer
        loop mechanics).

        ``take_group(global_step) -> list[batch]`` supplies each group
        (trainers encode their boundary policy there: save-window clipping,
        epoch streaming, stream exhaustion).  Yields
        ``(state, losses, stepped, global_step)`` after each dispatch,
        having ALREADY staged group i+1's host→device transfer via
        :meth:`prepare` — so the trainer's per-iteration logging/saving
        (blocking host work) hides under group i+1's device time.  The
        trainer keeps the last yielded ``state``."""
        gs = start_step
        group = take_group(gs)
        prepared = self.prepare(group)
        while gs < total_steps and group:
            rng, key = jax.random.split(rng)
            state, losses = self.run(state, group, key, prepared=prepared)
            stepped = len(group)
            gs += stepped
            # stage group i+1's transfer BEFORE the caller's blocking
            # logging/saves run in the yield body
            if gs < total_steps:
                nxt = take_group(gs)
                prepared = self.prepare(nxt)
            else:
                nxt = []
            yield state, losses, stepped, gs
            group = nxt

    def run(self, state, group, rng, prepared=None):
        """Run ``len(group)`` (<= spd) steps; returns (state, losses (n,)).

        ``prepared`` (from :meth:`prepare` on the SAME group) skips the
        stack/shard/transfer — the arrays are already on device."""
        from jax.sharding import PartitionSpec as P

        n = len(group)
        if self.spd == 1:
            state, metrics = self.jitted(state, self._shard(group[0]), rng)
            return state, metrics["loss"][None]
        fn = self._fused_for(n) if n > 1 else None
        if fn is not None:
            if prepared is not None and prepared[0] == n:
                batches = prepared[1]
            else:
                batches = stack_batches(group)
                batches = self._shard(batches, spec=P(None, "data"))
            state, metrics = fn(state, batches, rng)
            return state, metrics["loss"]
        if self._tail is None:
            self._tail = jit_train_step(
                self._step_fn, mesh=self.mesh,
                state_shardings=self._state_shardings,
            )
        # derive keys exactly like multi_step's scan does, so a group is
        # bit-identical whether it runs fused or through this fallback
        keys = jax.random.split(rng, n)
        losses = []
        for batch, sub in zip(group, keys):
            state, metrics = self._tail(state, self._shard(batch), sub)
            losses.append(metrics["loss"])
        return state, jnp.stack(losses)


def jit_train_step(step_fn: Callable, mesh=None, donate: bool = False,
                   state_shardings=None, batch_ndims: int = 1):
    # donate=True invalidates the caller's trainable-state buffers (params/
    # opt_state); the frozen model params in state["static"] are never
    # donated — they cross the jit boundary as a separate argument and are
    # never returned (see below), so pipelines sharing them stay valid.
    """jit with replicated-state / data-sharded-batch shardings.

    ``state["static"]`` (frozen UNet/CLIP/VAE params) is split off OUTSIDE
    the jit and passed as its own argument that the compiled function does
    NOT return: an un-donated pass-through output would cost a device-side
    copy of every frozen buffer per dispatch (measured 16 ms per 10-step
    dispatch on v5e) plus host pytree churn on ~1.1k leaves.  The wrapper
    re-attaches the caller's own static dict to the returned state, so the
    public contract ``(state, batch, rng) -> (state, metrics)`` is
    unchanged.  Step functions must treat static as read-only (trace-time
    checked); states without a ``"static"`` key take the plain path.

    ``state_shardings`` overrides the state's sharding pytree — pass
    ``{"static": mesh_lib.fsdp_shardings(mesh, static), ...}`` to keep the
    frozen model params ZeRO-3-sharded over an ``fsdp`` mesh axis (XLA
    all-gathers them at use sites).  ``batch_ndims=2`` marks a multi_step
    batch (leading steps axis, batch axis second) so the data axis shards
    dim 1, not the steps dim.

    Memoized on ``(step_fn, mesh, donate, batch_ndims)`` when no sharding
    override is given: re-jitting the same step function returns the same
    wrapper, whose traces/executables jax then reuses.
    """
    cache = None
    if state_shardings is None:
        cache = _per_fn_cache(step_fn, "_dft_jit_cache")
        ckey = (mesh, donate, batch_ndims)
        if ckey in cache:
            return cache[ckey]

    def inner(inner_state, static, batch, rng):
        state = dict(inner_state, static=static) if static is not None \
            else inner_state
        new, metrics = step_fn(state, batch, rng)
        if static is not None:
            _check_static_untouched(new.get("static"), static)
            new = {kk: v for kk, v in new.items() if kk != "static"}
        return new, metrics

    if mesh is None:
        jitted = jax.jit(inner, donate_argnums=(0,) if donate else ())
    else:
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(mesh, P())
        data = NamedSharding(
            mesh, P(*([None] * (batch_ndims - 1) + ["data"])))
        if state_shardings is None:
            inner_in = static_in = rep
        else:
            inner_in = {kk: v for kk, v in state_shardings.items()
                        if kk != "static"}
            static_in = state_shardings.get("static", rep)
        jitted = jax.jit(
            inner,
            in_shardings=(inner_in, static_in, data, rep),
            out_shardings=(inner_in, rep),
            donate_argnums=(0,) if donate else (),
        )

    def wrapper(state, batch, rng):
        if isinstance(state, dict) and "static" in state:
            static = state["static"]
            rest = {kk: v for kk, v in state.items() if kk != "static"}
            new, metrics = jitted(rest, static, batch, rng)
            return dict(new, static=static), metrics
        new, metrics = jitted(state, None, batch, rng)
        return new, metrics

    def aot_compile(state, batch, rng):
        """AOT trace+compile WITHOUT executing; returns a runner with the
        same ``(state, batch, rng) -> (state, metrics)`` contract bound to
        the compiled executable.  Multi-process callers compile first, sync
        at a coordination barrier, then run — the Gloo rendezvous of the
        first collective dispatch has a ~30 s key-value deadline that a
        peer process still busy tracing/compiling would blow."""
        has_static = isinstance(state, dict) and "static" in state
        if has_static:
            rest = {kk: v for kk, v in state.items() if kk != "static"}
            compiled = jitted.lower(rest, state["static"], batch, rng).compile()
        else:
            compiled = jitted.lower(state, None, batch, rng).compile()

        def run(state, batch, rng):
            if has_static:
                static = state["static"]
                rest = {kk: v for kk, v in state.items() if kk != "static"}
                new, metrics = compiled(rest, static, batch, rng)
                return dict(new, static=static), metrics
            new, metrics = compiled(state, None, batch, rng)
            return new, metrics

        return run

    wrapper.aot_compile = aot_compile
    out = wrapper
    if cache is not None:
        cache[ckey] = out
    return out
