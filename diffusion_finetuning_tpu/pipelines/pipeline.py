"""Stable Diffusion txt2img / img2img pipeline, jit-compiled denoise loop.

Replaces ``diffusers.StableDiffusionPipeline`` for everything the reference
uses it for: inference with LoRA patching (``patch_pipe`` + ``pipe(prompt)``,
reference: lora_diffusion/utils.py:191-211 and the notebooks), class-image
synthesis during DreamBooth prior preservation
(train_lora_dreambooth.py:512-558), and img2img
(scripts/run_img2img.ipynb).

TPU design: the entire CFG denoise loop is one ``jax.jit`` containing a
``lax.scan`` over timesteps — one compilation per (resolution, step count,
scheduler) combination; LoRA trees and the guidance scale are runtime
arguments, so ``tune_lora_scale`` sweeps and re-patching never recompile.
"""

from __future__ import annotations

import threading
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .. import lora as lora_lib
from ..models import hf_loading
from ..models.clip_text import (
    CLIPTextConfig,
    CLIPTextModel,
    resize_token_embeddings,
    text_encoder_lora_targets,
)
from ..models.schedulers import DDIMScheduler, PNDMScheduler, SchedulerConfig
from ..models.unet import UNet2DConditionModel, UNetConfig
from ..models.vae import SCALING_FACTOR, AutoencoderKL, VAEConfig
from ..data.tokenizer import CLIPTokenizer

import os as _os

# denoise-scan unroll factor (perf knob; >1 trades compile time / code size
# for cross-step fusion opportunities)
_SCAN_UNROLL = int(_os.environ.get("DFT_SCAN_UNROLL", "1"))

# process-wide executable cache: see StableDiffusionPipeline._cached
_SHARED_EXEC_CACHE: dict = {}

# fold LoRA deltas into the kernels for generation (see
# StableDiffusionPipeline.materialize_lora); 0 forces the dynamic path
MATERIALIZE_LORA_DEFAULT = bool(int(_os.environ.get("DFT_MATERIALIZE_LORA", "1")))

# max distinct merged-LoRA param trees kept on device (multi-tenant serving
# alternates adapters per batch; each merged SD1.5 UNet is ~1.7 GB bf16)
MERGED_LORA_CACHE_SIZE = max(
    1, int(_os.environ.get("DFT_MERGED_LORA_CACHE", "8")))


def apply_learned_embed_in_clip(
    learned_embeds: Dict[str, np.ndarray],
    text_params: dict,
    tokenizer: CLIPTokenizer,
    token: Optional[Union[str, List[str]]] = None,
    idempotent: bool = False,
) -> Tuple[dict, Union[str, List[str]]]:
    """Add TI tokens to the tokenizer and write their embedding rows.

    Functional version of reference lora.py:613-656 including the
    collision-rename loop (``token[:-1]-i>``) when not idempotent.  Returns
    (new_text_params, final token names).
    """
    if isinstance(token, str):
        trained_tokens = [token]
    elif isinstance(token, list):
        assert len(learned_embeds.keys()) == len(token), (
            "The number of tokens and the number of embeds should be the same"
        )
        trained_tokens = token
    else:
        trained_tokens = list(learned_embeds.keys())

    final_tokens = []
    for tok, embeds in zip(trained_tokens, [learned_embeds[t] for t in trained_tokens]):
        num_added = tokenizer.add_tokens(tok)
        i = 1
        if not idempotent:
            while num_added == 0:
                print(f"The tokenizer already contains the token {tok}.")
                tok = f"{tok[:-1]}-{i}>"
                print(f"Attempting to add the token {tok}.")
                num_added = tokenizer.add_tokens(tok)
                i += 1
        elif num_added == 0 and idempotent:
            print(f"The tokenizer already contains the token {tok}.")
            print(f"Replacing {tok} embedding.")

        text_params = resize_token_embeddings(text_params, len(tokenizer))
        token_id = tokenizer.convert_tokens_to_ids(tok)
        emb = text_params["token_embedding"]["embedding"]
        emb = emb.at[token_id].set(jnp.asarray(np.asarray(embeds, np.float32)))
        text_params = {**text_params, "token_embedding": {"embedding": emb}}
        final_tokens.append(tok)
    return text_params, (final_tokens[0] if len(final_tokens) == 1 else final_tokens)


def load_learned_embed_in_clip(
    learned_embeds_path: str,
    text_params: dict,
    tokenizer: CLIPTokenizer,
    token: Optional[Union[str, List[str]]] = None,
    idempotent: bool = False,
):
    from ..io import torch_pickle

    learned_embeds = torch_pickle.load(learned_embeds_path)
    return apply_learned_embed_in_clip(
        learned_embeds, text_params, tokenizer, token, idempotent
    )


class StableDiffusionPipeline:
    """Bundles unet/vae/text-encoder modules + params + tokenizer + scheduler.

    Mutable LoRA state (``unet_lora`` / ``text_encoder_lora``) mirrors the
    reference's in-place monkeypatching workflow: ``patch_pipe`` swaps the
    trees, ``tune_lora_scale`` retunes them, generation picks them up — all
    without touching the jit cache.
    """

    def __init__(
        self,
        unet_config: UNetConfig,
        unet_params: dict,
        vae_config: VAEConfig,
        vae_params: dict,
        text_config: CLIPTextConfig,
        text_params: dict,
        tokenizer: CLIPTokenizer,
        scheduler_config: Optional[SchedulerConfig] = None,
        dtype: Any = jnp.float32,
    ):
        self.dtype = dtype
        self.unet_config = unet_config
        self.unet = UNet2DConditionModel(unet_config, dtype=dtype)
        self.unet_params = unet_params
        self.vae_config = vae_config
        self.vae = AutoencoderKL(vae_config, dtype=dtype)
        self.vae_params = vae_params
        self.text_config = text_config
        self.text_encoder = CLIPTextModel(text_config, dtype=dtype)
        self.text_params = text_params
        self.tokenizer = tokenizer
        self.scheduler_config = scheduler_config or SchedulerConfig()
        self.unet_lora: Optional[dict] = None
        self.text_encoder_lora: Optional[dict] = None
        # Serving-mode LoRA materialization: fold ``scale * up @ down`` into
        # the kernels once per LoRA/scale change (a ms-scale jitted merge)
        # and generate with the merged tree.  Rank-r per-step matmuls are
        # MXU-hostile (r of 128 lanes) — dynamic LoRA costs ~33 ms per
        # 50-step 512^2 image at rank 4 on v5e.  Patched pipelines also
        # reuse the plain no-LoRA executable, so loading a LoRA never
        # triggers a pipeline recompile.  The ``unet_lora`` /
        # ``text_encoder_lora`` trees stay pristine (save/extract/inspect
        # and trainers see reference semantics); set False to force the
        # dynamic path (e.g. to share an executable with a training loop).
        self.materialize_lora: bool = MATERIALIZE_LORA_DEFAULT
        self._merged_cache: dict = {}
        self._merged_current: dict = {}
        # Multi-chip data-parallel generation: when set (via shard_over), the
        # denoise jit shards the request batch over the mesh's ``data`` axis
        # and replicates params — XLA places per-chip UNet work and the ICI
        # transfers; one __call__ drives every chip.
        self.mesh = None
        # Serializes LoRA/TI hot-swaps against concurrent generation: writers
        # (patch_pipe, tune_lora_scale_pipe) and the snapshot reader
        # (_generation_params) hold this, so a GenerationServer batch always
        # sees one consistent (params, lora) tree set — never e.g. a new UNet
        # LoRA paired with stale text params.
        self._swap_lock = threading.RLock()

    @property
    def text_params(self):
        return self._text_params

    @text_params.setter
    def text_params(self, params):
        """Keep the text-encoder module in sync with the embedding table.

        TI flows grow the token-embedding rows past ``config.vocab_size``
        (``resize_token_embeddings`` — reference cli_lora_pti.py:70-107);
        flax validates param shapes against the module config on every
        apply, so a stale ``vocab_size`` would raise ScopeParamShapeError
        at encode time on a real checkpoint (whose table is sized exactly
        to the vocabulary — the tiny test configs have slack rows, which
        is why only real-weight runs would hit it).  Swapping the config
        also rotates the executable-cache key (``_exec_cache_key``), so
        stale-vocab executables are never reused."""
        import dataclasses as _dc

        try:
            rows = params["token_embedding"]["embedding"].shape[0]
        except (TypeError, KeyError):
            rows = None
        if rows is not None and rows != self.text_config.vocab_size:
            self.text_config = _dc.replace(self.text_config, vocab_size=rows)
            self.text_encoder = CLIPTextModel(self.text_config,
                                              dtype=self.dtype)
        self._text_params = params

    @property
    def vae_scale_factor(self) -> int:
        """Spatial downscale between images and latents (8 for SD)."""
        return 2 ** (len(self.vae_config.block_out_channels) - 1)

    def cast_params(self, params_dtype: Any) -> "StableDiffusionPipeline":
        """Cast stored float params (and LoRA trees) to ``params_dtype``.

        Inference-only memory/bandwidth optimization: with ``dtype=bfloat16``
        the models cast weights to bf16 at compute time anyway, so storing
        them in fp32 just doubles the HBM param traffic of every UNet step.
        Casting storage to the compute dtype is numerically identical for
        the forward pass.  Do NOT use on a pipeline whose params are shared
        with a trainer — training wants fp32 master weights (the trainers
        keep their own fp32 state; this only affects pipeline storage).
        Returns self for chaining.
        """
        def cast(tree):
            if tree is None:
                return None
            return jax.tree_util.tree_map(
                lambda x: x.astype(params_dtype)
                if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
                else x,
                tree,
            )

        self.unet_params = cast(self.unet_params)
        self.vae_params = cast(self.vae_params)
        self.text_params = cast(self.text_params)
        self.unet_lora = cast(self.unet_lora)
        self.text_encoder_lora = cast(self.text_encoder_lora)
        self._merged_cache.clear()
        self._merged_current.clear()
        return self

    # -- reference-compat model addressing ---------------------------------
    def lora_targets(self, name: str, target_replace: set) -> list:
        if name == "unet":
            from ..models.unet import unet_all_lora_targets

            # linear targets in canonical order, conv-extension targets after
            return lora_lib.filter_targets(
                unet_all_lora_targets(self.unet_config), target_replace
            )
        if name == "text_encoder":
            return lora_lib.filter_targets(
                text_encoder_lora_targets(self.text_config), target_replace
            )
        raise KeyError(name)

    @classmethod
    def from_pretrained(
        cls, model_dir: str, dtype: Any = jnp.float32,
        params_dtype: Optional[Any] = None,
    ) -> "StableDiffusionPipeline":
        """``params_dtype``: optional storage dtype for the loaded weights
        (e.g. ``jnp.bfloat16`` for serving — halves HBM param traffic; see
        :meth:`cast_params`).  ``None`` keeps them as loaded (fp32)."""
        comps = hf_loading.load_pipeline_components(model_dir)
        import os

        tokenizer = CLIPTokenizer.from_pretrained(os.path.join(model_dir, "tokenizer"))
        sc = comps["scheduler_config"]
        sched = SchedulerConfig(
            num_train_timesteps=sc.get("num_train_timesteps", 1000),
            beta_start=sc.get("beta_start", 0.00085),
            beta_end=sc.get("beta_end", 0.012),
            beta_schedule=sc.get("beta_schedule", "scaled_linear"),
            prediction_type=sc.get("prediction_type", "epsilon"),
            steps_offset=sc.get("steps_offset", 1),
            set_alpha_to_one=sc.get("set_alpha_to_one", False),
        )
        pipe = cls(
            comps["unet_config"], comps["unet_params"],
            comps["vae_config"], comps["vae_params"],
            comps["text_config"], comps["text_params"],
            tokenizer, sched, dtype=dtype,
        )
        if params_dtype is not None:
            pipe.cast_params(params_dtype)
        return pipe

    # -- shared jit cache ----------------------------------------------------
    # Every builder closes only over flax modules (pure functions of the
    # frozen configs + dtype), the scheduler config, and the mesh — never
    # over params or LoRA trees (those are runtime args).  Executables are
    # therefore shared process-wide, keyed on those inputs: a second
    # pipeline with the same configs re-traces nothing.  (NOT
    # functools.lru_cache on methods: that stores `self` in class-level
    # state and pins multi-GB param trees after the pipeline is discarded.)
    def _exec_cache_key(self):
        return (self.unet_config, self.vae_config, self.text_config,
                self.scheduler_config, self.dtype, self.mesh)

    def _cached(self, key, builder):
        try:
            full = (self._exec_cache_key(), key)
            hash(full)
        except TypeError:  # unhashable component: fall back to per-instance
            cache = self.__dict__.setdefault("_fn_cache", {})
            if key not in cache:
                cache[key] = builder()
            return cache[key]
        hit = _SHARED_EXEC_CACHE.get(full)
        if hit is None:
            # bound the pinned-executable footprint (same policy as the
            # train-step cache): a service sweeping many distinct
            # (steps, size, batch, scheduler) combinations evicts oldest
            # entries FIFO instead of pinning every executable for the
            # process lifetime.  In-flight callers hold their own reference.
            if len(_SHARED_EXEC_CACHE) >= 64:
                _SHARED_EXEC_CACHE.pop(next(iter(_SHARED_EXEC_CACHE)))
            hit = _SHARED_EXEC_CACHE[full] = builder()
        return hit

    # -- multi-chip parallelism ---------------------------------------------
    def shard_over(self, mesh) -> "StableDiffusionPipeline":
        """Distribute generation over a device mesh.

        A ``data`` mesh axis shards the batch (data-parallel serving); a
        ``tp`` axis additionally splits every UNet attention/MLP projection
        Megatron-style (:func:`parallel.mesh.tp_shardings`) so one image's
        denoise runs across ``tp`` chips — the latency lever once a single
        chip is the bottleneck.  Params transfer once now, not per call;
        generation batches must be a multiple of the ``data`` axis size.
        The reference has no multi-device inference story
        (cli_lora_pti.py:539 pins cuda:0; Accelerate wraps training only) —
        this is the TPU-native scale-out: mesh + sharding annotations, XLA
        emits the distribution and the per-sub-block all-reduces.  Pass
        ``mesh=None`` to return to single-device dispatch.  Returns self.
        """
        from ..parallel import mesh as mesh_lib

        self.mesh = mesh
        self.__dict__.pop("_fn_cache", None)  # executables carry shardings
        self._merged_cache.clear()
        self._merged_current.clear()
        if mesh is None and getattr(self, "_unet_shardings", None) is not None:
            # leaving tensor-parallel mode: gather the column/row shards back
            # onto ONE device — and move the replicated trees with them, so
            # plain jit never sees a mixed device set (replicated DP params
            # alone can stay put; split params would keep multi-device jits)
            dev = jax.devices()[0]

            def gather(tree):
                return (None if tree is None else
                        jax.device_put(jax.device_get(tree), dev))

            self.unet_params = gather(self.unet_params)
            self.vae_params = gather(self.vae_params)
            self.text_params = gather(self.text_params)
            self.unet_lora = gather(self.unet_lora)
            self.text_encoder_lora = gather(self.text_encoder_lora)
        self._unet_shardings = None
        if mesh is not None:
            if "tp" in mesh.axis_names and mesh.shape["tp"] > 1:
                self._unet_shardings = mesh_lib.tp_shardings(
                    mesh, self.unet_params)
                self.unet_params = mesh_lib.shard_tree(
                    self.unet_params, self._unet_shardings)
            else:
                self.unet_params = mesh_lib.replicate(self.unet_params, mesh)
            self.vae_params = mesh_lib.replicate(self.vae_params, mesh)
            self.text_params = mesh_lib.replicate(self.text_params, mesh)
            if self.unet_lora is not None:
                self.unet_lora = mesh_lib.replicate(self.unet_lora, mesh)
            if self.text_encoder_lora is not None:
                self.text_encoder_lora = mesh_lib.replicate(
                    self.text_encoder_lora, mesh)
        return self

    def _jit_generation(self, run, latents_mode: str):
        """jit ``run`` with mesh shardings when distributed (batch args over
        ``data``, params/scalars replicated), plain jit otherwise."""
        if self.mesh is None:
            return jax.jit(run)
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(self.mesh, P())
        dat = NamedSharding(self.mesh, P("data"))
        lat_sh = rep if latents_mode == "key" else dat
        # tensor-parallel mode: the UNet params keep their per-leaf
        # column/row shardings (a pytree of NamedShardings matching the
        # params tree); pinning them replicated here would silently
        # all-gather the model back onto every chip
        unet_sh = getattr(self, "_unet_shardings", None) or rep
        in_sh = (unet_sh, rep, rep, rep, rep, lat_sh, dat, rep)
        return jax.jit(run, in_shardings=in_sh, out_shardings=dat)

    # -- LoRA materialization ----------------------------------------------
    def invalidate_merged_cache(self) -> None:
        """Drop cached merged-LoRA kernels.  Call this after mutating a LoRA
        tree IN PLACE (e.g. assigning a ``scale`` leaf directly into
        ``pipe.unet_lora``) — the cache below is keyed on tree identity and
        cannot see such edits.  The supported APIs (``patch_pipe``,
        ``tune_lora_scale_pipe``, ``monkeypatch_*``) replace trees
        functionally and never need this."""
        with self._swap_lock:
            self._merged_cache.clear()
            self._merged_current.clear()

    def _merged_params(self, which: str, params=None, lora=None):
        """Params with the LoRA delta folded in, cached per (params, lora)
        tree identity — ``patch_pipe`` / ``tune_lora_scale`` swap trees
        functionally, so identity change == invalidation.  In-place edits to
        a lora tree (same dict object) are invisible to this cache; use
        :meth:`invalidate_merged_cache` after such edits (or, better, swap
        trees functionally).

        Explicit ``params``/``lora`` serve multi-tenant adapters
        (:meth:`adapter_generation_params`): those land in a small
        identity-keyed LRU (``DFT_MERGED_LORA_CACHE``, default 8 entries)
        so a serving loop alternating between adapters re-merges nothing —
        each merged SD1.5 UNet is ~1.7 GB bf16 on device, hence the cap.
        The PIPE-INSTALLED trees (``params``/``lora`` omitted) use a
        single slot per ``which`` instead: hot-swap and scale-sweep loops
        replace the installed trees every iteration, and their superseded
        merges are garbage — routing them through the LRU would retain up
        to 8 dead ~1.7 GB UNets on a 16 GB chip.  The cached tuples hold
        the key trees strongly, so the ids stay valid for the cache's
        lifetime."""
        implicit = params is None and lora is None
        if params is None:
            params = self.unet_params if which == "unet" else self.text_params
        if lora is None:
            lora = (self.unet_lora if which == "unet"
                    else self.text_encoder_lora)
        if implicit:
            hit = self._merged_current.get(which)
            if hit is not None and hit[0] is params and hit[1] is lora:
                return hit[2]
        key = (which, id(params), id(lora))
        hit = self._merged_cache.get(key)
        if hit is not None and hit[0] is params and hit[1] is lora:
            self._merged_cache[key] = self._merged_cache.pop(key)  # LRU touch
            return hit[2]
        fn = self._cached(
            ("materialize",), lambda: jax.jit(lora_lib.materialize_lora_tree)
        )
        merged = fn(params, lora)
        if self.mesh is not None:
            # pin the merged tree on the mesh NOW — a LoRA patched after
            # shard_over is host-resident, and without this every generation
            # call would re-transfer the merged params.  Under tensor
            # parallelism the merged UNet keeps the column/row placement
            # (same tree structure: materialization folds deltas in place).
            from ..parallel import mesh as mesh_lib

            unet_sh = getattr(self, "_unet_shardings", None)
            if which == "unet" and unet_sh is not None:
                merged = mesh_lib.shard_tree(merged, unet_sh)
            else:
                merged = mesh_lib.replicate(merged, self.mesh)
        if implicit:
            self._merged_current[which] = (params, lora, merged)
            return merged
        while len(self._merged_cache) >= MERGED_LORA_CACHE_SIZE:
            self._merged_cache.pop(next(iter(self._merged_cache)))
        self._merged_cache[key] = (params, lora, merged)
        return merged

    def adapter_generation_params(self, unet_lora=None, text_lora=None,
                                  text_params=None):
        """The generation 4-tuple for an EXPLICIT adapter tree set, without
        installing anything on the pipe — multi-tenant serving resolves one
        of these per request batch (``GenerationServer.register_adapter``)
        and passes it to ``__call__(..., adapter_params=...)``, so requests
        for different LoRAs never mutate shared pipe state.  Honors the
        materialization policy and the merged-tree LRU.  Reference analogue:
        swapping LoRAs on one pipe via ``patch_pipe`` (lora.py:672-732) —
        here per-request instead of global."""
        with self._swap_lock:
            unet_params = self.unet_params
            if text_params is None:
                text_params = self.text_params
            if self.materialize_lora:
                if unet_lora is not None:
                    unet_params = self._merged_params(
                        "unet", unet_params, unet_lora)
                    unet_lora = None
                if text_lora is not None:
                    text_params = self._merged_params(
                        "text", text_params, text_lora)
                    text_lora = None
            return unet_params, unet_lora, text_params, text_lora

    def _generation_params(self):
        """(unet_params, unet_lora, text_params, text_lora) for generation,
        applying the materialization policy.  Holds ``_swap_lock`` so a
        concurrent ``patch_pipe``/``tune_lora_scale_pipe`` can never hand a
        generation a mixed old/new tree set."""
        with self._swap_lock:
            unet_params, unet_lora = self.unet_params, self.unet_lora
            text_params, text_lora = self.text_params, self.text_encoder_lora
            if self.materialize_lora:
                if unet_lora is not None:
                    unet_params, unet_lora = self._merged_params("unet"), None
                if text_lora is not None:
                    text_params, text_lora = self._merged_params("text"), None
            return unet_params, unet_lora, text_params, text_lora

    # -- text encoding ------------------------------------------------------
    def _encode_fn(self, with_lora: bool):
        return self._cached(("encode", with_lora),
                            lambda: self._build_encode_fn(with_lora))

    def _build_encode_fn(self, with_lora: bool):
        # jitted: unjitted op-by-op dispatch is the dominant latency on a
        # remote TPU (each op is an RPC); params/lora are runtime args so
        # TI row edits and LoRA swaps never recompile
        text_encoder = self.text_encoder

        if with_lora:
            def run(params, lora, ids):
                return text_encoder.apply({"params": params, "lora": lora}, ids)
        else:
            def run(params, lora, ids):
                del lora
                return text_encoder.apply({"params": params}, ids)

        return jax.jit(run)

    @staticmethod
    def _check_ids_in_vocab(ids, text_params) -> None:
        """Token ids must index inside the SELECTED embedding table.

        The tokenizer vocabulary is shared across tenants (each
        ``register_adapter``/``patch_pipe`` TI load grows it once), but
        embedding rows live per adapter tree — a prompt using a token
        registered AFTER this adapter's table was built would gather a
        clamped (= wrong, silent) row inside the jit.  Raise instead."""
        rows = text_params["token_embedding"]["embedding"].shape[0]
        mx = int(ids.max())
        if mx >= rows:
            raise ValueError(
                f"prompt tokenizes to id {mx} but the selected text-encoder "
                f"embedding table has only {rows} rows — the token was added "
                "to the shared vocabulary after this adapter/pipe tree was "
                "built. Re-register the adapter (or re-run patch_pipe) so "
                "its embedding table covers the token, or drop the token "
                "from the prompt."
            )

    def encode_prompt(self, prompts: Sequence[str]) -> jnp.ndarray:
        ids = self.tokenizer(
            list(prompts), padding="max_length", truncation=True,
            max_length=self.tokenizer.model_max_length, return_tensors="np",
        )["input_ids"]
        _, _, text_params, text_lora = self._generation_params()
        self._check_ids_in_vocab(ids, text_params)
        fn = self._encode_fn(text_lora is not None)
        return fn(text_params, text_lora, jnp.asarray(ids))

    # -- compiled denoise loop ---------------------------------------------
    def _denoise_fn(self, *key):
        return self._cached(("denoise",) + key,
                            lambda: self._build_denoise_fn(*key))

    def _build_denoise_fn(self, num_steps: int, height: int, width: int,
                          scheduler: str, batch: int, latents_mode: str,
                          text_lora_given: bool = False):
        """Everything device-side lives in ONE jit: text encoding (CFG pair),
        initial-latents RNG, the denoise scan, VAE decode, and uint8
        postprocess — a remote TPU pays per-dispatch RPC latency, so the
        whole image is one call."""
        sched_cfg = self.scheduler_config
        # sigma-space samplers accept a ":karras" suffix (e.g.
        # "euler:karras") selecting the Karras rho-7 sigma grid; the full
        # string stays in the executable-cache key
        base, _, variant = scheduler.partition(":")
        karras = variant == "karras"
        if variant and not karras:
            raise ValueError(f"unknown scheduler variant {scheduler!r}")
        if karras and base not in ("euler", "euler_a", "lms"):
            raise ValueError(f"{base} does not support the karras grid")
        if base == "ddim":
            sch = DDIMScheduler(sched_cfg)
        elif base == "pndm":
            sch = PNDMScheduler(sched_cfg)
        elif base == "dpm":
            from ..models.schedulers import DPMSolverMultistepScheduler

            sch = DPMSolverMultistepScheduler(sched_cfg)
        elif base == "euler":
            from ..models.schedulers import EulerDiscreteScheduler

            sch = EulerDiscreteScheduler(sched_cfg, karras=karras)
        elif base == "euler_a":
            from ..models.schedulers import EulerAncestralDiscreteScheduler

            sch = EulerAncestralDiscreteScheduler(sched_cfg, karras=karras)
        elif base == "lms":
            from ..models.schedulers import LMSDiscreteScheduler

            sch = LMSDiscreteScheduler(sched_cfg, karras=karras)
        else:
            raise ValueError(f"unknown scheduler {scheduler}")
        timesteps = sch.timesteps(num_steps)
        unet = self.unet
        sigma_space = base in ("euler", "euler_a", "lms")
        stateful = base in ("pndm", "dpm") or sigma_space
        factor = self.vae_scale_factor
        lat_shape = (batch, height // factor, width // factor,
                     self.unet_config.in_channels)

        text_encoder = self.text_encoder
        compute_dtype = self.dtype
        mesh = self.mesh

        def shard_hint(t):
            # pin the CFG-doubled batch to the data axis so GSPMD keeps the
            # big UNet activations batch-sharded (tiny latents/context may
            # still permute over ICI; that is sub-ms)
            if mesh is None:
                return t
            from jax.sharding import NamedSharding, PartitionSpec as P

            return jax.lax.with_sharding_constraint(
                t, NamedSharding(mesh, P("data")))

        def run(unet_params, vae_params, text_params, text_lora, unet_lora,
                lat_src, input_ids, guidance_scale):
            # input_ids: (2B, 77) = [uncond; cond]
            text_vars = {"params": text_params}
            if text_lora_given:
                text_vars["lora"] = text_lora
            context = text_encoder.apply(text_vars, input_ids).astype(compute_dtype)
            if latents_mode == "given":
                latents = lat_src
            elif latents_mode == "key":
                latents = jax.random.normal(lat_src, lat_shape, jnp.float32)
            else:  # "seeds": per-sample deterministic latents (serving)
                base = jax.random.PRNGKey(0)
                latents = jax.vmap(
                    lambda s: jax.random.normal(
                        jax.random.fold_in(base, s), lat_shape[1:], jnp.float32)
                )(lat_src)
            variables = {"params": unet_params}
            if unet_lora is not None:
                variables["lora"] = unet_lora

            def unet_eps(x, t):
                x2 = shard_hint(jnp.concatenate([x, x], axis=0))
                t2 = jnp.broadcast_to(t, (x2.shape[0],))
                eps = shard_hint(unet.apply(variables, x2, t2, context))
                eps_u, eps_c = jnp.split(eps, 2, axis=0)
                return eps_u + guidance_scale * (eps_c - eps_u)

            if stateful:
                if sigma_space:
                    # variance-exploding latents: x_T = sigma_max * N(0,1)
                    latents = latents * sch.init_noise_sigma(num_steps)
                    anc = None
                    if sch.stochastic:
                        # per-sample keys: a seed's noise stream must not
                        # depend on batch position (serving determinism)
                        if latents_mode == "seeds":
                            anc = jax.vmap(lambda s: jax.random.key_data(
                                jax.random.fold_in(jax.random.PRNGKey(1), s))
                            )(lat_src)
                        elif latents_mode == "key":
                            anc = jax.random.key_data(jax.random.split(
                                jax.random.fold_in(lat_src, 7), latents.shape[0]))
                        else:
                            anc = jax.random.key_data(jax.random.split(
                                jax.random.PRNGKey(1), latents.shape[0]))
                    state = sch.init_state(latents.shape, latents.dtype, rng=anc)
                else:
                    state = sch.init_state(latents.shape, latents.dtype)

                def body(carry, t):
                    x, st = carry
                    xin = (sch.scale_model_input(x, st, num_steps)
                           if sigma_space else x)
                    eps = unet_eps(xin, t)
                    x, st = sch.step(eps, t, x, st, num_steps)
                    return (x, st), None

                (latents, _), _ = jax.lax.scan(
                    body, (latents, state), timesteps, unroll=_SCAN_UNROLL)
            else:

                def body(x, t):
                    eps = unet_eps(x, t)
                    return sch.step(eps, t, x, num_steps), None

                latents, _ = jax.lax.scan(body, latents, timesteps,
                                          unroll=_SCAN_UNROLL)

            images = self.vae.apply(
                {"params": vae_params},
                (latents / SCALING_FACTOR).astype(self.dtype),
                method=self.vae.decode,
            ).astype(jnp.float32)
            # uint8 on device: 4x less data over the host link
            images = jnp.clip(images / 2 + 0.5, 0.0, 1.0)
            return jnp.round(images * 255.0).astype(jnp.uint8)

        return self._jit_generation(run, latents_mode)

    # -- generation ---------------------------------------------------------
    def __call__(
        self,
        prompt: Union[str, Sequence[str]],
        negative_prompt: Union[str, Sequence[str]] = "",
        height: int = 512,
        width: int = 512,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        rng: Optional[jax.Array] = None,
        seed: Union[int, Sequence[int]] = 0,
        scheduler: str = "ddim",
        latents: Optional[jnp.ndarray] = None,
        output_type: str = "pil",
        adapter_params=None,
    ):
        """``seed`` may be a per-prompt sequence (serving batches coalesce
        requests with different seeds); an int seeds element i with
        ``seed + i``.  Passing ``rng`` uses one key for the whole batch.
        ``adapter_params`` (from :meth:`adapter_generation_params`) generates
        with an explicit LoRA/TI tree set instead of the pipe's installed
        one — the multi-tenant serving path."""
        prompts = [prompt] if isinstance(prompt, str) else list(prompt)
        negs = (
            [negative_prompt] * len(prompts)
            if isinstance(negative_prompt, str)
            else list(negative_prompt)
        )
        b = len(prompts)
        if len(negs) != b:
            raise ValueError(
                f"{len(negs)} negative prompts for {b} prompts — pass one "
                "string (broadcast) or a list of matching length"
            )

        if latents is not None:
            mode, lat_src = "given", latents
        elif rng is not None:
            mode, lat_src = "key", rng
        else:
            seeds = ([seed + i for i in range(b)] if isinstance(seed, int)
                     else list(seed))
            assert len(seeds) == b, "one seed per prompt"
            mode, lat_src = "seeds", jnp.asarray(seeds, jnp.int32)

        # tokenize [uncond; cond] on host; text encoding runs inside the jit
        ids = self.tokenizer(
            negs + prompts, padding="max_length", truncation=True,
            max_length=self.tokenizer.model_max_length, return_tensors="np",
        )["input_ids"]

        if self.mesh is not None:
            n = self.mesh.shape["data"]
            if b % n != 0:
                raise ValueError(
                    f"batch {b} must be a multiple of the mesh data axis ({n});"
                    " pad the prompt list or use a matching batch size"
                )
        unet_params, unet_lora, text_params, text_lora = (
            adapter_params if adapter_params is not None
            else self._generation_params())
        self._check_ids_in_vocab(ids, text_params)
        fn = self._denoise_fn(
            num_inference_steps, height, width, scheduler, b,
            mode, text_lora is not None,
        )
        images = fn(
            unet_params, self.vae_params, text_params,
            text_lora, unet_lora,
            lat_src, jnp.asarray(ids),
            jnp.asarray(guidance_scale, jnp.float32),
        )
        return self._postprocess(images, output_type)

    def _img2img_fn(self, *key):
        return self._cached(("img2img",) + key,
                            lambda: self._build_img2img_fn(*key))

    @staticmethod
    def _truncated_sigma_scheduler(cls, cfg, karras: bool, n: int, start: int):
        """A sigma-space scheduler running on ``full_grid[start:]`` — the
        k-diffusion img2img convention: the sampler starts fresh on the
        sliced sigma sequence (LMS/multistep history ramps from scratch),
        rather than pretending the skipped steps happened."""
        full = cls(cfg, karras=karras)

        class Truncated(cls):
            def _sigmas_np(self, _n):
                return full._sigmas_np(n)[start:]

            def timesteps(self, _n):
                return full.timesteps(n)[start:]

            def init_noise_sigma(self, _n):
                return float(full._sigmas_np(n)[start])

        Truncated.__name__ = f"Truncated{cls.__name__}"
        return Truncated(cfg, karras=karras)

    def _build_img2img_fn(self, num_steps: int, t_start: int, height: int,
                          width: int, batch: int, text_lora_given: bool,
                          scheduler: str = "ddim"):
        """One jit for the whole img2img call: VAE encode + forward noising +
        text encode + partial denoise scan + decode + uint8 postprocess."""
        from ..models.schedulers import (
            DDIMScheduler,
            DDPMScheduler,
            DPMSolverMultistepScheduler,
            EulerAncestralDiscreteScheduler,
            EulerDiscreteScheduler,
            LMSDiscreteScheduler,
        )

        base, _, variant = scheduler.partition(":")
        karras = variant == "karras"
        if variant and not karras:
            raise ValueError(f"unknown scheduler variant {scheduler!r}")
        sigma_classes = {
            "euler": EulerDiscreteScheduler,
            "euler_a": EulerAncestralDiscreteScheduler,
            "lms": LMSDiscreteScheduler,
        }
        sigma_space = base in sigma_classes
        if karras and not sigma_space:
            raise ValueError(f"{base} does not support the karras grid")
        if base == "ddim":
            sch = DDIMScheduler(self.scheduler_config)
        elif base == "pndm":
            # mid-grid restart, diffusers img2img semantics: the counter
            # ramps from 0 on the truncated grid (first step plain/RK-
            # skipped, second the midpoint re-eval, then Adams-Bashforth) —
            # exactly what diffusers' step_plms does when the img2img
            # pipeline slices scheduler.timesteps (its PLMS history is
            # counter-based, not grid-position-based).  Only the stride
            # comes from num_steps, so the sliced grid needs no rebuild.
            sch = PNDMScheduler(self.scheduler_config)
        elif base == "dpm":
            # truncated grid: DPM restarts first-order at counter 0, so
            # slicing its per-n tables is a fresh solve on the sub-grid
            cfg = self.scheduler_config
            full = DPMSolverMultistepScheduler(cfg)

            class _TruncatedDPM(DPMSolverMultistepScheduler):
                def _timesteps_np(self, _n):
                    return full._timesteps_np(num_steps)[t_start:]

            sch = _TruncatedDPM(cfg)
        elif sigma_space:
            sch = self._truncated_sigma_scheduler(
                sigma_classes[base], self.scheduler_config, karras,
                num_steps, t_start)
        else:
            raise ValueError(
                "img2img supports ddim / pndm / dpm / euler / euler_a / lms "
                f"(got {scheduler!r})")
        stateful = sigma_space or base in ("dpm", "pndm")
        ddpm = DDPMScheduler(self.scheduler_config)
        unet = self.unet
        vae = self.vae
        text_encoder = self.text_encoder
        compute_dtype = self.dtype

        def run(unet_params, vae_params, text_params, text_lora, unet_lora,
                x, input_ids, key, guidance_scale, ts_used):
            r_enc, r_noise = jax.random.split(key)
            post = vae.apply({"params": vae_params}, x.astype(compute_dtype),
                             method=vae.encode)
            latents0 = post.sample(r_enc) * SCALING_FACTOR
            # one init image, `batch` prompts: broadcast the encoded image,
            # sample independent noise per prompt
            latents0 = jnp.tile(latents0, (batch, 1, 1, 1))
            noise = jax.random.normal(r_noise, latents0.shape, jnp.float32)
            if sigma_space:
                # VE forward noising to the start sigma
                latents = latents0.astype(jnp.float32) + (
                    sch.init_noise_sigma(num_steps) * noise)
            else:
                latents = ddpm.add_noise(
                    latents0.astype(jnp.float32), noise, ts_used[:1]
                )

            text_vars = {"params": text_params}
            if text_lora_given:
                text_vars["lora"] = text_lora
            context = text_encoder.apply(text_vars, input_ids).astype(compute_dtype)

            variables = {"params": unet_params}
            if unet_lora is not None:
                variables["lora"] = unet_lora

            def unet_eps(xin, t):
                x2 = jnp.concatenate([xin, xin], axis=0)
                t2 = jnp.broadcast_to(t, (x2.shape[0],))
                eps = unet.apply(variables, x2, t2, context)
                eps_u, eps_c = jnp.split(eps, 2, axis=0)
                return eps_u + guidance_scale * (eps_c - eps_u)

            if stateful:
                if sigma_space:
                    anc = None
                    if sch.stochastic:
                        anc = jax.random.key_data(jax.random.split(
                            jax.random.fold_in(key, 7), latents.shape[0]))
                    state = sch.init_state(latents.shape, latents.dtype,
                                           rng=anc)
                else:
                    state = sch.init_state(latents.shape, latents.dtype)

                def body(carry, t):
                    xc, st = carry
                    xin = (sch.scale_model_input(xc, st, num_steps)
                           if sigma_space else xc)
                    eps = unet_eps(xin, t)
                    xc, st = sch.step(eps, t, xc, st, num_steps)
                    return (xc, st), None

                (latents, _), _ = jax.lax.scan(
                    body, (latents, state), ts_used, unroll=_SCAN_UNROLL)
            else:

                def body(xc, t):
                    eps = unet_eps(xc, t)
                    return sch.step(eps, t, xc, num_steps), None

                latents, _ = jax.lax.scan(body, latents, ts_used,
                                          unroll=_SCAN_UNROLL)
            images = vae.apply(
                {"params": vae_params},
                (latents / SCALING_FACTOR).astype(compute_dtype),
                method=vae.decode,
            ).astype(jnp.float32)
            images = jnp.clip(images / 2 + 0.5, 0.0, 1.0)
            return jnp.round(images * 255.0).astype(jnp.uint8)

        return jax.jit(run)

    def img2img(
        self,
        prompt: Union[str, Sequence[str]],
        init_image: np.ndarray,  # (H, W, 3) float in [0,1] or uint8
        strength: float = 0.75,
        negative_prompt: Union[str, Sequence[str]] = "",
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        seed: int = 0,
        scheduler: str = "ddim",
        output_type: str = "pil",
        adapter_params=None,
    ):
        """SDEdit-style img2img (reference scripts/run_img2img.ipynb flow).

        ``scheduler``: ddim (default), pndm (the SD-default sampler the
        reference notebook inherits — mid-grid restart with diffusers'
        counter-based PLMS warmup), dpm, or any sigma-space sampler —
        euler / euler_a / lms, optionally with a ``:karras`` suffix.
        ``adapter_params``: see ``__call__``."""
        from ..models.schedulers import (
            DDIMScheduler,
            DPMSolverMultistepScheduler,
            EulerAncestralDiscreteScheduler,
            EulerDiscreteScheduler,
            LMSDiscreteScheduler,
        )

        prompts = [prompt] if isinstance(prompt, str) else list(prompt)
        img = np.asarray(init_image)
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 255.0
        x = jnp.asarray(img)[None] * 2.0 - 1.0  # (1,H,W,3) in [-1,1]
        h, w = img.shape[0], img.shape[1]

        base, _, variant = scheduler.partition(":")
        sigma_bases = ("euler", "euler_a", "lms")
        grid_cls = {
            "ddim": DDIMScheduler,
            "pndm": PNDMScheduler,
            "dpm": DPMSolverMultistepScheduler,
            "euler": EulerDiscreteScheduler,
            "euler_a": EulerAncestralDiscreteScheduler,
            "lms": LMSDiscreteScheduler,
        }.get(base)
        if grid_cls is None or (variant and (variant != "karras"
                                             or base not in sigma_bases)):
            # surface grid/variant errors eagerly with the builder's message
            self._build_img2img_fn(num_inference_steps, 0, h, w,
                                   len(prompts), False, scheduler)
        kwargs = ({"karras": variant == "karras"}
                  if base in sigma_bases else {})
        ts = np.asarray(grid_cls(self.scheduler_config, **kwargs)
                        .timesteps(num_inference_steps))
        t_start = int(min(len(ts) - 1, round((1 - strength) * len(ts))))
        ts_used = jnp.asarray(ts[t_start:])

        negs = (
            [negative_prompt] * len(prompts)
            if isinstance(negative_prompt, str)
            else list(negative_prompt)
        )
        if len(negs) != len(prompts):
            raise ValueError(
                f"{len(negs)} negative prompts for {len(prompts)} prompts — "
                "pass one string (broadcast) or a list of matching length"
            )
        ids = self.tokenizer(
            negs + prompts, padding="max_length", truncation=True,
            max_length=self.tokenizer.model_max_length, return_tensors="np",
        )["input_ids"]

        unet_params, unet_lora, text_params, text_lora = (
            adapter_params if adapter_params is not None
            else self._generation_params())
        self._check_ids_in_vocab(ids, text_params)
        fn = self._img2img_fn(
            num_inference_steps, t_start, h, w, len(prompts),
            text_lora is not None, scheduler,
        )
        images = fn(
            unet_params, self.vae_params, text_params,
            text_lora, unet_lora,
            x, jnp.asarray(ids), jax.random.PRNGKey(seed),
            jnp.asarray(guidance_scale, jnp.float32), ts_used,
        )
        return self._postprocess(images, output_type)

    @staticmethod
    def _postprocess(images: jnp.ndarray, output_type: str):
        if output_type == "device":
            # async mode: hand back the on-device uint8 array without
            # forcing a host transfer — the dispatch is already enqueued,
            # so the caller can pipeline the next generation behind this
            # one and fetch (np.asarray) in completion order, overlapping
            # per-dispatch host/RPC latency with device compute
            return images
        images = np.asarray(images)
        if images.dtype != np.uint8:
            # both built-in paths emit uint8 from the jit; this branch only
            # serves external callers passing raw [-1,1] float decodes
            images = np.clip(images.astype(np.float32) / 2 + 0.5, 0.0, 1.0)
            images = (images * 255).round().astype(np.uint8)
        if output_type == "np":
            return images.astype(np.float32) / 255.0
        if output_type == "pil":
            from PIL import Image

            return [Image.fromarray(im) for im in images]
        return images


# ---------------------------------------------------------------------------
# patch_pipe / tune_lora_scale on the pipe (reference lora.py:672-732, 597-600)
# ---------------------------------------------------------------------------


def patch_pipe(
    pipe: StableDiffusionPipeline,
    maybe_unet_path: str,
    token: Optional[str] = None,
    r: int = 4,
    patch_unet: bool = True,
    patch_text: bool = False,
    patch_ti: bool = False,
    idempotent_token: bool = True,
    unet_target_replace_module: set = lora_lib.DEFAULT_TARGET_REPLACE,
    text_target_replace_module: set = lora_lib.TEXT_ENCODER_DEFAULT_TARGET_REPLACE,
) -> StableDiffusionPipeline:
    """One-call patch of a pipeline from ``.pt`` sidecar files or a
    consolidated ``.safetensors`` (reference lora.py:672-732).

    Hot-swap safe: the whole build+install runs under the pipeline's swap
    lock (an RLock), so concurrent generations (GenerationServer) see either
    the fully-old or the fully-new LoRA/TI state, and two concurrent
    ``patch_pipe`` calls serialize — each bases its TI-embedding update on
    the other's installed ``text_params`` instead of both reading the same
    original and the last writer silently dropping the first one's tokens.
    """
    with pipe._swap_lock:
        return _patch_pipe_locked(
            pipe, maybe_unet_path, token, r, patch_unet, patch_text,
            patch_ti, idempotent_token, unet_target_replace_module,
            text_target_replace_module,
        )


def build_adapter(
    pipe: StableDiffusionPipeline,
    path: str,
    token: Optional[str] = None,
    r: int = 4,
    patch_unet: bool = True,
    patch_text: bool = True,
    patch_ti: bool = True,
    idempotent_token: bool = True,
    unet_target_replace_module: set = lora_lib.DEFAULT_TARGET_REPLACE,
    text_target_replace_module: set = lora_lib.TEXT_ENCODER_DEFAULT_TARGET_REPLACE,
) -> Dict[str, Any]:
    """Load a LoRA/TI file into adapter trees WITHOUT installing them —
    the loading half of :func:`patch_pipe` (reference lora.py:672-732),
    for multi-tenant serving (``GenerationServer.register_adapter``).

    Returns a dict with whichever of ``unet_lora`` / ``text_encoder_lora`` /
    ``text_params`` the file provided.  TI tokens are added to the SHARED
    tokenizer (vocabulary grows once), but the embedding rows live only in
    the returned ``text_params`` — requests generated with a different
    adapter never see them."""
    with pipe._swap_lock:
        return _compute_patch_updates(
            pipe, path, token, r, patch_unet, patch_text, patch_ti,
            idempotent_token, unet_target_replace_module,
            text_target_replace_module,
        )


def _patch_pipe_locked(
    pipe, maybe_unet_path, token, r, patch_unet, patch_text, patch_ti,
    idempotent_token, unet_target_replace_module, text_target_replace_module,
):
    updates = _compute_patch_updates(
        pipe, maybe_unet_path, token, r, patch_unet, patch_text, patch_ti,
        idempotent_token, unet_target_replace_module,
        text_target_replace_module,
    )
    with pipe._swap_lock:
        for attr, value in updates.items():
            setattr(pipe, attr, value)
    return pipe


def _compute_patch_updates(
    pipe, maybe_unet_path, token, r, patch_unet, patch_text, patch_ti,
    idempotent_token, unet_target_replace_module, text_target_replace_module,
):
    updates: Dict[str, Any] = {}
    if maybe_unet_path.endswith(".pt"):
        if maybe_unet_path.endswith(".ti.pt"):
            unet_path = maybe_unet_path[:-6] + ".pt"
        elif maybe_unet_path.endswith(".text_encoder.pt"):
            unet_path = maybe_unet_path[:-16] + ".pt"
        else:
            unet_path = maybe_unet_path
        ti_path = lora_lib._ti_lora_path(unet_path)
        text_path = lora_lib._text_lora_path(unet_path)

        if patch_unet:
            print("LoRA : Patching Unet")
            targets = pipe.lora_targets("unet", unet_target_replace_module)
            updates["unet_lora"] = lora_lib.monkeypatch_or_replace_lora(
                unet_path, targets, r=r, dtype=pipe.dtype
            )
        if patch_text:
            print("LoRA : Patching text encoder")
            targets = pipe.lora_targets("text_encoder", text_target_replace_module)
            updates["text_encoder_lora"] = lora_lib.monkeypatch_or_replace_lora(
                text_path, targets, r=r, dtype=pipe.dtype
            )
        if patch_ti:
            print("LoRA : Patching token input")
            updates["text_params"], token = load_learned_embed_in_clip(
                ti_path, pipe.text_params, pipe.tokenizer,
                token=token, idempotent=idempotent_token,
            )
    elif maybe_unet_path.endswith(".safetensors"):
        tensors, metadata = lora_lib.safetensors_io.read_safetensors(maybe_unet_path)
        loras = lora_lib.parse_safeloras(tensors, metadata)
        for name, (flat, ranks, target) in loras.items():
            try:
                targets = pipe.lora_targets(name, set(target))
            except KeyError:
                print(f"No model provided for {name}, contained in Lora")
                continue
            tree = lora_lib.flat_to_lora_tree(flat, targets, dtype=pipe.dtype)
            updates[f"{name}_lora"] = tree
        tok_dict = lora_lib.parse_safeloras_embeds(tensors, metadata)
        if tok_dict:
            updates["text_params"], token = apply_learned_embed_in_clip(
                tok_dict, pipe.text_params, pipe.tokenizer,
                token=token, idempotent=idempotent_token,
            )
    return updates


def tune_lora_scale_pipe(pipe: StableDiffusionPipeline, alpha: float = 1.0,
                         which: str = "both") -> None:
    with pipe._swap_lock:
        if which in ("both", "unet") and pipe.unet_lora is not None:
            pipe.unet_lora = lora_lib.tune_lora_scale(pipe.unet_lora, alpha)
        if which in ("both", "text") and pipe.text_encoder_lora is not None:
            pipe.text_encoder_lora = lora_lib.tune_lora_scale(
                pipe.text_encoder_lora, alpha)
