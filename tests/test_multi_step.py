"""multi_step fused dispatch == k sequential train steps (bit-for-bit)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_finetuning_tpu import lora as lora_lib
from diffusion_finetuning_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
from diffusion_finetuning_tpu.models.schedulers import DDPMScheduler, SchedulerConfig
from diffusion_finetuning_tpu.models.unet import (
    UNet2DConditionModel, UNetConfig, unet_lora_targets,
)
from diffusion_finetuning_tpu.models.vae import AutoencoderKL, VAEConfig
from diffusion_finetuning_tpu.training.optim import ParamGroup, multi_group_optimizer
from diffusion_finetuning_tpu.training.train_step import (
    TrainablePartition, build_train_step, jit_train_step, multi_step,
    stack_batches,
)

from tests.jitutil import jit_init


@pytest.fixture(scope="module")
def setup():
    ucfg, vcfg, tcfg = UNetConfig.tiny(), VAEConfig.tiny(), CLIPTextConfig.tiny()
    unet = UNet2DConditionModel(ucfg)
    vae = AutoencoderKL(vcfg)
    text_encoder = CLIPTextModel(tcfg)
    rng = jax.random.PRNGKey(0)
    # jitted inits: op-by-op init dispatch costs seconds on the 1-core box
    unet_params = jit_init(unet)(
        rng, jnp.zeros((1, 8, 8, ucfg.in_channels)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, ucfg.cross_attention_dim)))["params"]
    vae_params = jit_init(vae)(rng, jnp.zeros((1, 16, 16, 3)), rng)["params"]
    text_params = jit_init(text_encoder)(rng, jnp.zeros((1, 77), jnp.int32))["params"]
    targets = lora_lib.filter_targets(
        unet_lora_targets(ucfg), lora_lib.DEFAULT_TARGET_REPLACE)
    unet_lora = lora_lib.inject_trainable_lora(targets, jax.random.PRNGKey(1), r=1)
    optimizer = multi_group_optimizer(
        {"unet_lora": ParamGroup(lr=1e-3)}, max_grad_norm=1.0,
    )
    scheduler = DDPMScheduler(SchedulerConfig())
    step_fn = build_train_step(
        unet=unet, text_encoder=text_encoder, vae=vae,
        scheduler=scheduler, optimizer=optimizer,
        partition=TrainablePartition(unet_lora=True),
    )
    params = {"unet_lora": unet_lora}
    emb = text_params["token_embedding"]["embedding"]
    state = {
        "params": params,
        "static": {
            "unet_params": unet_params, "text_params": text_params,
            "vae_params": vae_params, "orig_embeddings": emb,
            "index_updates": jnp.zeros((emb.shape[0],), bool),
        },
        "opt_state": optimizer.init(params),
        "step": jnp.zeros((), jnp.int32),
    }
    return step_fn, state


def _batches(k):
    rng = np.random.default_rng(0)
    return [
        {"pixel_values": rng.standard_normal((1, 16, 16, 3)).astype(np.float32),
         "input_ids": np.full((1, 77), 2, np.int32)}
        for _ in range(k)
    ]


def test_multi_step_matches_sequential(setup):
    step_fn, state = setup
    k = 3
    batches = _batches(k)
    rng = jax.random.PRNGKey(7)

    seq_state = state
    keys = jax.random.split(rng, k)
    losses = []
    jitted = jit_train_step(step_fn)
    for b, key in zip(batches, keys):
        seq_state, m = jitted(
            seq_state, jax.tree_util.tree_map(jnp.asarray, b), key)
        losses.append(float(m["loss"]))

    fused = jit_train_step(multi_step(step_fn, k))
    fused_state, ms = fused(state, stack_batches(batches), rng)

    np.testing.assert_allclose(np.asarray(ms["loss"]), losses, rtol=2e-5)
    assert int(fused_state["step"]) == int(seq_state["step"]) == k
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6),
        fused_state["params"], seq_state["params"],
    )


def test_multi_step_bf16_carry_close_to_exact(setup):
    """carry_dtype=bf16 (the DFT_BENCH_CARRY_BF16 measurement knob) rounds
    master params/moments between steps: the trajectory must stay close to
    the fp32-carry one over a few steps, state dtypes must be unchanged at
    the boundary, and the memo must key the two variants separately."""
    step_fn, state = setup
    k = 3
    batches, rng = _batches(k), jax.random.PRNGKey(7)

    exact = multi_step(step_fn, k)
    bf16 = multi_step(step_fn, k, carry_dtype=jnp.bfloat16)
    assert exact is multi_step(step_fn, k)            # memo intact
    assert bf16 is multi_step(step_fn, k, carry_dtype=jnp.bfloat16)
    assert exact is not bf16

    st_exact, ms_exact = jit_train_step(exact)(state, stack_batches(batches), rng)
    st_bf16, ms_bf16 = jit_train_step(bf16)(state, stack_batches(batches), rng)

    # caller-visible state keeps fp32 leaves (upcast at the boundary)
    jax.tree_util.tree_map(
        lambda a, b: (a.dtype == b.dtype or
                      (_ for _ in ()).throw(AssertionError((a.dtype, b.dtype)))),
        st_exact["params"], st_bf16["params"])
    np.testing.assert_allclose(np.asarray(ms_bf16["loss"]),
                               np.asarray(ms_exact["loss"]), rtol=1e-2)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=1e-2),
        st_exact["params"], st_bf16["params"])


def test_multi_step_on_mesh(setup):
    """Fused dispatch composes with DP sharding (batch axis = dim 1)."""
    from diffusion_finetuning_tpu.parallel import mesh as mesh_lib

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    step_fn, state = setup
    k = 2
    batches = [
        jax.tree_util.tree_map(lambda x: np.concatenate([x, x]), b)
        for b in _batches(k)
    ]  # batch size 2 -> shards over 2 devices
    mesh = mesh_lib.make_mesh(2)
    fused = jit_train_step(multi_step(step_fn, k), mesh=mesh, batch_ndims=2)
    st = mesh_lib.replicate(state, mesh)
    st, ms = fused(st, stack_batches(batches), jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(ms["loss"])).all()
    assert int(st["step"]) == k


def test_executable_caches_reuse(setup):
    """Equal declarative specs return the SAME objects all the way down
    (optimizer -> step closure -> fused closure -> jit wrapper), so repeat
    trainer invocations / sweeps in one process re-trace nothing.  Opaque
    components must fall back to fresh builds."""
    from diffusion_finetuning_tpu.models.unet import (
        UNet2DConditionModel as U, UNetConfig as UC,
    )
    from diffusion_finetuning_tpu.models.clip_text import (
        CLIPTextConfig as TC, CLIPTextModel as T,
    )
    from diffusion_finetuning_tpu.models.vae import (
        AutoencoderKL as V, VAEConfig as VC,
    )
    from diffusion_finetuning_tpu.models.schedulers import (
        DDPMScheduler, SchedulerConfig,
    )

    step_fn, _ = setup
    # same spec -> same optimizer object
    opt = multi_group_optimizer(
        {"unet_lora": ParamGroup(lr=1e-3)}, max_grad_norm=1.0)
    opt2 = multi_group_optimizer(
        {"unet_lora": ParamGroup(lr=1e-3)}, max_grad_norm=1.0)
    assert opt is opt2
    # different lr -> different optimizer
    assert opt is not multi_group_optimizer(
        {"unet_lora": ParamGroup(lr=2e-3)}, max_grad_norm=1.0)
    # freshly-constructed equal modules/scheduler -> the SAME step closure
    step2 = build_train_step(
        unet=U(UC.tiny()), text_encoder=T(TC.tiny()), vae=V(VC.tiny()),
        scheduler=DDPMScheduler(SchedulerConfig()), optimizer=opt,
        partition=TrainablePartition(unet_lora=True),
    )
    assert step2 is step_fn
    # wrapper caches: same (fn, k) / same jit params -> same objects
    assert multi_step(step_fn, 3) is multi_step(step_fn, 3)
    assert jit_train_step(step_fn) is jit_train_step(step_fn)
    assert multi_step(step_fn, 2) is not multi_step(step_fn, 3)
    # opaque label_fn -> uncacheable -> fresh transform each time
    lbl = lambda tree: {"unet_lora": "unet_lora"}  # noqa: E731
    assert multi_group_optimizer(
        {"unet_lora": ParamGroup(lr=1e-3)}, lbl, max_grad_norm=1.0,
    ) is not multi_group_optimizer(
        {"unet_lora": ParamGroup(lr=1e-3)}, lbl, max_grad_norm=1.0,
    )


def test_runtime_lr_scale_equals_scaled_lr():
    """Optimizer-level oracle: a runtime scale s on base lr equals a fresh
    optimizer at lr*s (AdamW couples decoupled wd with lr, so post-update
    scaling IS lr scaling).  Pure optax — no model needed."""
    from diffusion_finetuning_tpu.training.optim import set_lr_scale

    params = {"g": {"w": jnp.arange(6.0).reshape(2, 3) / 7.0}}
    grads = {"g": {"w": jnp.linspace(-1, 1, 6).reshape(2, 3)}}

    swept = multi_group_optimizer(
        {"g": ParamGroup(lr=2e-3)}, runtime_lr_scale=True)
    st = set_lr_scale(swept.init(params), "g", 0.5)
    upd_a, st = swept.update(grads, st, params)

    oracle = multi_group_optimizer({"g": ParamGroup(lr=1e-3)})
    upd_b, _ = oracle.update(grads, oracle.init(params), params)
    np.testing.assert_allclose(np.asarray(upd_a["g"]["w"]),
                               np.asarray(upd_b["g"]["w"]), atol=1e-10)

    # a second step still sees the swept scale (state round-trips)
    upd_c, _ = swept.update(grads, st, params)
    assert np.abs(np.asarray(upd_c["g"]["w"])).max() > 0

    with pytest.raises(ValueError, match="no runtime lr_scale"):
        set_lr_scale(oracle.init(params), "g", 2.0)


def test_runtime_lr_scale_sweeps_without_retrace(setup):
    """The LR scale is an opt_state leaf, so an LR sweep reuses ONE
    compiled train step.  Config matches scripts/sweep_lr.py's tiny-model
    smoke (test_cli_tools) on purpose: the executable is shared."""
    from diffusion_finetuning_tpu.models.schedulers import DDPMScheduler
    from diffusion_finetuning_tpu.training.optim import set_lr_scale

    step_fn, state = setup
    opt = multi_group_optimizer(
        {"unet_lora": ParamGroup(lr=1e-3, total_steps=4)},
        max_grad_norm=1.0, runtime_lr_scale=True,
    )
    # same spec -> same (cached) transform; the flag is part of the key
    assert opt is multi_group_optimizer(
        {"unet_lora": ParamGroup(lr=1e-3, total_steps=4)},
        max_grad_norm=1.0, runtime_lr_scale=True,
    )
    from diffusion_finetuning_tpu.models.clip_text import (
        CLIPTextConfig, CLIPTextModel,
    )
    from diffusion_finetuning_tpu.models.unet import (
        UNet2DConditionModel, UNetConfig,
    )
    from diffusion_finetuning_tpu.models.vae import AutoencoderKL, VAEConfig

    sweep_step = build_train_step(
        unet=UNet2DConditionModel(UNetConfig.tiny()),
        text_encoder=CLIPTextModel(CLIPTextConfig.tiny()),
        vae=AutoencoderKL(VAEConfig.tiny()),
        scheduler=DDPMScheduler(SchedulerConfig()),
        optimizer=opt,
        partition=TrainablePartition(unet_lora=True),
    )
    jitted = jit_train_step(sweep_step)
    batch = jax.tree_util.tree_map(jnp.asarray, _batches(1)[0])
    rng = jax.random.PRNGKey(9)

    moved = {}
    for scale in (0.25, 4.0):
        st = {**state, "opt_state": set_lr_scale(
            opt.init(state["params"]), "unet_lora", scale)}
        out, _ = jitted(st, batch, rng)   # one executable, both points
        moved[scale] = max(
            v for vals in lora_lib.inspect_lora(
                out["params"]["unet_lora"]).values() for v in vals)
    assert moved[4.0] > moved[0.25] > 0


def test_uint8_batch_matches_float_batch(setup):
    """The uint8 wire format (collate requantization + on-device normalize)
    must reproduce the fp32 pixel path to pixel-quantization rounding.

    Exact bit-identity is unattainable across executables: XLA's algebraic
    simplifier reassociates the affine normalize (v/255*2-1 becomes a fused
    multiply-add), shifting each pixel by ≤1 ulp — so the contract is
    rounding-level equivalence of the whole step, not bitwise equality."""
    step_fn, state = setup
    rng = np.random.default_rng(3)
    u8 = rng.integers(0, 256, (1, 16, 16, 3), np.uint8)
    f32 = u8.astype(np.float32) / 255.0 * 2.0 - 1.0
    ids = np.full((1, 77), 2, np.int32)
    jitted = jit_train_step(step_fn)
    key = jax.random.PRNGKey(5)

    st_a, m_a = jitted(state, {"pixel_values": jnp.asarray(f32),
                               "input_ids": jnp.asarray(ids)}, key)
    st_b, m_b = jitted(state, {"pixel_values": jnp.asarray(u8),
                               "input_ids": jnp.asarray(ids)}, key)
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-7),
        st_a["params"], st_b["params"],
    )


def test_static_modification_fails_loudly(setup):
    """The fused/jit wrappers hoist state['static'] as a loop invariant; a
    step that rebuilds a static leaf must be rejected at trace time, not
    silently dropped."""
    def bad_step(state, batch, rng):
        new_static = dict(state["static"],
                          orig_embeddings=state["static"]["orig_embeddings"] + 1)
        return {**state, "static": new_static}, {"loss": jnp.zeros(())}

    _, state = setup
    batch = jax.tree_util.tree_map(jnp.asarray, _batches(1)[0])
    with pytest.raises(ValueError, match="modified state\\['static'\\]"):
        jit_train_step(bad_step)(state, batch, jax.random.PRNGKey(0))


def test_fused_dispatcher_compiles_for_recurring_partial_size(setup):
    """A group size that recurs (e.g. spd clipped at every save boundary)
    must get its own fused executable instead of degrading to per-step
    dispatch forever."""
    from diffusion_finetuning_tpu.training.train_step import FusedDispatcher

    step_fn, state = setup
    d = FusedDispatcher(step_fn, spd=3)
    batches = _batches(2)
    state, losses = d.run(state, batches, jax.random.PRNGKey(0))
    assert losses.shape == (2,)
    assert 2 not in d._fused          # first sighting: per-step fallback
    state, losses = d.run(state, batches, jax.random.PRNGKey(1))
    assert 2 in d._fused              # recurring: fused executable built
    state, losses = d.run(state, batches, jax.random.PRNGKey(2))
    assert losses.shape == (2,)
    assert int(state["step"]) == 6


def test_fused_dispatcher_prepare_path_is_bit_identical(setup):
    """run(prepared=prepare(group)) must equal run(group) exactly — the
    prefetch only moves the stack/shard/transfer off the critical path."""
    from diffusion_finetuning_tpu.training.train_step import FusedDispatcher

    step_fn, state = setup
    d = FusedDispatcher(step_fn, spd=3)
    batches = _batches(3)

    s1, l1 = d.run(state, batches, jax.random.PRNGKey(0))
    prepared = d.prepare(batches)
    assert prepared is not None and prepared[0] == 3
    s2, l2 = d.run(state, batches, jax.random.PRNGKey(0), prepared=prepared)
    assert np.array_equal(np.asarray(l1), np.asarray(l2))
    assert jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: bool(np.array_equal(np.asarray(a), np.asarray(b))),
        s1["params"], s2["params"]))

    # partial / per-step groups are not preparable (prepare never compiles)
    assert d.prepare(_batches(2)) is None
    assert d.prepare(_batches(1)) is None


def test_fused_dispatcher_drive_matches_manual_loop(setup):
    """drive() — the shared trainer loop driver — must walk the exact same
    (state, losses, step-count) trajectory as the manual
    take_group/prepare/run loop it replaced, including boundary-clipped
    and trailing partial groups."""
    from diffusion_finetuning_tpu.training.train_step import FusedDispatcher

    step_fn, state = setup
    total, spd, save_every = 7, 3, 4  # clips at 3,1(save),3 -> sizes 3,1,3
    all_batches = _batches(total)

    def make_take(stream_batches):
        it = iter(stream_batches)

        def take_group(gs):
            until_save = save_every - (gs % save_every)
            take = min(spd, total - gs, until_save)
            return [b for _, b in zip(range(take), it)]
        return take_group

    # manual reference loop (the pre-refactor trainer mechanics)
    d1 = FusedDispatcher(step_fn, spd=spd)
    tg = make_take(all_batches)
    ref_state, ref_losses, gs = state, [], 0
    rng = jax.random.PRNGKey(5)
    group = tg(gs)
    prepared = d1.prepare(group)
    while gs < total and group:
        rng, key = jax.random.split(rng)
        ref_state, losses = d1.run(ref_state, group, key, prepared=prepared)
        gs += len(group)
        group = tg(gs) if gs < total else []
        prepared = d1.prepare(group)
        ref_losses.extend(np.asarray(losses).tolist())

    d2 = FusedDispatcher(step_fn, spd=spd)
    drv_state, drv_losses, seen = state, [], []
    for drv_state, losses, stepped, gs2 in d2.drive(
            state, jax.random.PRNGKey(5), make_take(all_batches), total):
        drv_losses.extend(np.asarray(losses).tolist())
        seen.append((stepped, gs2))

    assert seen == [(3, 3), (1, 4), (3, 7)]
    np.testing.assert_array_equal(ref_losses, drv_losses)
    assert int(drv_state["step"]) == total
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        ref_state["params"], drv_state["params"])


def test_step_fn_eviction_releases_wrappers():
    """Dropping a step function must free its fused/jit wrappers too.

    The memo dicts live on the function object itself (``_per_fn_cache``);
    a module-level WeakKeyDictionary would be immortal here because the
    cached closures strongly reference their key (the step function).
    """
    import gc
    import weakref

    from diffusion_finetuning_tpu.training.train_step import (
        jit_train_step, multi_step)

    def step_fn(state, batch, rng):
        return {**state, "x": state["x"] + batch.sum()}, {"loss": batch.sum()}

    fused = multi_step(step_fn, 3)
    jitted = jit_train_step(step_fn)
    assert multi_step(step_fn, 3) is fused        # memo hit
    assert jit_train_step(step_fn) is jitted      # memo hit

    refs = [weakref.ref(step_fn), weakref.ref(fused), weakref.ref(jitted)]
    del step_fn, fused, jitted
    gc.collect()
    assert all(r() is None for r in refs), "evicted step fn must free its wrappers"


def test_tensor_parallel_train_step_matches_single_device(setup):
    """TP training (frozen projections split over a ``tp`` axis) must
    reproduce the single-device trajectory up to reduction-order noise.

    The reference has no model-parallel training at all; this is the
    TPU-native path for configs whose activations outgrow one chip
    (parallel.mesh.tp_state_shardings), driven by the trainers'
    ``--tensor_parallel`` flag.
    """
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from diffusion_finetuning_tpu.parallel import mesh as mesh_lib

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    step_fn, state = setup
    k = 2
    batches = [
        jax.tree_util.tree_map(lambda x: np.concatenate([x, x]), b)
        for b in _batches(k)
    ]  # batch 2 -> shards over the 2-wide data axis
    rng = jax.random.PRNGKey(11)
    keys = jax.random.split(rng, k)

    ref_state = state
    jitted = jit_train_step(step_fn)
    ref_losses = []
    for b, key in zip(batches, keys):
        ref_state, m = jitted(
            ref_state, jax.tree_util.tree_map(jnp.asarray, b), key)
        ref_losses.append(float(m["loss"]))

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("data", "tp"))
    sh = mesh_lib.tp_state_shardings(mesh, state)
    n_split = sum(
        1 for s in jax.tree_util.tree_leaves(
            sh["static"], is_leaf=lambda x: isinstance(x, NamedSharding))
        if s.spec != P()
    )
    assert n_split > 0, "tp_state_shardings split nothing — vacuous test"

    tp_step = jit_train_step(step_fn, mesh=mesh, state_shardings=sh)
    st = mesh_lib.shard_tree(state, sh)
    tp_losses = []
    for b, key in zip(batches, keys):
        st, m = tp_step(st, mesh_lib.shard_batch(b, mesh), key)
        tp_losses.append(float(m["loss"]))

    np.testing.assert_allclose(tp_losses, ref_losses, rtol=1e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
        st["params"], ref_state["params"],
    )
    assert int(st["step"]) == k
