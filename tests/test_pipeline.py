"""Pipeline behaviors: scheduler paths, determinism, patching."""

import jax
import numpy as np
import pytest

from tests.test_cli_tools import _tiny_pipe


@pytest.fixture(scope="module")
def pipe():
    return _tiny_pipe()


def test_txt2img_deterministic_per_seed(pipe):
    a = pipe("a photo", num_inference_steps=2, height=16, width=16,
             seed=3, output_type="np")
    b = pipe("a photo", num_inference_steps=2, height=16, width=16,
             seed=3, output_type="np")
    c = pipe("a photo", num_inference_steps=2, height=16, width=16,
             seed=4, output_type="np")
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 0  # different seed, different image


def test_device_output_pipelining(pipe):
    """output_type='device' returns the on-device uint8 array without a
    host sync, so callers can enqueue generation i+1 behind i and fetch in
    completion order (bench.py / serving do this to hide per-dispatch RPC
    latency). Values must match the synchronous np path exactly."""
    import jax

    ref = pipe("a photo", num_inference_steps=2, height=16, width=16,
               seed=3, output_type="np")
    devs = [pipe("a photo", num_inference_steps=2, height=16, width=16,
                 seed=s, output_type="device") for s in (3, 4)]
    assert all(isinstance(d, jax.Array) for d in devs)
    got = np.asarray(devs[0])
    assert got.dtype == np.uint8
    np.testing.assert_array_equal(got.astype(np.float32) / 255.0, ref)


def test_pndm_scheduler_path(pipe):
    img = pipe("a photo", num_inference_steps=4, height=16, width=16,
               scheduler="pndm", output_type="np")
    assert img.shape == (1, 16, 16, 3) and np.isfinite(img).all()


def test_batch_prompts(pipe):
    imgs = pipe(["a", "b", "c"], num_inference_steps=2, height=16, width=16,
                output_type="np")
    assert imgs.shape == (3, 16, 16, 3)


def test_lora_changes_output_and_scale_zero_restores(pipe):
    from diffusion_finetuning_tpu import lora as L

    base = pipe("a photo", num_inference_steps=2, height=16, width=16,
                seed=0, output_type="np")
    targets = pipe.lora_targets("unet", L.DEFAULT_TARGET_REPLACE)
    rng = np.random.default_rng(0)
    flat = []
    for t in targets:
        flat.append(rng.standard_normal((t.out_features, 2)).astype(np.float32) * 0.2)
        flat.append(rng.standard_normal((2, t.in_features)).astype(np.float32) * 0.2)
    pipe.unet_lora = L.monkeypatch_lora(flat, targets)
    with_lora = pipe("a photo", num_inference_steps=2, height=16, width=16,
                     seed=0, output_type="np")
    assert np.abs(with_lora - base).max() > 0

    pipe.unet_lora = L.tune_lora_scale(pipe.unet_lora, 0.0)
    zeroed = pipe("a photo", num_inference_steps=2, height=16, width=16,
                  seed=0, output_type="np")
    np.testing.assert_allclose(zeroed, base, atol=1e-5)
    pipe.unet_lora = None


def test_materialized_lora_matches_dynamic(pipe):
    """Serving-mode materialization (kernel += scale*up@down folded once)
    must generate the same image as the dynamic per-step LoRA path."""
    from diffusion_finetuning_tpu import lora as L

    targets = pipe.lora_targets("unet", L.DEFAULT_TARGET_REPLACE)
    rng = np.random.default_rng(7)
    flat = []
    for t in targets:
        flat.append(rng.standard_normal((t.out_features, 2)).astype(np.float32) * 0.2)
        flat.append(rng.standard_normal((2, t.in_features)).astype(np.float32) * 0.2)
    pipe.unet_lora = L.monkeypatch_lora(flat, targets)
    try:
        pipe.materialize_lora = True
        merged_img = pipe("a photo", num_inference_steps=2, height=16, width=16,
                          seed=0, output_type="np")
        pipe.materialize_lora = False
        dynamic_img = pipe("a photo", num_inference_steps=2, height=16,
                           width=16, seed=0, output_type="np")
    finally:
        pipe.materialize_lora = True
        pipe.unet_lora = None
    np.testing.assert_allclose(merged_img, dynamic_img, atol=2e-2)
    # uint8-quantized pixels should almost all agree exactly
    assert (merged_img == dynamic_img).mean() > 0.99


def test_scale_sweep_retains_one_merged_tree(pipe):
    """Hot-swap/scale-sweep loops must not accumulate superseded merged
    trees: each merged SD1.5 UNet is ~1.7 GB bf16 on device, so routing
    the pipe-installed trees through the adapter LRU (capacity 8) would
    OOM a 16 GB v5e.  Installed trees get a single slot per model;
    explicit adapter trees keep the LRU (bounded)."""
    from diffusion_finetuning_tpu import lora as L
    from diffusion_finetuning_tpu.pipelines import pipeline as P

    targets = pipe.lora_targets("unet", L.DEFAULT_TARGET_REPLACE)
    rng = np.random.default_rng(3)
    flat = []
    for t in targets:
        flat.append(rng.standard_normal((t.out_features, 1)).astype(np.float32) * 0.2)
        flat.append(rng.standard_normal((1, t.in_features)).astype(np.float32) * 0.2)
    pipe.unet_lora = L.monkeypatch_lora(flat, targets, r=1)
    try:
        assert pipe.materialize_lora
        for i in range(P.MERGED_LORA_CACHE_SIZE + 3):
            P.tune_lora_scale_pipe(pipe, 0.1 * i, which="unet")
            pipe._generation_params()  # triggers the merge
            assert len(pipe._merged_current) == 1  # only the current unet
            assert len(pipe._merged_cache) == 0    # LRU is adapter-only
        # explicit adapter trees land in the LRU and stay bounded
        for i in range(P.MERGED_LORA_CACHE_SIZE + 3):
            adapter = L.tune_lora_scale(pipe.unet_lora, 0.01 * i)
            pipe.adapter_generation_params(unet_lora=adapter)
            assert len(pipe._merged_cache) <= P.MERGED_LORA_CACHE_SIZE
        assert len(pipe._merged_current) == 1
    finally:
        pipe.unet_lora = None
        pipe.invalidate_merged_cache()


def test_stale_adapter_table_rejects_new_ti_token():
    """A TI token registered AFTER an adapter's text tree was built must
    raise, not silently clamp the embedding gather inside the jit: the
    tokenizer vocabulary is shared across tenants, embedding rows are not
    (scripts/serve.py POST /adapters on a live server)."""
    from diffusion_finetuning_tpu.pipelines.pipeline import (
        apply_learned_embed_in_clip)
    from tests.test_cli_tools import _tiny_pipe

    pipe = _tiny_pipe()
    # the tiny fixture's table has slack rows (cfg vocab 1000 > tokenizer
    # 521); production tables are sized exactly to the vocab — mirror that
    emb = pipe.text_params["token_embedding"]["embedding"]
    pipe.text_params = {
        **pipe.text_params,
        "token_embedding": {"embedding": emb[: len(pipe.tokenizer)]},
    }
    stale = pipe.adapter_generation_params()  # table snapshot, pre-token
    emb_dim = pipe.text_params["token_embedding"]["embedding"].shape[1]
    new_params, tok = apply_learned_embed_in_clip(
        {"<r4tok>": np.ones((emb_dim,), np.float32) * 0.01},
        pipe.text_params, pipe.tokenizer)
    pipe.text_params = new_params
    kw = dict(num_inference_steps=2, height=16, width=16, seed=0,
              output_type="np")
    pipe(f"a photo of {tok}", **kw)  # fresh table: fine
    with pytest.raises(ValueError, match="embedding table"):
        pipe(f"a photo of {tok}", adapter_params=stale, **kw)


def test_materialize_lora_tree_matches_weight_apply_lora(pipe):
    """Device-side merge == reference-semantics host merge (lora.py:410-424)."""
    import jax.numpy as jnp
    from diffusion_finetuning_tpu import lora as L

    # extended targets include conv pairs -> covers both delta layouts
    targets = pipe.lora_targets("unet", L.UNET_EXTENDED_TARGET_REPLACE)
    assert any(t.is_conv for t in targets)
    rng = np.random.default_rng(3)
    flat = []
    for t in targets:
        if t.is_conv:
            kh, kw = t.kernel_size
            flat.append(rng.standard_normal(
                (t.out_features, 2, 1, 1)).astype(np.float32))
            flat.append(rng.standard_normal(
                (2, t.in_features, kh, kw)).astype(np.float32))
        else:
            flat.append(rng.standard_normal(
                (t.out_features, 2)).astype(np.float32))
            flat.append(rng.standard_normal(
                (2, t.in_features)).astype(np.float32))
    tree = L.monkeypatch_lora(flat, targets)
    merged_dev = L.materialize_lora_tree(pipe.unet_params, tree)
    merged_host = L.weight_apply_lora(pipe.unet_params, flat, targets, alpha=1.0)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=1e-5, rtol=1e-5),
        merged_dev, merged_host,
    )


def test_img2img_multi_prompt(pipe):
    img = pipe.img2img(["a", "b"], np.zeros((16, 16, 3), np.uint8),
                       num_inference_steps=3, output_type="np")
    assert img.shape == (2, 16, 16, 3)
    assert np.isfinite(img).all()


def test_img2img_sigma_space_schedulers(pipe):
    """img2img accepts every sampler: sigma-space (truncated-grid restart),
    dpm (fresh sub-grid solve), and pndm (diffusers-style counter-based
    mid-grid PLMS warmup)."""
    init = (np.full((16, 16, 3), 128, np.uint8))
    a = pipe.img2img("a photo", init, num_inference_steps=4, strength=0.6,
                     scheduler="euler", output_type="np")
    b = pipe.img2img("a photo", init, num_inference_steps=4, strength=0.6,
                     scheduler="lms:karras", output_type="np")
    c = pipe.img2img("a photo", init, num_inference_steps=4, strength=0.6,
                     scheduler="dpm", output_type="np")
    d = pipe.img2img("a photo", init, num_inference_steps=4, strength=0.6,
                     scheduler="pndm", output_type="np")
    for img in (a, b, c, d):
        assert img.shape == (1, 16, 16, 3) and np.isfinite(img).all()
    assert np.abs(d - c).max() > 0  # pndm is a real, distinct sampler
    with pytest.raises(ValueError):
        pipe.img2img("a photo", init, num_inference_steps=4,
                     scheduler="euler:bogus", output_type="np")
    with pytest.raises(ValueError, match="karras"):
        pipe.img2img("a photo", init, num_inference_steps=4,
                     scheduler="dpm:karras", output_type="np")


def test_sharded_generation_matches_single_device(pipe):
    """Data-parallel generation over a mesh must produce the same images as
    single-device dispatch (same per-seed latents, batch sharded over the
    data axis, params replicated)."""
    from diffusion_finetuning_tpu.parallel import mesh as mesh_lib

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    prompts = ["a", "b", "c", "d"]
    single = pipe(prompts, num_inference_steps=2, height=16, width=16,
                  seed=0, output_type="np")
    mesh = mesh_lib.make_mesh(4)
    try:
        pipe.shard_over(mesh)
        sharded = pipe(prompts, num_inference_steps=2, height=16, width=16,
                       seed=0, output_type="np")
        with pytest.raises(ValueError):
            pipe(["a", "b", "c"], num_inference_steps=2, height=16, width=16)

        # patching a LoRA AFTER shard_over: materialized tree must land
        # replicated on the mesh and generation must still work
        from diffusion_finetuning_tpu import lora as L

        targets = pipe.lora_targets("unet", L.DEFAULT_TARGET_REPLACE)
        rng = np.random.default_rng(1)
        flat = []
        for t in targets:
            flat.append(rng.standard_normal(
                (t.out_features, 1)).astype(np.float32) * 0.3)
            flat.append(rng.standard_normal(
                (1, t.in_features)).astype(np.float32) * 0.3)
        pipe.unet_lora = L.monkeypatch_lora(flat, targets, r=1)
        patched = pipe(prompts, num_inference_steps=2, height=16, width=16,
                       seed=0, output_type="np")
        assert np.abs(patched - sharded).max() > 0
        merged = pipe._merged_current["unet"][2]
        leaf = jax.tree_util.tree_leaves(merged)[0]
        assert len(leaf.sharding.device_set) == 4  # replicated on the mesh
        pipe.unet_lora = None
    finally:
        pipe.shard_over(None)
    np.testing.assert_allclose(sharded, single, atol=1e-5)


def test_cast_params_storage_dtype(pipe):
    """cast_params casts float leaves only; compute-dtype casting makes this
    numerically identical for bf16 pipelines (verified end-to-end on tiny
    models: uint8 outputs match exactly)."""
    import jax.numpy as jnp
    from tests.test_cli_tools import _tiny_pipe

    p2 = _tiny_pipe()
    out = p2.cast_params(jnp.bfloat16)
    assert out is p2  # chainable
    leaves = jax.tree_util.tree_leaves(p2.unet_params)
    assert leaves and all(l.dtype == jnp.bfloat16 for l in leaves
                          if jnp.issubdtype(l.dtype, jnp.floating))
    assert all(l.dtype == jnp.bfloat16
               for l in jax.tree_util.tree_leaves(p2.text_params)
               if jnp.issubdtype(l.dtype, jnp.floating))


def test_euler_scheduler_paths(pipe):
    img = pipe("a photo", num_inference_steps=4, height=16, width=16,
               scheduler="euler", output_type="np")
    assert img.shape == (1, 16, 16, 3) and np.isfinite(img).all()
    img_a = pipe("a photo", num_inference_steps=4, height=16, width=16,
                 scheduler="euler_a", output_type="np")
    assert img_a.shape == (1, 16, 16, 3) and np.isfinite(img_a).all()
    # stochastic path actually diverges from the deterministic one
    assert np.abs(img.astype(np.int32) - img_a.astype(np.int32)).max() > 0


def test_lms_and_karras_scheduler_paths(pipe):
    img = pipe("a photo", num_inference_steps=4, height=16, width=16,
               scheduler="lms", output_type="np")
    assert img.shape == (1, 16, 16, 3) and np.isfinite(img).all()
    img_k = pipe("a photo", num_inference_steps=4, height=16, width=16,
                 scheduler="euler:karras", output_type="np")
    assert img_k.shape == (1, 16, 16, 3) and np.isfinite(img_k).all()
    with pytest.raises(ValueError):
        pipe("a photo", num_inference_steps=4, height=16, width=16,
             scheduler="ddim:karras", output_type="np")


def test_euler_a_seed_determinism_across_batch_position(pipe):
    """euler_a noise streams are keyed per seed: the same (prompt, seed)
    renders identically regardless of batch position (serving invariant)."""
    ab = pipe(["a photo", "a photo"], num_inference_steps=3, height=16,
              width=16, seed=[5, 9], scheduler="euler_a", output_type="np")
    ba = pipe(["a photo", "a photo"], num_inference_steps=3, height=16,
              width=16, seed=[9, 5], scheduler="euler_a", output_type="np")
    np.testing.assert_array_equal(ab[0], ba[1])
    np.testing.assert_array_equal(ab[1], ba[0])


def test_tensor_parallel_generation_matches_single_device(pipe):
    """A ("data", "tp") mesh splits the UNet attention/MLP projections
    Megatron-style (parallel.mesh.tp_shardings); generation must match the
    single-device images up to collective reassociation."""
    from jax.sharding import Mesh
    from diffusion_finetuning_tpu.parallel import mesh as mesh_lib

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    prompts = ["a", "b"]
    single = pipe(prompts, num_inference_steps=2, height=16, width=16,
                  seed=0, output_type="np")
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("data", "tp"))
    try:
        pipe.shard_over(mesh)
        # the placement actually split projections (not silently replicated)
        specs = {leaf.spec
                 for leaf in jax.tree_util.tree_leaves(pipe._unet_shardings)}
        from jax.sharding import PartitionSpec as P

        assert P(None, "tp") in specs and P("tp", None) in specs
        tp_imgs = pipe(prompts, num_inference_steps=2, height=16, width=16,
                       seed=0, output_type="np")
    finally:
        pipe.shard_over(None)
    # fp32 on CPU; the per-sub-block all-reduce reassociates sums
    np.testing.assert_allclose(tp_imgs, single, atol=2e-3)
    # back on one device: plain jit path, same images again
    again = pipe(prompts, num_inference_steps=2, height=16, width=16,
                 seed=0, output_type="np")
    np.testing.assert_allclose(again, single, atol=1e-6)
