"""Micro-batching generation server: coalescing, padding, fan-out, errors."""

import threading

import numpy as np
import pytest

from diffusion_finetuning_tpu.serving import GenerationServer
from tests.test_cli_tools import _tiny_pipe


@pytest.fixture(scope="module")
def pipe():
    return _tiny_pipe()


def test_server_single_and_concurrent(pipe):
    calls = []
    orig = pipe.__class__.__call__

    def spy(self, prompt, **kw):
        calls.append(len(prompt) if isinstance(prompt, list) else 1)
        return orig(self, prompt, **kw)

    pipe.__class__.__call__ = spy
    try:
        server = GenerationServer(pipe, max_batch=4, max_wait_ms=200)
        kw = dict(height=16, width=16, steps=2, scheduler="ddim")
        img = server.generate("a", **kw)
        assert img.size == (16, 16)

        # concurrent submits coalesce into one batched call
        futures = [server.submit(p, **kw) for p in ("x", "y", "z")]
        imgs = [f.result(timeout=120) for f in futures]
        assert all(im.size == (16, 16) for im in imgs)
        assert max(calls) >= 2  # at least one real batch happened
        server.close()
    finally:
        pipe.__class__.__call__ = orig


def test_partial_batch_splits_down_ladder_not_padded(pipe):
    """3 coalesced requests on a [1,2,4] ladder must dispatch as 2+1, never
    as a padded batch of 4: a padded slot costs a full image of device time,
    an extra pipelined dispatch ~25 ms (serving ladder table, PARITY.md)."""
    calls = []
    orig = pipe.__class__.__call__

    def spy(self, prompt, **kw):
        calls.append(len(prompt) if isinstance(prompt, list) else 1)
        return orig(self, prompt, **kw)

    pipe.__class__.__call__ = spy
    try:
        server = GenerationServer(pipe, max_batch=4, max_wait_ms=500)
        kw = dict(height=16, width=16, steps=2, scheduler="ddim")
        futs = [server.submit(p, seed=i, **kw)
                for i, p in enumerate("abc")]
        imgs = [f.result(timeout=300) for f in futs]
        assert all(im.size == (16, 16) for im in imgs)
        # the 500 ms coalescing window collects all 3 into one partial
        # batch, which must split into a 2-dispatch and a 1-dispatch
        assert calls == [2, 1], calls
        server.close()
    finally:
        pipe.__class__.__call__ = orig


def test_server_propagates_errors(pipe):
    server = GenerationServer(pipe, max_batch=2, max_wait_ms=10)
    fut = server.submit("a", height=7, width=7, steps=1)  # invalid size
    with pytest.raises(Exception):
        fut.result(timeout=120)
    server.close()


def test_server_per_request_seeds_differ(pipe):
    """Coalesced requests with different seeds must get different images."""
    server = GenerationServer(pipe, max_batch=4, max_wait_ms=200)
    kw = dict(height=16, width=16, steps=2, scheduler="ddim")
    f1 = server.submit("same prompt", seed=1, **kw)
    f2 = server.submit("same prompt", seed=2, **kw)
    f3 = server.submit("same prompt", seed=1, **kw)
    a, b, c = (np.asarray(f.result(timeout=180)) for f in (f1, f2, f3))
    assert np.abs(a.astype(int) - b.astype(int)).max() > 0  # different seeds
    np.testing.assert_array_equal(a, c)  # same seed reproducible
    server.close()


def test_server_close_fails_pending(pipe):
    server = GenerationServer(pipe, max_batch=2, max_wait_ms=10)
    server._stop.set()  # freeze worker loop exit
    fut = None
    try:
        fut = server.submit("x", height=16, width=16, steps=1)
    except RuntimeError:
        fut = None  # submit-after-close is also acceptable behavior
    server.close()
    if fut is not None:
        with pytest.raises(Exception):
            fut.result(timeout=5)


def test_server_over_mesh_rounds_ladder_and_serves(pipe):
    """Multi-chip serving: a sharded pipeline forces mesh-multiple batch
    sizes; single requests pad up and still return correct images."""
    import jax
    from diffusion_finetuning_tpu.parallel import mesh as mesh_lib

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    mesh = mesh_lib.make_mesh(4)
    pipe.shard_over(mesh)
    try:
        server = GenerationServer(pipe, max_batch=6, max_wait_ms=50,
                                  allowed_batches=[1, 2, 6])
        assert server.allowed_batches == [4, 8]
        assert server.max_batch == 8
        kw = dict(height=16, width=16, steps=2, scheduler="ddim")
        img = server.generate("a", **kw)  # 1 request -> padded to batch 4
        assert img.size == (16, 16)
        futs = [server.submit(p, seed=i, **kw)
                for i, p in enumerate("abcde")]
        imgs = [f.result(timeout=300) for f in futs]
        assert all(im.size == (16, 16) for im in imgs)
        server.close()
    finally:
        pipe.shard_over(None)


def test_cancelled_future_does_not_poison_batch(pipe):
    """A caller-cancelled future must not deliver InvalidStateError to the
    other requests coalesced into the same device batch."""
    server = GenerationServer(pipe, max_batch=4, max_wait_ms=300)
    kw = dict(height=16, width=16, steps=2, scheduler="ddim")
    f1 = server.submit("a", **kw)
    f2 = server.submit("b", **kw)
    f1.cancel()  # futures are never set running, so cancel() succeeds
    img = f2.result(timeout=300)
    assert img.size == (16, 16)
    server.close()


def test_submit_after_close_raises_not_hangs(pipe):
    server = GenerationServer(pipe, max_batch=2, max_wait_ms=5)
    server.close()
    with pytest.raises(RuntimeError):
        server.submit("a", height=16, width=16, steps=1)


def test_hot_swap_is_atomic(tmp_path):
    """Hammer GenerationServer while patch_pipe swaps between two LoRAs:
    every image must match one generated from a SINGLE (params, lora)
    snapshot — never a mix (e.g. new UNet LoRA + stale text LoRA).
    Regression test for the swap lock in pipelines.pipeline."""
    import jax
    import jax.numpy as jnp

    from diffusion_finetuning_tpu import lora as L
    from diffusion_finetuning_tpu.pipelines.pipeline import patch_pipe
    from tests.test_cli_tools import _tiny_pipe

    pipe = _tiny_pipe()
    unet_targets = pipe.lora_targets("unet", L.DEFAULT_TARGET_REPLACE)
    text_targets = pipe.lora_targets(
        "text_encoder", L.TEXT_ENCODER_DEFAULT_TARGET_REPLACE)

    def random_lora(targets, seed):
        tree = L.inject_trainable_lora(targets, jax.random.PRNGKey(seed), r=1)

        def rnd(path, leaf):
            name = path[-1].key
            if name == "scale":
                return leaf
            k = jax.random.fold_in(jax.random.PRNGKey(seed), hash(
                jax.tree_util.keystr(path)) % (2**31))
            return 0.3 * jax.random.normal(k, leaf.shape, leaf.dtype)

        return jax.tree_util.tree_map_with_path(rnd, tree)

    paths = []
    for seed in (1, 2):
        p = str(tmp_path / f"lora_{seed}.safetensors")
        L.save_all(random_lora(unet_targets, seed),
                   random_lora(text_targets, 100 + seed),
                   unet_targets, text_targets, None, p)
        paths.append(p)

    kw = dict(height=16, width=16, num_inference_steps=2, scheduler="ddim",
              seed=7, output_type="np")

    refs = []
    for p in paths:
        patch_pipe(pipe, p, patch_unet=True, patch_text=True)
        refs.append(np.asarray(pipe("a photo", **kw)))
    # the two LoRAs must actually produce different images for the test to
    # mean anything
    assert np.abs(refs[0] - refs[1]).max() > 0

    stop = threading.Event()

    def patcher():
        i = 0
        while not stop.is_set():
            patch_pipe(pipe, paths[i % 2], patch_unet=True, patch_text=True)
            i += 1

    t = threading.Thread(target=patcher, daemon=True)
    t.start()
    try:
        mixed = []
        for trial in range(12):
            img = np.asarray(pipe("a photo", **kw))
            ok_a = np.array_equal(img, refs[0])
            ok_b = np.array_equal(img, refs[1])
            if not (ok_a or ok_b):
                mixed.append(trial)
        assert not mixed, f"mixed-snapshot generations at trials {mixed}"
    finally:
        stop.set()
        t.join(timeout=10)


def _random_lora(targets, seed, r=1):
    import jax

    from diffusion_finetuning_tpu import lora as L

    tree = L.inject_trainable_lora(targets, jax.random.PRNGKey(seed), r=r)

    def rnd(path, leaf):
        if path[-1].key == "scale":
            return leaf
        k = jax.random.fold_in(jax.random.PRNGKey(seed), hash(
            jax.tree_util.keystr(path)) % (2**31))
        return 0.3 * jax.random.normal(k, leaf.shape, leaf.dtype)

    import jax.tree_util as jtu

    return jtu.tree_map_with_path(rnd, tree)


def test_multi_tenant_adapters_hammer(tmp_path):
    """Multi-tenant LoRA serving: N threads submitting across 3 registered
    adapters, concurrently with a patch loop mutating the pipe's default
    LoRA state — every image must match its adapter's single-threaded
    output (adapters route through explicit trees, never pipe attrs)."""
    import jax

    from diffusion_finetuning_tpu import lora as L
    from diffusion_finetuning_tpu.pipelines.pipeline import (
        build_adapter, patch_pipe)
    from tests.test_cli_tools import _tiny_pipe

    pipe = _tiny_pipe()
    unet_targets = pipe.lora_targets("unet", L.DEFAULT_TARGET_REPLACE)
    text_targets = pipe.lora_targets(
        "text_encoder", L.TEXT_ENCODER_DEFAULT_TARGET_REPLACE)

    names, paths = [], []
    for seed in (1, 2, 3):
        p = str(tmp_path / f"adapter_{seed}.safetensors")
        L.save_all(_random_lora(unet_targets, seed),
                   _random_lora(text_targets, 100 + seed),
                   unet_targets, text_targets, None, p)
        names.append(f"tenant{seed}")
        paths.append(p)
    # two extra LoRAs for the concurrent default-state patch loop
    churn = []
    for seed in (8, 9):
        p = str(tmp_path / f"churn_{seed}.safetensors")
        L.save_all(_random_lora(unet_targets, seed),
                   _random_lora(text_targets, 100 + seed),
                   unet_targets, text_targets, None, p)
        churn.append(p)

    server = GenerationServer(pipe, max_batch=4, max_wait_ms=30)
    trees = {}
    for name, p in zip(names, paths):
        trees[name] = build_adapter(pipe, p)
        server.register_adapter(name, trees[name])

    kw = dict(height=16, width=16, steps=2, scheduler="ddim")
    pipe_kw = dict(height=16, width=16, num_inference_steps=2,
                   scheduler="ddim", output_type="np")

    # single-threaded goldens per (adapter, seed), through the same
    # explicit-tree path the server uses
    golden = {}
    for name in names:
        ap = pipe.adapter_generation_params(
            unet_lora=trees[name].get("unet_lora"),
            text_lora=trees[name].get("text_encoder_lora"))
        for seed in range(3):
            golden[(name, seed)] = np.asarray(
                pipe("a photo", seed=seed, adapter_params=ap, **pipe_kw))[0]
    # adapters must actually differ for the test to mean anything
    assert np.abs(golden[(names[0], 0)] - golden[(names[1], 0)]).max() > 0
    assert np.abs(golden[(names[1], 0)] - golden[(names[2], 0)]).max() > 0

    stop = threading.Event()

    def patcher():
        i = 0
        while not stop.is_set():
            patch_pipe(pipe, churn[i % 2], patch_unet=True, patch_text=True)
            i += 1

    t = threading.Thread(target=patcher, daemon=True)
    t.start()
    try:
        futs = []
        def submitter(name):
            for seed in range(3):
                futs.append(
                    ((name, seed),
                     server.submit("a photo", seed=seed, adapter=name, **kw)))

        threads = [threading.Thread(target=submitter, args=(n,))
                   for n in names]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        for key, fut in futs:
            img = np.asarray(fut.result(timeout=300)).astype(np.float32) / 255.0
            ref = golden[key]
            # goldens are float [0,1]; server returns PIL uint8 — compare
            # at uint8 resolution.  Tolerance 1 level: goldens run batch-1
            # while the server coalesces into batch-2/4 executables, and a
            # float sitting on a quantization boundary can flip one level
            # between the two programs (observed ~1/10 runs).  A WRONG
            # adapter differs grossly (asserted below), so 1 level keeps
            # full routing-detection power.
            ref8 = (ref * 255).round()
            img8 = (img * 255).round()
            assert np.abs(img8 - ref8).max() <= 1, f"adapter mismatch for {key}"
            others = [np.abs(img8 - (golden[(n, key[1])] * 255).round()).max()
                      for n in names if n != key[0]]
            assert min(others) > 1, f"adapters indistinguishable at {key}"
    finally:
        stop.set()
        t.join(timeout=10)
        server.close()

    # unknown adapter rejected at submit time
    with pytest.raises(KeyError):
        server2 = GenerationServer(pipe, max_batch=2, max_wait_ms=5)
        try:
            server2.submit("x", adapter="nope", **kw)
        finally:
            server2.close()


def test_adapter_eviction_under_pressure(monkeypatch):
    """More registered adapters than the merged-LoRA LRU holds: requests
    keep routing to the RIGHT adapter while the cache stays bounded —
    evicted adapters silently re-merge on their next request (the HBM
    ceiling is the cap × ~1.7 GB per merged SD1.5 UNet; the cap itself is
    pinned on the real chip by scripts/probe_adapter_capacity.py)."""
    import jax

    from diffusion_finetuning_tpu import lora as L
    from diffusion_finetuning_tpu.pipelines import pipeline as P
    from tests.test_cli_tools import _tiny_pipe

    monkeypatch.setattr(P, "MERGED_LORA_CACHE_SIZE", 2)
    pipe = _tiny_pipe()
    unet_targets = pipe.lora_targets("unet", L.DEFAULT_TARGET_REPLACE)

    names = [f"tenant{s}" for s in range(5)]  # 5 adapters, capacity 2
    trees = {n: {"unet_lora": _random_lora(unet_targets, 10 + i)}
             for i, n in enumerate(names)}

    pipe_kw = dict(height=16, width=16, num_inference_steps=2,
                   scheduler="ddim", output_type="np")
    golden = {}
    for n in names:
        ap = pipe.adapter_generation_params(unet_lora=trees[n]["unet_lora"])
        golden[n] = (np.asarray(
            pipe("a photo", seed=0, adapter_params=ap, **pipe_kw))[0]
            * 255).round()
        assert len(pipe._merged_cache) <= 2
    # adapters must actually differ for routing checks to mean anything
    assert np.abs(golden[names[0]] - golden[names[1]]).max() > 1

    server = GenerationServer(pipe, max_batch=2, max_wait_ms=10)
    for n in names:
        server.register_adapter(n, trees[n])
    kw = dict(height=16, width=16, steps=2, scheduler="ddim")
    try:
        # hammer: 3 passes over all adapters (every pass after the first
        # re-requests evicted ones), interleaved submission order
        futs = [(n, server.submit("a photo", seed=0, adapter=n, **kw))
                for _ in range(3) for n in names]
        for n, f in futs:
            img8 = (np.asarray(f.result(timeout=300), dtype=np.float32))
            assert np.abs(img8 - golden[n]).max() <= 1, f"wrong tree for {n}"
            others = [np.abs(img8 - golden[m]).max()
                      for m in names if m != n]
            assert min(others) > 1, f"adapters indistinguishable at {n}"
    finally:
        server.close()
    assert len(pipe._merged_cache) <= 2  # bounded through all re-merges


def test_server_over_tensor_parallel_mesh(pipe):
    """Serving on a (data, tp) mesh: the ladder rounds to the data axis only
    and generation matches the single-device images (tp splits the UNet
    projections, not the batch)."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    kw = dict(height=16, width=16, steps=2, scheduler="ddim")
    ref_server = GenerationServer(pipe, max_batch=2, max_wait_ms=50,
                                  allowed_batches=[2])
    futs = [ref_server.submit(p, seed=i, **kw) for i, p in enumerate("ab")]
    ref = [np.asarray(f.result(timeout=300)) for f in futs]
    ref_server.close()

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("data", "tp"))
    pipe.shard_over(mesh)
    try:
        server = GenerationServer(pipe, max_batch=2, max_wait_ms=50,
                                  allowed_batches=[2])
        assert server.allowed_batches == [2]  # rounds to data axis (2), not 4
        futs = [server.submit(p, seed=i, **kw) for i, p in enumerate("ab")]
        imgs = [np.asarray(f.result(timeout=300)) for f in futs]
        server.close()
    finally:
        pipe.shard_over(None)
    for a, b in zip(imgs, ref):
        assert np.abs(a.astype(int) - b.astype(int)).max() <= 1  # uint8 ties
