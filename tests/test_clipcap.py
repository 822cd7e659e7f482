"""ClipCap tests: mapper parity, top-p filter parity vs the reference's
per-row torch loop, deterministic generation at top_p=0."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from patchioner_tpu.io import torch_port
from patchioner_tpu.models import clipcap, gpt2


class WordTokenizer:
    pad_token_id = 0

    def __init__(self):
        self.vocab, self.rev = {}, {}

    def _id(self, w):
        if w not in self.vocab:
            i = len(self.vocab) + 10
            self.vocab[w] = i
            self.rev[i] = w
        return self.vocab[w]

    def encode(self, text):
        return [self._id(w) for w in text.strip().split(" ") if w]

    def decode(self, ids):
        return " ".join(self.rev.get(int(i), f"<{int(i)}>") for i in ids)


def test_mlp_mapper_matches_torch():
    """Reference MLP((D, 768*L//2, 768*L)) with tanh (decap.py MLP class,
    used by ClipCap at entrypoint.py:433-435)."""
    torch.manual_seed(0)
    D, L, d_model = 24, 3, 16
    m = torch.nn.Sequential(
        torch.nn.Linear(D, (d_model * L) // 2),
        torch.nn.Tanh(),
        torch.nn.Linear((d_model * L) // 2, d_model * L),
    ).eval()
    sd = {
        "clip_project.model.0.weight": m[0].weight,
        "clip_project.model.0.bias": m[0].bias,
        "clip_project.model.2.weight": m[2].weight,
        "clip_project.model.2.bias": m[2].bias,
    }
    cfg = clipcap.ClipCapConfig(prefix_length=L, mapping_type="mlp")
    params = clipcap.port_clipcap(sd, cfg)
    x = np.random.default_rng(0).standard_normal((2, D)).astype(np.float32)
    with torch.no_grad():
        want = m(torch.from_numpy(x)).reshape(2, L, d_model).numpy()
    got = clipcap.mlp_mapper_forward(params["mapper"], jnp.asarray(x), L, d_model)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def oracle_top_p(logits, top_p):
    """Literal reference filter (entrypoint.py:247-262)."""
    logits = torch.from_numpy(logits.copy())
    for i in range(logits.shape[0]):
        sorted_logits, sorted_indices = torch.sort(logits[i], descending=True)
        cum = torch.cumsum(torch.softmax(sorted_logits, dim=-1), dim=-1)
        remove = cum > top_p
        remove[1:] = remove[:-1].clone()
        remove[0] = 0
        logits[i, sorted_indices[remove]] = -float("inf")
    return logits.numpy()


@pytest.mark.parametrize("top_p", [0.0, 0.3, 0.8, 0.99])
def test_nucleus_filter_parity(top_p):
    rng = np.random.default_rng(1)
    logits = rng.standard_normal((4, 50)).astype(np.float32) * 3
    want = oracle_top_p(logits, top_p)
    got = np.asarray(clipcap.nucleus_filter(jnp.asarray(logits), top_p))
    # Same kept/removed mask and identical kept values.
    np.testing.assert_array_equal(np.isinf(got), np.isinf(want))
    np.testing.assert_allclose(
        np.where(np.isinf(got), 0, got), np.where(np.isinf(want), 0, want),
        rtol=1e-6,
    )


@pytest.fixture(scope="module")
def small_model():
    from transformers import GPT2Config, GPT2LMHeadModel

    hf_cfg = GPT2Config(
        vocab_size=211, n_positions=128, n_embd=32, n_layer=2, n_head=2,
        attn_pdrop=0.0, embd_pdrop=0.0, resid_pdrop=0.0,
    )
    torch.manual_seed(2)
    hf = GPT2LMHeadModel(hf_cfg).eval()
    cfg = gpt2.GPT2Config(vocab_size=211, n_positions=128, n_embd=32,
                          n_layer=2, n_head=2)
    return hf, cfg, torch_port.port_hf_gpt2_lmhead(hf.state_dict(), 2)


def test_generate_top_p_zero_matches_greedy(small_model):
    """top_p=0 keeps only the argmax -> generation is deterministic and must
    match a greedy rollout of the same GPT-2."""
    hf, cfg, params = small_model
    tok = WordTokenizer()
    stop_id = tok.encode(".")[0]
    rng = np.random.default_rng(3)
    prefix = rng.standard_normal((2, 3, 32)).astype(np.float32)

    capts = clipcap.generate_batched(
        params, prefix, cfg, tok, entry_length=8, top_p=0.0, stop_token="."
    )
    # greedy oracle with HF
    gen = torch.from_numpy(prefix)
    toks = []
    with torch.no_grad():
        for _ in range(8):
            logits = hf(inputs_embeds=gen).logits[:, -1]
            t = torch.argmax(logits, -1)
            toks.append(t)
            gen = torch.cat([gen, hf.transformer.wte(t)[:, None]], dim=1)
    want_rows = torch.stack(toks, 1).numpy()
    want = [tok.decode(r.tolist()).split(".")[0] + "." for r in want_rows]
    assert capts == want


def test_clipcap_end_to_end(small_model):
    _, cfg, params = small_model
    tok = WordTokenizer()
    ccfg = clipcap.ClipCapConfig(prefix_length=3, entry_length=6, top_p=0.8)
    mapper = clipcap.init_mlp_mapper(jax.random.PRNGKey(0), 16, 3, cfg.n_embd)
    model = clipcap.ClipCap(ccfg, cfg, params, mapper, tok, prefix_size=16)
    feats = np.random.default_rng(4).standard_normal((2, 16)).astype(np.float32)
    capts, scores = model.forward(feats, compute_scores=True)
    assert len(capts) == 2 and len(scores) == 2
    assert all(c.endswith(".") for c in capts)


def test_clipcap_scores_are_inverse_perplexity(small_model):
    """ClipCap compute_scores returns 1/perplexity with a 1.0 fallback
    (reference clipcap entrypoint.py:554-592) — NOT raw perplexity like
    ViECap. Oracle: HF loss on the same tokens."""
    hf, cfg, params = small_model
    tok = WordTokenizer()
    ccfg = clipcap.ClipCapConfig(prefix_length=3, entry_length=6, top_p=0.8)
    mapper = clipcap.init_mlp_mapper(jax.random.PRNGKey(0), 16, 3, cfg.n_embd)
    model = clipcap.ClipCap(ccfg, cfg, params, mapper, tok, prefix_size=16)

    sent = tok.decode([5, 9, 2, 7])
    (score,) = model.compute_perplexity_scores([sent])
    ids = torch.tensor([tok.encode(sent)])
    with torch.no_grad():
        loss = hf(input_ids=ids, labels=ids).loss
    want = 1.0 / float(torch.exp(loss))
    assert abs(score - want) / want < 1e-4, (score, want)
    # <2 tokens -> empty shifted CE (NaN in torch) -> reference's
    # `perplexity > 0` guard falls back to 1.0
    (short,) = model.compute_perplexity_scores([tok.decode([5])])
    assert short == 1.0


def test_clipcap_feature_dim_follows_dinov2_backbone():
    """The reference sizes ClipCap's input by the BACKBONE dim for dinov2
    names, not prefix_size (src/model.py:119-127) — a vits14 backbone with
    a 512 prefix_size must produce a 384-in mapper."""
    from patchioner_tpu.models.patchioner import Patchioner

    cfg = dict(
        prefix_size=512, support_memory_size=0,
        dino_model="dinov2_vits14", crop_dim=28,
        projection_type="coco", normalize=False,
        clipcap=dict(prefix_length=2, clip_length=2, num_layers=1,
                     mapping_type="mlp"),
    )
    m = Patchioner.from_config(cfg, allow_missing_weights=True)
    assert m.clipcap.prefix_size == 384
    assert m.clipcap.mapper_params["fc1"]["w"].shape[0] == 384
