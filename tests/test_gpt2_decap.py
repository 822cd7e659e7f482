"""GPT-2 + DeCap decode parity vs transformers GPT2LMHeadModel (random init).

The oracle greedy loop mirrors the reference `decoding_batched` exactly
(src/decap/decap.py:116-183): full-context re-forward each step, argmax of
softmax, scores = exp(sum of chosen-token log-probs over all steps).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from patchioner_tpu.io import torch_port
from patchioner_tpu.models import decap, gpt2


def make_hf_gpt2(n_layer=2, n_head=4, n_embd=64, vocab=257):
    from transformers import GPT2Config, GPT2LMHeadModel

    cfg = GPT2Config(
        vocab_size=vocab,
        n_positions=64,
        n_embd=n_embd,
        n_layer=n_layer,
        n_head=n_head,
        attn_pdrop=0.0,
        embd_pdrop=0.0,
        resid_pdrop=0.0,
    )
    torch.manual_seed(0)
    return GPT2LMHeadModel(cfg).eval(), cfg


@pytest.fixture(scope="module")
def models():
    hf, hf_cfg = make_hf_gpt2()
    cfg = gpt2.GPT2Config(
        vocab_size=hf_cfg.vocab_size,
        n_positions=hf_cfg.n_positions,
        n_embd=hf_cfg.n_embd,
        n_layer=hf_cfg.n_layer,
        n_head=hf_cfg.n_head,
    )
    params = torch_port.port_hf_gpt2_lmhead(hf.state_dict(), cfg.n_layer)
    return hf, cfg, params


def test_forward_parity(models):
    hf, cfg, params = models
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((2, 7, cfg.n_embd)).astype(np.float32)
    with torch.no_grad():
        want = hf(inputs_embeds=torch.from_numpy(emb)).logits.numpy()
    got = gpt2.gpt2_forward(params, jnp.asarray(emb), cfg)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_step_cache_matches_full_forward(models):
    _, cfg, params = models
    rng = np.random.default_rng(1)
    emb = rng.standard_normal((3, 5, cfg.n_embd)).astype(np.float32)
    full = np.asarray(gpt2.gpt2_forward(params, jnp.asarray(emb), cfg))
    cache = gpt2.init_kv_cache(cfg, 3, 8)
    outs = []
    for t in range(5):
        logits, cache = gpt2.gpt2_step(params, jnp.asarray(emb[:, t]), cache, cfg)
        outs.append(np.asarray(logits))
    np.testing.assert_allclose(np.stack(outs, 1), full, rtol=2e-4, atol=2e-4)


def oracle_decoding_batched(hf, clip_w, clip_b, features, entry_length=12):
    """Literal reference greedy loop (no KV cache, full re-forward)."""
    f = torch.from_numpy(features)
    emb = (f @ torch.from_numpy(clip_w) + torch.from_numpy(clip_b)).view(
        f.shape[0], 1, -1
    )
    tokens, seq_lp = None, None
    with torch.no_grad():
        for _ in range(entry_length):
            logits = hf(inputs_embeds=emb).logits[:, -1, :]
            probs = torch.softmax(logits, -1)
            log_probs = torch.log(probs)
            tok = torch.argmax(probs, -1).unsqueeze(1)
            tok_emb = hf.transformer.wte(tok)
            if tokens is None:
                tokens, seq_lp = tok, log_probs.gather(1, tok)
            else:
                tokens = torch.cat((tokens, tok), dim=1)
                seq_lp = torch.cat((seq_lp, log_probs.gather(1, tok)), dim=1)
            emb = torch.cat((emb, tok_emb), dim=1)
    return tokens.numpy(), torch.exp(seq_lp.sum(-1)).numpy()


def test_greedy_decode_parity(models):
    hf, cfg, params = models
    rng = np.random.default_rng(2)
    prefix_size = 32
    clip_w = (rng.standard_normal((prefix_size, cfg.n_embd)) * 0.3).astype(np.float32)
    clip_b = rng.standard_normal((cfg.n_embd,)).astype(np.float32) * 0.1
    feats = rng.standard_normal((4, prefix_size)).astype(np.float32)

    want_toks, want_scores = oracle_decoding_batched(hf, clip_w, clip_b, feats)

    dp = decap.DecapParams(gpt2=params, clip_project={"w": clip_w, "b": clip_b})
    toks, scores = decap.greedy_decode(dp, jnp.asarray(feats), cfg, n_steps=12)
    np.testing.assert_array_equal(np.asarray(toks), want_toks)
    np.testing.assert_allclose(np.asarray(scores), want_scores, rtol=2e-3, atol=1e-5)


def test_decap_checkpoint_port():
    """Port a synthetic torch DeCap state dict (decoder.* + clip_project.*)."""
    hf, hf_cfg = make_hf_gpt2()
    sd = {f"decoder.{k}": v for k, v in hf.state_dict().items()}
    lin = torch.nn.Linear(32, hf_cfg.n_embd)
    sd["clip_project.model.0.weight"] = lin.weight
    sd["clip_project.model.0.bias"] = lin.bias
    ported = torch_port.port_decap(sd, n_layer=hf_cfg.n_layer)
    assert ported["clip_project"]["w"].shape == (32, hf_cfg.n_embd)
    assert ported["gpt2"]["wte"].shape == (hf_cfg.vocab_size, hf_cfg.n_embd)
