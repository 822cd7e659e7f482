"""MeaCap tests: memory retrieval, concept fallback, end-to-end decode."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from patchioner_tpu.io import torch_port
from patchioner_tpu.models import gpt2, meacap, viecap


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


def test_memory_retrieval_order():
    rng = np.random.default_rng(0)
    mem = rng.standard_normal((20, 16)).astype(np.float32)
    f = mem[[3, 7]] * 2.0  # exactly aligned with rows 3 and 7
    idx = meacap.retrieve_memory_captions(jnp.asarray(f), jnp.asarray(mem), 3)
    assert idx[0, 0] == 3 and idx[1, 0] == 7


def test_frequency_concept_extractor():
    caps = [
        "a dog runs in the park",
        "the dog chases a ball in the park",
        "a brown dog with a ball",
    ]
    concepts = meacap.frequency_concept_extractor(caps)
    assert concepts[0] == "dog"
    assert "ball" in concepts and "park" in concepts
    assert len(concepts) <= 4
    assert "the" not in concepts


def test_meacap_end_to_end():
    from transformers import GPT2Config, GPT2LMHeadModel

    hf_cfg = GPT2Config(
        vocab_size=211, n_positions=128, n_embd=32, n_layer=2, n_head=2,
        attn_pdrop=0.0, embd_pdrop=0.0, resid_pdrop=0.0,
    )
    torch.manual_seed(0)
    hf = GPT2LMHeadModel(hf_cfg).eval()
    cfg = gpt2.GPT2Config(vocab_size=211, n_positions=128, n_embd=32,
                          n_layer=2, n_head=2)
    params = torch_port.port_hf_gpt2_lmhead(hf.state_dict(), 2)

    vcfg = viecap.ViecapConfig(
        continuous_prompt_length=3, clip_project_length=2, clip_hidden_size=16,
        num_layers=1, num_heads=2, using_hard_prompt=True,
        using_greedy_search=False, beam_width=3, max_len=6,
    )
    mp = viecap.init_mapping_network(jax.random.PRNGKey(0), vcfg, cfg.n_embd)
    rng = np.random.default_rng(1)
    model = meacap.MeaCap(
        vcfg, cfg, params, mp,
        memory_captions=[f"caption about thing {i} here" for i in range(12)],
        memory_clip_embeddings=rng.standard_normal((12, 16)).astype(np.float32),
        tokenizer=WordTokenizer(),
        memory_caption_num=3,
    )
    feats = rng.standard_normal((2, 16)).astype(np.float32)
    sents, ppl = model(feats, compute_scores=True)
    assert len(sents) == 2 and all(isinstance(s, str) for s in sents)
    assert all(p > 0 for p in ppl)


def test_build_memory_roundtrip(tmp_path):
    """build_memory writes the artifacts load_memory reads (reference
    prepare_embeddings.py: memory_captions.json + memory_clip_embeddings.pt
    + normalized memory_wte_embeddings.pt)."""
    rng = np.random.default_rng(0)
    caps = [f"caption number {i}" for i in range(7)]

    def clip_fn(texts):
        return rng.standard_normal((len(texts), 12)).astype(np.float32)

    def wte_fn(texts):
        return np.ones((len(texts), 4), np.float32) * 3.0

    out_dir = tmp_path / "memory" / "test_mem"
    emb = meacap.MeaCap.build_memory(
        caps, clip_fn, str(out_dir), wte_encode_fn=wte_fn, batch_size=3
    )
    assert emb.shape == (7, 12)
    caps2, emb2 = meacap.MeaCap.load_memory(str(tmp_path), "test_mem")
    assert caps2 == caps
    np.testing.assert_allclose(emb2, emb, atol=1e-6)
    wte = torch.load(out_dir / "memory_wte_embeddings.pt").numpy()
    np.testing.assert_allclose(np.linalg.norm(wte, axis=-1), 1.0, atol=1e-5)


def test_build_memory_projected(tmp_path):
    W = np.eye(12, 6, dtype=np.float32) * 2.0
    emb = meacap.MeaCap.build_memory(
        ["x", "y"], lambda t: np.ones((len(t), 12), np.float32),
        str(tmp_path / "memory" / "m2"), project_fn=lambda e: e @ W,
    )
    assert emb.shape == (2, 6)
    np.testing.assert_allclose(emb, 2.0)
