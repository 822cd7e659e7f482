"""ViECap parity: mapping network vs a literal torch re-execution of the
reference architecture (src/viecap/ClipCap.py), search algorithms vs HF GPT-2
reference loops (src/viecap/search.py semantics)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from patchioner_tpu.io import torch_port
from patchioner_tpu.models import gpt2, viecap


class WordTokenizer:
    """Minimal encode/decode tokenizer for tests (no HF vocab needed)."""

    pad_token_id = 0

    def __init__(self, vocab_size=257):
        self.vocab = {}
        self.rev = {}
        self.vocab_size = vocab_size

    def _id(self, w):
        if w not in self.vocab:
            i = len(self.vocab) + 10  # leave room for specials
            self.vocab[w] = i
            self.rev[i] = w
        return self.vocab[w]

    def encode(self, text):
        return [self._id(w) for w in text.strip().split(" ") if w]

    def decode(self, ids):
        return " ".join(self.rev.get(int(i), f"<{int(i)}>") for i in ids)


class DualEOSTokenizer(WordTokenizer):
    """WordTokenizer whose ' .' encodes to its OWN id, like GPT-2 BPE
    ('.' -> 13, ' .' -> 764) — lets tests exercise the reference's
    dual-EOS stopping (search.py:135,225)."""

    def __init__(self, eos2_id):
        super().__init__()
        self.eos2_id = eos2_id
        self.rev[eos2_id] = " ."

    def encode(self, text):
        if text == " .":
            return [self.eos2_id]
        return super().encode(text)


# ------------------------------------------------- mapping network oracle


class TorchMappingOracle(torch.nn.Module):
    """Literal reference MappingNetwork semantics (ClipCap.py:32-155)."""

    def __init__(self, clip_project_length, clip_hidden, prefix_length, d_model,
                 num_layers, num_heads, mlp_ratio=2.0):
        super().__init__()
        self.cpl = clip_project_length
        self.linear = torch.nn.Linear(clip_hidden, clip_project_length * d_model)
        self.prefix_const = torch.nn.Parameter(torch.randn(prefix_length, d_model))
        self.layers = torch.nn.ModuleList()
        self.num_heads = num_heads
        for _ in range(num_layers):
            self.layers.append(
                torch.nn.ModuleDict(
                    dict(
                        norm1=torch.nn.LayerNorm(d_model),
                        to_queries=torch.nn.Linear(d_model, d_model, bias=False),
                        to_keys_values=torch.nn.Linear(d_model, 2 * d_model, bias=False),
                        project=torch.nn.Linear(d_model, d_model),
                        norm2=torch.nn.LayerNorm(d_model),
                        fc1=torch.nn.Linear(d_model, int(d_model * mlp_ratio)),
                        fc2=torch.nn.Linear(int(d_model * mlp_ratio), d_model),
                    )
                )
            )

    def forward(self, x):
        b = x.shape[0]
        d = self.prefix_const.shape[-1]
        h = self.linear(x).view(b, self.cpl, d)
        prefix = self.prefix_const.unsqueeze(0).expand(b, *self.prefix_const.shape)
        q = torch.cat((h, prefix), dim=1)
        nh = self.num_heads
        hd = d // nh
        for L in self.layers:
            qn = L["norm1"](q)
            queries = L["to_queries"](qn).reshape(b, -1, nh, hd)
            kv = L["to_keys_values"](qn).reshape(b, -1, 2, nh, hd)
            keys, values = kv[:, :, 0], kv[:, :, 1]
            att = torch.einsum("bnhd,bmhd->bnmh", queries, keys) * hd**-0.5
            att = att.softmax(dim=2)
            out = torch.einsum("bnmh,bmhd->bnhd", att, values).reshape(b, -1, d)
            q = q + L["project"](out)
            q = q + L["fc2"](torch.relu(L["fc1"](L["norm2"](q))))
        return q[:, self.cpl :]

    def ref_state_dict(self):
        sd = {
            "mapping_network.linear.weight": self.linear.weight,
            "mapping_network.linear.bias": self.linear.bias,
            "mapping_network.prefix_const": self.prefix_const,
        }
        for i, L in enumerate(self.layers):
            p = f"mapping_network.transformer.layers.{i}"
            sd[f"{p}.norm1.weight"] = L["norm1"].weight
            sd[f"{p}.norm1.bias"] = L["norm1"].bias
            sd[f"{p}.attn.to_queries.weight"] = L["to_queries"].weight
            sd[f"{p}.attn.to_keys_values.weight"] = L["to_keys_values"].weight
            sd[f"{p}.attn.project.weight"] = L["project"].weight
            sd[f"{p}.attn.project.bias"] = L["project"].bias
            sd[f"{p}.norm2.weight"] = L["norm2"].weight
            sd[f"{p}.norm2.bias"] = L["norm2"].bias
            sd[f"{p}.mlp.fc1.weight"] = L["fc1"].weight
            sd[f"{p}.mlp.fc1.bias"] = L["fc1"].bias
            sd[f"{p}.mlp.fc2.weight"] = L["fc2"].weight
            sd[f"{p}.mlp.fc2.bias"] = L["fc2"].bias
        return sd


def test_mapping_network_parity():
    torch.manual_seed(0)
    cfg = viecap.ViecapConfig(
        continuous_prompt_length=4, clip_project_length=3, clip_hidden_size=16,
        num_layers=2, num_heads=2,
    )
    d_model = 32
    oracle = TorchMappingOracle(3, 16, 4, d_model, 2, 2).eval()
    params = viecap.port_mapping_network(oracle.ref_state_dict(), num_layers=2)
    x = np.random.default_rng(0).standard_normal((3, 16)).astype(np.float32)
    with torch.no_grad():
        want = oracle(torch.from_numpy(x)).numpy()
    got = viecap.mapping_network_forward(params, jnp.asarray(x), cfg, d_model)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


# ------------------------------------------------------- search oracles


@pytest.fixture(scope="module")
def small_gpt2():
    from transformers import GPT2Config, GPT2LMHeadModel

    hf_cfg = GPT2Config(
        vocab_size=263, n_positions=128, n_embd=32, n_layer=2, n_head=2,
        attn_pdrop=0.0, embd_pdrop=0.0, resid_pdrop=0.0,
    )
    torch.manual_seed(1)
    hf = GPT2LMHeadModel(hf_cfg).eval()
    cfg = gpt2.GPT2Config(vocab_size=263, n_positions=128, n_embd=32,
                          n_layer=2, n_head=2)
    params = torch_port.port_hf_gpt2_lmhead(hf.state_dict(), 2)
    return hf, cfg, params


def oracle_greedy(hf, embeds, eos, max_len=10):
    """Literal reference greedy loop (search.py:107-191, batch branch)."""
    generating = torch.from_numpy(embeds)
    past = None
    tokens = None
    with torch.no_grad():
        for step in range(max_len):
            if step == 0:
                out = hf(inputs_embeds=generating, use_cache=True)
                logits, past = out.logits[:, -1, :], out.past_key_values
            tok = torch.argmax(logits, dim=-1, keepdim=True)
            emb = hf.transformer.wte(tok)
            out = hf(inputs_embeds=emb, past_key_values=past, use_cache=True)
            logits, past = out.logits[:, -1, :], out.past_key_values
            tokens = tok if tokens is None else torch.cat((tokens, tok), dim=1)
    outs = []
    for row in tokens:
        for i in range(len(row)):
            if row[i].item() in eos:
                break
        outs.append(row[: i + 1].tolist())
    return outs


def test_greedy_search_parity(small_gpt2):
    hf, cfg, params = small_gpt2
    tok = WordTokenizer()
    eos = [tok.encode(".")[-1], tok.encode(" .")[-1]]
    rng = np.random.default_rng(2)
    embeds = rng.standard_normal((3, 5, 32)).astype(np.float32)
    want = oracle_greedy(hf, embeds, eos, max_len=10)
    got = viecap.greedy_search(params, jnp.asarray(embeds), cfg, tok, max_len=10)
    want_texts = [tok.decode(w) for w in want]
    assert got == want_texts


def test_greedy_search_parity_distinct_dual_eos(small_gpt2):
    """The reference's two EOS strings tokenize to DISTINCT ids under GPT-2
    BPE ('.' -> 13, ' .' -> 764; search.py:135). WordTokenizer collapses
    them, so the plain parity test never exercises stopping on eos[1] — an
    implementation that only honored eos[0] would pass it. Here ' .' is
    remapped to a token the model actually emits mid-sequence, so
    truncation must trigger via the SECOND eos id."""
    hf, cfg, params = small_gpt2
    tok = WordTokenizer()
    rng = np.random.default_rng(2)
    embeds = rng.standard_normal((3, 5, 32)).astype(np.float32)
    # observe the free-running token stream (no EOS can match)
    free = oracle_greedy(hf, embeds, eos=[-1], max_len=10)
    dot = tok.encode(".")[-1]
    emitted = free[0][3]
    assert emitted != dot
    # remap ' .' to exactly that emitted token
    tok = DualEOSTokenizer(emitted)
    eos = [tok.encode(".")[-1], tok.encode(" .")[-1]]
    assert eos[0] != eos[1], "dual EOS must be distinct for this test"
    want = oracle_greedy(hf, embeds, eos, max_len=10)
    assert len(want[0]) <= 4, "row 0 must stop early via eos[1]"
    got = viecap.greedy_search(
        params, jnp.asarray(embeds), cfg, tok, max_len=10
    )
    assert got == [tok.decode(w) for w in want]


def oracle_beam(hf, embeds, eos, beam_width=3, max_len=8):
    """Literal reference beam loop (search.py:193-285), full re-forward."""
    generated = torch.from_numpy(embeds)
    scores = None
    tokens = None
    seq_lengths = torch.ones(beam_width)
    is_stopped = torch.zeros(beam_width, dtype=torch.bool)
    with torch.no_grad():
        for _ in range(max_len):
            logits = hf(inputs_embeds=generated).logits[:, -1, :]
            logits = logits.softmax(-1).log()
            if scores is None:
                scores, next_tokens = logits.topk(beam_width, -1)
                generated = generated.expand(beam_width, *generated.shape[1:])
                next_tokens, scores = next_tokens.permute(1, 0), scores.squeeze(0)
                tokens = next_tokens
            else:
                logits[is_stopped] = -float("inf")
                logits[is_stopped, 0] = 0
                scores_sum = scores[:, None] + logits
                seq_lengths[~is_stopped] += 1
                avg = scores_sum / seq_lengths[:, None]
                avg, next_tokens = avg.view(-1).topk(beam_width, -1)
                src = torch.div(next_tokens, scores_sum.shape[1], rounding_mode="trunc")
                seq_lengths = seq_lengths[src]
                next_tokens = (next_tokens % scores_sum.shape[1]).unsqueeze(1)
                tokens = torch.cat((tokens[src], next_tokens), dim=1)
                generated = generated[src]
                scores = avg * seq_lengths
                is_stopped = is_stopped[src]
            emb = hf.transformer.wte(next_tokens.squeeze()).view(
                generated.shape[0], 1, -1
            )
            generated = torch.cat((generated, emb), dim=1)
            is_stopped = is_stopped + (
                next_tokens.eq(eos[0]) | next_tokens.eq(eos[1])
            ).squeeze()
            if is_stopped.all():
                break
    scores = scores / seq_lengths
    order = scores.argsort(descending=True)
    return [
        tokens[i][: int(seq_lengths[i])].tolist() for i in order
    ]


def test_beam_search_parity(small_gpt2):
    hf, cfg, params = small_gpt2
    tok = WordTokenizer()
    eos = [tok.encode(".")[-1], tok.encode(" .")[-1]]
    rng = np.random.default_rng(3)
    embeds = rng.standard_normal((1, 4, 32)).astype(np.float32)
    want = oracle_beam(hf, embeds, eos, beam_width=3, max_len=8)
    got = viecap.beam_search(
        params, jnp.asarray(embeds), cfg, tok, beam_width=3, max_len=8
    )
    want_texts = [tok.decode(w) for w in want]
    assert got == want_texts


def test_beam_search_parity_distinct_dual_eos(small_gpt2):
    """Beam stopping checks eq(eos[0]) | eq(eos[1]) (search.py:225,252);
    exercise the second id with a distinct ' .' mapping (see the greedy
    dual-EOS test)."""
    hf, cfg, params = small_gpt2
    tok = WordTokenizer()
    rng = np.random.default_rng(3)
    embeds = rng.standard_normal((1, 4, 32)).astype(np.float32)
    free = oracle_beam(hf, embeds, eos=[-1, -2], beam_width=3, max_len=8)
    dot = tok.encode(".")[-1]
    emitted = next(t for t in free[0][1:] if t != dot)
    tok = DualEOSTokenizer(emitted)
    eos = [tok.encode(".")[-1], tok.encode(" .")[-1]]
    assert eos[0] != eos[1]
    want = oracle_beam(hf, embeds, eos, beam_width=3, max_len=8)
    got = viecap.beam_search(
        params, jnp.asarray(embeds), cfg, tok, beam_width=3, max_len=8
    )
    assert got == [tok.decode(w) for w in want]


def test_beam_search_batched_matches_per_image(small_gpt2):
    """beam_search_batched (one vmapped program for all images — the TPU
    replacement for the reference's sequential per-sample loop,
    entrypoint.py:149-161) must return exactly beam_search(...)[0] for
    every image."""
    _, cfg, params = small_gpt2
    tok = WordTokenizer()
    rng = np.random.default_rng(9)
    embeds = rng.standard_normal((4, 4, 32)).astype(np.float32)
    want = [
        viecap.beam_search(
            params, jnp.asarray(embeds[i : i + 1]), cfg, tok,
            beam_width=3, max_len=8,
        )[0]
        for i in range(4)
    ]
    got = viecap.beam_search_batched(
        params, jnp.asarray(embeds), cfg, tok, beam_width=3, max_len=8
    )
    assert got == want


def oracle_contrastive(hf, embeds, eos, alpha=0.1, top_k=8, max_len=10):
    """Literal reference contrastive loop (search.py:294-405 +
    ranking_and_selecting :640-683), with the KV-cache bookkeeping replaced
    by full re-forwards (mathematically identical; the reference's
    reshape_from/to_past_key_values is pure caching)."""
    generating = torch.from_numpy(embeds)
    b = generating.shape[0]
    tokens = None
    with torch.no_grad():
        out = hf(inputs_embeds=generating, output_hidden_states=True)
        next_logits = out.logits[:, -1, :]
        past_hidden = out.hidden_states[-1]
        cur = generating
        for _ in range(max_len):
            probs = torch.nn.functional.softmax(next_logits, dim=-1)
            _, top_idx = next_logits.topk(top_k, dim=-1)
            top_probs = probs.gather(1, top_idx)
            cand_hidden = torch.zeros(b, top_k, past_hidden.shape[-1])
            cand_logits = torch.zeros(b, top_k, next_logits.shape[-1])
            for j in range(top_k):
                emb = hf.transformer.wte(top_idx[:, j : j + 1])
                o = hf(
                    inputs_embeds=torch.cat([cur, emb], 1),
                    output_hidden_states=True,
                )
                cand_logits[:, j] = o.logits[:, -1]
                cand_hidden[:, j] = o.hidden_states[-1][:, -1]
            nc = past_hidden / past_hidden.norm(dim=-1, keepdim=True)
            nn_ = cand_hidden / cand_hidden.norm(dim=-1, keepdim=True)
            cos = torch.einsum("bkd,btd->bkt", nn_, nc)
            penalty = cos.max(-1).values
            scores = (1.0 - alpha) * top_probs - alpha * penalty
            sel = scores.max(-1).indices
            tok = top_idx[range(b), sel].unsqueeze(-1)
            next_logits = cand_logits[range(b), sel]
            past_hidden = torch.cat(
                [past_hidden, cand_hidden[range(b), sel].unsqueeze(1)], 1
            )
            cur = torch.cat([cur, hf.transformer.wte(tok)], 1)
            tokens = tok if tokens is None else torch.cat([tokens, tok], 1)
    outs = []
    for row in tokens:
        for i in range(len(row)):
            if row[i].item() == eos:
                break
        outs.append(row[: i + 1].tolist())
    return outs


def test_contrastive_search_parity(small_gpt2):
    hf, cfg, params = small_gpt2
    tok = WordTokenizer()
    eos = tok.encode(".")[0]
    rng = np.random.default_rng(7)
    embeds = rng.standard_normal((2, 4, 32)).astype(np.float32)
    want = oracle_contrastive(hf, embeds, eos, alpha=0.3, top_k=8, max_len=10)
    got = viecap.contrastive_search(
        params, jnp.asarray(embeds), cfg, tok,
        alpha=0.3, top_k=8, max_len=10,
    )
    assert got == [tok.decode(w) for w in want]


def test_viecap_end_to_end(small_gpt2):
    _, cfg, params = small_gpt2
    tok = WordTokenizer()
    vcfg = viecap.ViecapConfig(
        continuous_prompt_length=3, clip_project_length=2, clip_hidden_size=16,
        num_layers=1, num_heads=2, using_hard_prompt=True,
        using_greedy_search=True, top_k=2, threshold=0.0, max_len=6,
    )
    import jax

    mp = viecap.init_mapping_network(jax.random.PRNGKey(0), vcfg, cfg.n_embd)
    rng = np.random.default_rng(4)
    model = viecap.VieCap(
        vcfg, cfg, params, mp,
        entities=["dog", "cat", "car"],
        texts_embeddings=rng.standard_normal((3, 16)).astype(np.float32),
        tokenizer=tok,
    )
    feats = rng.standard_normal((2, 16)).astype(np.float32)
    sents, ppl = model.forward(feats, compute_scores=True)
    assert len(sents) == 2 and len(ppl) == 2
    assert all(isinstance(s, str) for s in sents)
    assert all(p > 0 for p in ppl)


def test_hard_prompt_pad_multiple_buckets_length(small_gpt2):
    """hard_prompt_pad_multiple=m pads the hard prompt to the next multiple
    of m (serving lever: one compile per BUCKET instead of per distinct
    prompt length). Pads are attended either way, so bucketing is the
    documented opt-in divergence — assert the geometry, and that m=0 keeps
    reference per-batch-max padding."""
    _, cfg, params = small_gpt2
    tok = WordTokenizer()
    rng = np.random.default_rng(4)
    import jax

    base = dict(
        continuous_prompt_length=3, clip_project_length=2,
        clip_hidden_size=16, num_layers=1, num_heads=2,
    )
    soft = jnp.zeros((2, 3, cfg.n_embd), jnp.float32)
    rows = [tok.encode("dog cat ."), tok.encode("car .")]
    maxlen = max(len(r) for r in rows)

    e0 = viecap.assemble_prompt_embeds(
        soft, rows, params, 0, viecap.ViecapConfig(**base))
    assert e0.shape[1] == maxlen + 3
    e8 = viecap.assemble_prompt_embeds(
        soft, rows, params, 0,
        viecap.ViecapConfig(hard_prompt_pad_multiple=8, **base))
    assert e8.shape[1] == 8 + 3
    # the real token positions are identical; only pad length differs
    np.testing.assert_allclose(
        np.asarray(e8[:, :maxlen]), np.asarray(e0[:, :maxlen]), atol=0)


def test_entity_retrieval_threshold():
    f = np.eye(3, 8, dtype=np.float32)
    t = np.eye(4, 8, dtype=np.float32)  # entity i aligned with feature i
    ents = ["a", "b", "c", "d"]
    out = viecap.retrieve_entities(
        jnp.asarray(f), jnp.asarray(t), ents, top_k=2, threshold=0.3,
        temperature=0.01,
    )
    assert out[0] == ["a"] and out[1] == ["b"] and out[2] == ["c"]
    assert viecap.compose_discrete_prompt([]) == "There are something in image."
    assert (
        viecap.compose_discrete_prompt(["dog", "cat"])
        == "There are dog, cat in image."
    )


def test_load_entities_vendored_vocab():
    import os

    path = os.path.join(viecap.VOCAB_DIR, "coco_categories.json")
    ents = viecap.load_entities_text("coco_entities", path)
    assert "person" in ents and len(ents) >= 80


def test_open_image_paren_rule_matches_reference(tmp_path):
    """load_annotations.py:111-115 lower+strips FIRST and drops the
    '(...)' qualifier only when the name ENDS with ')' — a mid-string
    paren is kept whole. (Round-3 review: truncating at any '(' would
    shift the sorted order the shipped embedding pickles align to.)"""
    csv_path = tmp_path / "oid.csv"
    csv_path.write_text(
        "LabelName,DisplayName\r\n"
        "/m/1,Ball (Object)\r\n"          # qualifier -> 'ball'
        "/m/2,Foo (bar) baz\r\n"          # mid-string paren -> kept whole
        "/m/3,Plain\r\n"
    )
    ents = viecap.load_entities_text("open_image_entities", str(csv_path))
    assert ents == sorted(["ball", "foo (bar) baz", "plain"])


def test_build_entity_embeddings_reference_order(tmp_path):
    """Builder matches a literal per-entity transcription of the reference
    (generating_prompt_ensemble.py:40-48: encode -> normalize per text ->
    mean over templates -> normalize) and round-trips through pickle."""
    import pickle

    rng = np.random.default_rng(0)
    table = {}

    def encode_fn(texts):
        return np.stack([
            table.setdefault(t, rng.standard_normal(16).astype(np.float32))
            for t in texts
        ])

    ents = ["dog", "cat", "pizza slice", "traffic light", "zebra"]
    out_path = tmp_path / "coco_embeddings_test_with_ensemble.pickle"
    got = viecap.build_entity_embeddings(
        ents, encode_fn, out_path=str(out_path), batch_entities=2
    )
    assert got.shape == (5, 16)
    np.testing.assert_allclose(np.linalg.norm(got, axis=-1), 1.0, atol=1e-5)
    for i, e in enumerate(ents):
        embs = np.stack([
            table[t.format(e)] for t in viecap.PROMPT_ENSEMBLE_TEMPLATES
        ])
        embs = embs / np.linalg.norm(embs, axis=-1, keepdims=True)
        mean = embs.mean(0)
        want = mean / np.linalg.norm(mean)
        np.testing.assert_allclose(got[i], want, atol=1e-5)
    with open(out_path, "rb") as f:
        loaded = np.asarray(pickle.load(f), np.float32)
    np.testing.assert_array_equal(loaded, got)


def test_build_entity_embeddings_projected():
    """project_fn applies BEFORE per-text normalization (the reference
    projects the raw CLIP embeddings, :43-45)."""
    rng = np.random.default_rng(1)
    W = rng.standard_normal((16, 8)).astype(np.float32)

    def encode_fn(texts):
        return np.stack([
            np.full(16, 1.0 + (hash(t) % 7), np.float32) for t in texts
        ])

    got = viecap.build_entity_embeddings(
        ["a", "b"], encode_fn, project_fn=lambda e: np.asarray(e) @ W
    )
    assert got.shape == (2, 8)
    np.testing.assert_allclose(np.linalg.norm(got, axis=-1), 1.0, atol=1e-5)


def test_entity_vocabularies_align_with_vendored_embeddings():
    """Every entity loader must reproduce the reference's postprocess
    (lower/strip, sort — load_annotations.py:84-149): the vendored
    `*_embeddings_*.pickle` matrices were encoded over the SORTED
    vocabulary, so row i of the matrix must name entities[i]. Unsorted or
    mis-parsed vocabularies silently misname every retrieved entity."""
    import os
    import pickle

    from patchioner_tpu.models.viecap import VOCAB_DIR, load_entities_text

    cases = [
        ("coco_entities", "coco_categories.json",
         "coco_embeddings_ViT-B32.pickle"),
        ("vinvl_vgoi_entities", "vgcocooiobjects_v1_class2ind.json",
         "vgoi_embeddings_ViT-B32.pickle"),
        ("open_image_entities", "oidv7-class-descriptions-boxable.csv",
         "open_image_embeddings_ViT-B32.pickle"),
        ("vinvl_vg_entities", "VG-SGG-dicts-vgoi6-clipped.json",
         "vg_embeddings_ViT-B32.pickle"),
        ("visual_genome_entities", "all_objects_attributes_relationships.pickle",
         None),
    ]
    for name, vocab, emb in cases:
        vpath = os.path.join(VOCAB_DIR, vocab)
        if not os.path.exists(vpath):
            continue
        ents = load_entities_text(name, vpath)
        assert ents == sorted(ents), name
        assert all(e == e.lower().strip() for e in ents), name
        if name == "open_image_entities":
            assert "displayname" not in ents  # header row consumed
            # the reference rule strips a qualifier only when the name
            # ENDS with ')' (load_annotations.py:111-115) — a mid-string
            # paren would legitimately survive, so assert the actual
            # post-rule invariant
            assert not any(e.endswith(")") for e in ents)
        if name == "visual_genome_entities":
            assert len(ents) > 10_000  # the joint set, not 3 dict keys
        if emb and os.path.exists(os.path.join(VOCAB_DIR, emb)):
            with open(os.path.join(VOCAB_DIR, emb), "rb") as f:
                mat = pickle.load(f)
            n = mat.shape[0] if hasattr(mat, "shape") else len(mat)
            assert n == len(ents), (name, n, len(ents))
