"""Parity tests for the MeaCap concept-merge pipeline.

Oracle = the REFERENCE CODE ITSELF, loaded as data at test time: the
actual `src/meacap/utils/parse_tool.py` module is imported by path from
/root/reference (existence-guarded skip, per the repo convention that
tests may load reference files as oracles but the package never imports
reference code), and its `get_graph_dict` / `merge_graph_dict` /
`filter_relation` run against `patchioner_tpu/models/meacap_concepts.py`
with STUBBED scene-graph strings and stubbed deterministic sentence
embeddings — no flan-T5/SBERT weights involved, exactly the model-free
surface the port covers. The flan-T5 `parse` stage is bypassed on both
sides by feeding precomputed graph strings (the composition mirrors
detect_utils.py:20-43 `retrieve_concepts` with `parse` stubbed).
"""

import importlib.util
import os
from collections import OrderedDict

import numpy as np
import pytest

from patchioner_tpu.models import meacap_concepts as mc
from patchioner_tpu.models.meacap import build_concept_extractor

PARSE_TOOL = (
    "/root/reference/Patch-ioner/src/meacap/utils/parse_tool.py"
)

pytestmark = pytest.mark.skipif(
    not os.path.exists(PARSE_TOOL),
    reason="reference parse_tool.py not present to serve as the oracle",
)


@pytest.fixture(scope="module")
def ref():
    """The reference parse_tool module, imported by file path. Its
    module-level imports (transformers/torch/nltk) are heavyweight but
    present in this image; skip cleanly where they are not."""
    try:
        spec = importlib.util.spec_from_file_location(
            "_ref_parse_tool", PARSE_TOOL
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    except ImportError as e:  # e.g. nltk absent on a minimal machine
        pytest.skip(f"reference oracle deps unavailable: {e}")
    return mod


def _ref_retrieve_concepts(ref_mod, model, scene_graphs, captions):
    """detect_utils.py:20-43 composition with `parse` replaced by
    precomputed graph strings."""
    type_dict = {}
    attribute_dict = {}
    entities_, count_dict_, entire_graph_dict = ref_mod.get_graph_dict(
        model, scene_graphs, type_dict, attribute_dict
    )
    concepts, _, _ = ref_mod.merge_graph_dict(
        model, entities_, count_dict_, entire_graph_dict, captions
    )
    return concepts[:4]


# ---------------------------------------------------------------- stubs


class _StubWTE:
    """Deterministic sentence-embedding stub: every known word maps to a
    fixed unit vector; words in the same 'group' sit at assigned angles on
    a 2-plane private to the group (cosine = cos(Δθ)), distinct groups are
    orthogonal."""

    def __init__(self, groups):
        # groups: list of dict word -> angle (radians)
        self.vec = {}
        dim = 2 * max(len(groups), 1) + 2
        for g, members in enumerate(groups):
            for word, theta in members.items():
                v = np.zeros(dim, np.float32)
                v[2 * g] = np.cos(theta)
                v[2 * g + 1] = np.sin(theta)
                self.vec[word] = v
        self.dim = dim
        self._fallback = {}

    def _row(self, text):
        if text in self.vec:
            return self.vec[text]
        # unknown strings (multi-word entities etc.): stable quasi-random
        # orthogonal-ish unit vector from a seeded per-string RNG
        if text not in self._fallback:
            rng = np.random.default_rng(abs(hash(text)) % (2**32))
            v = rng.standard_normal(self.dim).astype(np.float32)
            self._fallback[text] = v / np.linalg.norm(v)
        return self._fallback[text]

    def encode(self, texts, convert_to_tensor=False, normalize_embeddings=True):
        rows = np.stack([self._row(t) for t in texts]).astype(np.float32)
        if convert_to_tensor:
            import torch

            return torch.from_numpy(rows)
        return rows


_CAPTIONS = [
    "A young girl blows out a lit candle on a cake.",
    "The young girl holds a small cake near the table.",
    "A kid blows at the lit candle happily.",
    "The small child blows the lit candle near a kid.",
    "A woman smiles at the table scene.",
]

# Stub parser output (what flan-T5 would return), exercising every segment
# arity: bare object, (s, a), (s, is, digit), (s, r, o), >3 fields, and a
# 1-field segment inside a multi-segment graph (silently dropped).
_GRAPHS = [
    "( girl , blow , candle ) , ( girl , young ) , ( candle , is , 2 ) , "
    "( candle , lit )",
    "( girl , hold , cake ) , ( girl , young ) , ( noise )",
    "( kid , blow , candle ) , ( kid , little ) , ( candle , lit )",
    "( child , is , small ) , ( child , blow , candle ) , ( candle , lit ) , "
    "( candle , near , kid ) , ( child , sit , at , table )",
    "( woman , smile )",
]

_GROUPS = [
    {"girl": 0.0, "kid": 0.6, "child": 0.9, "woman": 1.2},
    {"candle": 0.0},
    {"cake": 0.0},
    {"table": 0.0},
]


def _port_concepts(graphs, captions, model, k=4):
    return mc.concepts_from_graphs(
        graphs, lambda texts: model.encode(texts), captions, k)


def test_segment_splitting_matches_reference(ref):
    assert mc.split_graph_segments(_GRAPHS) == \
        ref.get_seg_list_seperate(_GRAPHS)
    messy = ["(a ,b) ,( c , is:d )", "( lone )"]
    assert mc.split_graph_segments(messy) == ref.get_seg_list_seperate(messy)


def test_single_string_and_bad_type():
    one = "( dog , runs , park )"
    assert mc.split_graph_segments(one) == mc.split_graph_segments([one])
    with pytest.raises(ValueError):
        mc.split_graph_segments(42)


def test_graph_dict_matches_reference(ref):
    td_r, ad_r = {}, {}
    ents_r, counts_r, graph_r = ref.get_graph_dict(None, _GRAPHS, td_r, ad_r)
    td_p, ad_p = {}, {}
    ents_p, counts_p, graph_p = mc.build_graph_dict(_GRAPHS, td_p, ad_p)
    assert ents_p == ents_r
    assert list(counts_p.items()) == list(counts_r.items())
    assert graph_p == graph_r
    assert td_p == td_r
    assert ad_p == ad_r
    # the quirks we claim: 1-field multi-seg dropped; digit spelled out;
    # per-graph attribute re-add resets to 1
    assert "noise" not in ents_p
    assert graph_p["candle"]["Attribute"]["two"] == 1
    assert counts_p["candle"] == 3


def test_full_pipeline_matches_reference(ref):
    model = _StubWTE(_GROUPS)
    want = _ref_retrieve_concepts(ref, model, _GRAPHS, _CAPTIONS)
    got = _port_concepts(_GRAPHS, _CAPTIONS, model)
    assert got == want
    # the scenario is engineered to exercise merge + filter + attach:
    # girl absorbs kid/child/woman (cos 0.6/0.9/1.2-plane hits > 0.55),
    # candle keeps its merged 'lit' attribute count 3 -> attached
    assert "lit candle" in got
    assert any(c.endswith("girl") for c in got)
    assert "kid" not in got and "child" not in got


def test_merge_stage_intermediates_match(ref):
    model = _StubWTE(_GROUPS)
    td, ad = {}, {}
    ents_r, counts_r, graph_r = ref.get_graph_dict(None, _GRAPHS, td, ad)
    concepts_r, new_counts_r, final_r = ref.merge_graph_dict(
        model, ents_r, counts_r, graph_r, _CAPTIONS)

    ents_p, counts_p, graph_p = mc.build_graph_dict(_GRAPHS)
    surv_p, sub_p, kept_p, rep_p = mc.merge_graph_entities(
        model.encode(ents_p), ents_p, counts_p, graph_p)
    assert list(surv_p.items()) == list(new_counts_r.items())
    final_p, concepts_p = mc.order_and_attach(sub_p, rep_p, _CAPTIONS)
    assert concepts_p == concepts_r
    assert list(final_p.keys()) == list(final_r.keys())
    for k in final_p:
        assert final_p[k]["rating"] == final_r[k]["rating"]
        assert final_p[k]["Relation"] == final_r[k]["Relation"]
        assert final_p[k]["Attribute"] == final_r[k]["Attribute"]
        assert final_p[k]["count"] == final_r[k]["count"]
        assert final_p[k]["relative_pos"] == pytest.approx(
            float(final_r[k]["relative_pos"]))
    # representative map exercised: removed entities remap to a live node
    assert rep_p.get("kid") in sub_p or "kid" not in rep_p


def test_no_survivor_returns_empty(ref):
    # every entity appears once -> count <= 2 filter kills all
    graphs = ["( cat , sit , mat )", "( dog , run )"]
    model = _StubWTE([{"cat": 0.0}, {"dog": 0.0}, {"mat": 0.0}])
    assert _port_concepts(graphs, ["a cat", "a dog"], model) == []
    assert _ref_retrieve_concepts(ref, model, graphs, ["a cat", "a dog"]) == []


def test_relative_position_start_of_sentence_quirk(ref):
    # entity at position 0 contributes nothing (find()==0 fails `pos > 0`)
    graphs = ["( zebra , run )"] * 3
    caps = ["zebra runs fast", "zebra at dawn", "the zebra"]
    model = _StubWTE([{"zebra": 0.0}])
    want = _ref_retrieve_concepts(ref, model, graphs, caps)
    got = _port_concepts(graphs, caps, model)
    # 'run' is a 2-field attribute; its merged count 3 >= thresh attaches it
    assert got == want == ["run zebra"]
    ordered, _ = mc.order_and_attach(
        {"zebra": {"Relation": {}, "Attribute": {}, "count": 3}}, {}, caps)
    assert ordered["zebra"]["relative_pos"] == pytest.approx(4 / 9)


def _random_case(rng):
    vocab = ["girl", "kid", "child", "woman", "candle", "flame", "cake",
             "table", "dog", "puppy", "ball", "park"]
    groups = [
        {"girl": 0.0, "kid": rng.uniform(0.3, 1.4),
         "child": rng.uniform(0.3, 1.4), "woman": rng.uniform(0.3, 1.4)},
        {"candle": 0.0, "flame": rng.uniform(0.3, 1.4)},
        {"cake": 0.0},
        {"table": 0.0},
        {"dog": 0.0, "puppy": rng.uniform(0.3, 1.4)},
        {"ball": 0.0},
        {"park": 0.0},
    ]
    rels = ["blow", "hold", "is", "near", "chase"]
    attrs = ["young", "lit", "small", "happy", "2", "5"]
    graphs = []
    for _ in range(rng.integers(2, 7)):
        segs = []
        for _ in range(rng.integers(1, 5)):
            kind = rng.integers(0, 5)
            s = vocab[rng.integers(len(vocab))]
            if kind == 0:
                segs.append(f"( {s} )")
            elif kind == 1:
                segs.append(f"( {s} , {attrs[rng.integers(len(attrs))]} )")
            elif kind == 2:
                segs.append(f"( {s} , is , {attrs[rng.integers(len(attrs))]} )")
            elif kind == 3:
                o = vocab[rng.integers(len(vocab))]
                segs.append(f"( {s} , {rels[rng.integers(len(rels))]} , {o} )")
            else:
                o = vocab[rng.integers(len(vocab))]
                segs.append(f"( {s} , sits , next to , {o} )")
        graphs.append(" , ".join(segs))
    caps = [f"a scene with {vocab[rng.integers(len(vocab))]} and "
            f"{vocab[rng.integers(len(vocab))]}" for _ in range(len(graphs))]
    return graphs, caps, _StubWTE(groups)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5, 6, 7])
def test_fuzz_matches_reference(ref, seed):
    rng = np.random.default_rng(seed)
    for _ in range(8):
        graphs, caps, model = _random_case(rng)
        assert _port_concepts(graphs, caps, model) == \
            _ref_retrieve_concepts(ref, model, graphs, caps)


def test_build_concept_extractor_end_to_end(ref):
    """The packaged extractor path (what MeaCap wires as concept_extractor)
    executes the faithful pipeline with stub parse/encode callables."""
    model = _StubWTE(_GROUPS)
    parse_calls = []

    def parse_fn(captions):
        parse_calls.append(list(captions))
        return _GRAPHS[: len(captions)]

    extractor = build_concept_extractor(
        parse_fn, lambda texts: model.encode(texts))
    got = extractor(_CAPTIONS)
    assert got == _ref_retrieve_concepts(ref, model, _GRAPHS, _CAPTIONS)
    assert parse_calls == [list(_CAPTIONS)]
    assert 0 < len(got) <= 4
