"""Caption-metric tests: hand-computed oracles and invariants."""

import math

import numpy as np
import pytest

from patchioner_tpu.eval import metrics


def tok(s):
    return metrics.ptb_tokenize(s)


def test_ptb_tokenize():
    assert tok("A man, riding; a horse!") == ["a", "man", "riding", "a", "horse"]


def test_bleu_perfect_match():
    cands = [tok("the cat sat on the mat")]
    refs = [[tok("the cat sat on the mat")]]
    corpus, inst = metrics.bleu(cands, refs)
    assert all(abs(b - 1.0) < 1e-9 for b in corpus)
    assert all(abs(b - 1.0) < 1e-9 for b in inst[0])


def test_bleu_hand_computed():
    # cand: "the the the", ref: "the cat" -> clipped unigram = 1/3,
    # bigram = 0; BP = exp(1 - 2/3)... lc=3 > lr=2 -> BP=1.
    corpus, _ = metrics.bleu([tok("the the the")], [[tok("the cat")]])
    assert abs(corpus[0] - 1.0 / 3.0) < 1e-8
    # zero bigram matches: the speaksee/pycocoevalcap scorer the reference
    # runs smooths every ratio with tiny=1e-15/small=1e-9, so the result
    # is tiny-positive (sqrt(1/3 * tiny/2)), NOT a hard 0
    assert 0.0 < corpus[1] < 1e-7


def test_bleu_brevity_penalty():
    # cand shorter than ref -> BP = exp(1 - lr/lc)
    corpus, _ = metrics.bleu([tok("the cat")], [[tok("the cat sat on mat")]])
    bp = math.exp(1 - 5 / 2)
    assert abs(corpus[0] - bp * 1.0) < 1e-9


def test_rouge_l_hand_computed():
    # cand: "a b c d", ref: "a c b d" -> LCS = 3 ("a b d" or "a c d")
    score, per = metrics.rouge_l([list("abcd")], [[list("acbd")]])
    p = r = 3 / 4
    beta = 1.2
    f = (1 + beta**2) * p * r / (r + beta**2 * p)
    assert abs(score - f) < 1e-9


def test_cider_identical_corpus():
    """Candidate == only ref and unique n-grams -> idf = log(N/1); cosine = 1
    per n with length delta 0 -> score 10.0 per image."""
    cands = [tok("a red dog runs fast"), tok("blue cats sleep all day")]
    refs = [[tok("a red dog runs fast")], [tok("blue cats sleep all day")]]
    corpus, per = metrics.cider_d(cands, refs)
    assert abs(corpus - 10.0) < 1e-6
    assert all(abs(s - 10.0) < 1e-6 for s in per)


def test_cider_length_damping():
    """Same content but candidate longer -> gaussian length penalty < 1."""
    cands = [tok("a red dog runs fast and far away today now")]
    refs = [[tok("a red dog runs fast")], ]
    # second image to make idf nontrivial
    cands.append(tok("blue cats"))
    refs.append([tok("blue cats")])
    _, per = metrics.cider_d(cands, refs)
    assert per[0] < 10.0


def test_meteor_perfect_and_disorder():
    s, per = metrics.meteor([tok("the cat sat")], [[tok("the cat sat")]])
    # perfect match: P=R=1, fmean=1, chunks=1, penalty=0.5*(1/3)^3
    want = 1 * (1 - 0.5 * (1 / 3) ** 3)
    assert abs(per[0] - want) < 1e-9
    # reordering increases chunks -> lower score
    _, per2 = metrics.meteor([tok("sat the cat")], [[tok("the cat sat")]])
    assert per2[0] < per[0]


def test_compute_all_metrics_keys():
    out = metrics.compute_all_metrics(
        ["a dog runs", "a cat sleeps"],
        [["a dog runs fast", "the dog is running"], ["a cat sleeps now"]],
    )
    assert set(out) == {
        "Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4", "ROUGE_L", "CIDEr", "METEOR", "SPICE"
    }
    for corpus, inst in out.values():
        assert 0.0 <= corpus
        assert len(inst) == 2


def test_pac_score_math():
    from patchioner_tpu.eval.pac_score import pac_score, ref_pac_score

    img = np.asarray([[1.0, 0.0], [0.0, 1.0]], np.float32)
    cand_feats = np.asarray([[1.0, 0.0], [-1.0, 0.0]], np.float32)
    mean, per, _, lens = pac_score(
        None, img, ["a b", "c"], w=2.0, candidate_features=cand_feats
    )
    np.testing.assert_allclose(per, [2.0, 0.0])  # clipped at 0
    assert lens == [2, 1]


class _FakeScorer:
    def __init__(self, mapping):
        self.mapping = mapping

    def encode_texts(self, texts, prompt=""):
        return np.stack([self.mapping[t] for t in texts])


def test_ref_pac_score_max_over_refs():
    from patchioner_tpu.eval.pac_score import ref_pac_score

    mapping = {
        "r1": np.asarray([1.0, 0.0], np.float32),
        "r2": np.asarray([0.0, 1.0], np.float32),
        "r3": np.asarray([0.7, 0.7], np.float32),
    }
    cand_feats = np.asarray([[1.0, 0.0]], np.float32)
    mean, per = ref_pac_score(_FakeScorer(mapping), [["r1", "r2", "r3"]], cand_feats)
    np.testing.assert_allclose(per, [1.0], rtol=1e-6)


def test_porter_stemmer_canonical_pairs():
    """Canonical Porter (1980) vocabulary outputs — full-pipeline stems."""
    from patchioner_tpu.text.porter import stem

    pairs = {
        "caresses": "caress", "ponies": "poni", "ties": "ti", "cats": "cat",
        "feed": "feed", "agreed": "agre", "plastered": "plaster",
        "motoring": "motor", "conflated": "conflat", "sized": "size",
        "hopping": "hop", "falling": "fall", "filing": "file",
        "happy": "happi", "sky": "sky", "relational": "relat",
        "conditional": "condit", "rational": "ration", "operator": "oper",
        "feudalism": "feudal", "decisiveness": "decis",
        "hopefulness": "hope", "formative": "form", "formalize": "formal",
        "electrical": "electr", "electriciti": "electr", "hopeful": "hope",
        "goodness": "good", "revival": "reviv", "allowance": "allow",
        "inference": "infer", "adjustable": "adjust",
        "replacement": "replac", "adjustment": "adjust",
        "dependent": "depend", "adoption": "adopt", "activate": "activ",
        "effective": "effect", "rate": "rate", "cease": "ceas",
        "controll": "control", "roll": "roll", "running": "run",
        "dogs": "dog", "cried": "cri",
    }
    for word, want in pairs.items():
        assert stem(word) == want, (word, stem(word), want)


def test_meteor_synonym_stage():
    groups = {"happy": frozenset({"g1"}), "glad": frozenset({"g1"}),
              "dog": frozenset({"g2"}), "cat": frozenset({"g3"})}
    syn = lambda w: groups.get(w, frozenset())
    cand, ref = [tok("the happy dog")], [[tok("the glad dog")]]
    _, without = metrics.meteor(cand, ref)
    _, with_syn = metrics.meteor(cand, ref, synonyms=syn)
    assert with_syn[0] > without[0]
    # hand-computed: exact matches "the","dog"; synonym happy~glad @0.8;
    # all 3 contiguous -> 1 chunk, m=3
    p = r = (2 + 0.8) / 3
    fmean = p * r / (0.9 * p + 0.1 * r)
    want = fmean * (1 - 0.5 * (1 / 3) ** 3)
    assert abs(with_syn[0] - want) < 1e-9
    # no shared group -> no match
    _, none = metrics.meteor([tok("dog")], [[tok("cat")]], synonyms=syn)
    assert none[0] == 0.0


def test_meteor_paraphrase_stage():
    table = {"sofa": frozenset({"p1"}), "couch": frozenset({"p1"}),
             "hot dog": frozenset({"p2"}), "frankfurter": frozenset({"p2"})}
    para = lambda s: table.get(s, frozenset())
    cand = [tok("a hot dog on the sofa")]
    ref = [[tok("a frankfurter on the couch")]]
    _, without = metrics.meteor(cand, ref)
    _, with_para = metrics.meteor(cand, ref, paraphrases=para)
    assert with_para[0] > without[0]
    # exact: a, on, the (3); paraphrase spans: "hot dog"(2w)~"frankfurter"
    # (1w) and "sofa"~"couch" @0.6
    wc = 3 + 0.6 * (2 + 1)  # cand-side weighted mass
    wr = 3 + 0.6 * (1 + 1)
    p, r = wc / 6, wr / 5
    fmean = p * r / (0.9 * p + 0.1 * r)
    # m: METEOR 1.3/1.5 fragmentation divides chunks by the AVERAGE of
    # matched words over hypothesis and reference — the sides differ here
    # because the "hot dog"(2w) span matches "frankfurter"(1w)
    m = ((3 + 2 + 1) + (3 + 1 + 1)) / 2  # (cand 6 + ref 5) / 2
    # alignment: a | hot dog | on the | sofa -> 4 chunks? a..hot dog
    # contiguous on cand but ref jumps (a -> frankfurter): count explicitly
    # cand spans: (0,1)(1,2)(3,1)(4,1)(5,1); ref: (0,1)(1,1)(2,1)(3,1)(4,1)
    # sorted by cand: 0:a->0, 1:hotdog(2)->1, 3:on->2, 4:the->3, 5:sofa->4
    # chunk breaks: after hotdog cand 1+2=3==3 ref 1+1=2==2 contiguous!
    # all contiguous -> 1 chunk
    want = (p * r / (0.9 * p + 0.1 * r)) * (1 - 0.5 * (1 / m) ** 3)
    assert abs(with_para[0] - want) < 1e-9


def test_spice_hand_computed():
    from patchioner_tpu.eval import spice as sp

    cand = [tok("a black dog sitting on a wooden table")]
    refs = [[tok("a black dog on a table"), tok("a dog is small")]]
    corpus, per = sp.spice(cand, refs)
    # cand graph: dog, table, (dog,black), (table,wooden),
    #             (dog,"sitting on",table)
    # merged ref: dog, table, (dog,black), (dog,small), (dog,"on",table)
    # matches: dog, table, (dog,black) -> p=3/5, r=3/5
    inst = per[0]["All"]
    assert abs(inst["p"] - 3 / 5) < 1e-9
    assert abs(inst["r"] - 3 / 5) < 1e-9
    assert abs(corpus - 3 / 5) < 1e-9
    assert per[0]["Object"]["f"] == 1.0
    assert abs(per[0]["Attribute"]["p"] - 0.5) < 1e-9


def test_spice_synonym_matching():
    from patchioner_tpu.eval import spice as sp

    groups = {"dog": frozenset({"canine"}), "puppy": frozenset({"canine"})}
    syn = lambda w: groups.get(w, frozenset())
    cand, refs = [tok("a dog")], [[tok("a puppy")]]
    c0, _ = sp.spice(cand, refs)
    c1, _ = sp.spice(cand, refs, synonyms=syn)
    assert c0 == 0.0 and c1 == 1.0


def test_spice_plural_lemmatization():
    from patchioner_tpu.eval import spice as sp

    g = sp.parse_scene_graph(tok("two dogs and three people"))
    assert ("dog",) in g and ("person",) in g


def test_meteor_stem_stage():
    # exact scoring unchanged when everything matches exactly
    s, per = metrics.meteor([tok("the cat sat")], [[tok("the cat sat")]])
    want = 1 * (1 - 0.5 * (1 / 3) ** 3)
    assert abs(per[0] - want) < 1e-9
    # morphological variant: zero under exact-only, credited via stems
    _, exact = metrics.meteor(
        [tok("dog running fast")], [[tok("dogs run fast")]], stem_weight=0.0
    )
    _, stemmed = metrics.meteor(
        [tok("dog running fast")], [[tok("dogs run fast")]]
    )
    assert stemmed[0] > exact[0] > 0.0
    # weighted mass: 1 exact + 2 stem matches -> P = (1 + 2*0.6)/3
    # (penalty uses the unweighted count of 3 contiguous matches)
    p = r = (1 + 2 * 0.6) / 3
    fmean = p * r / (0.9 * p + 0.1 * r)
    want = fmean * (1 - 0.5 * (1 / 3) ** 3)
    assert abs(stemmed[0] - want) < 1e-9
