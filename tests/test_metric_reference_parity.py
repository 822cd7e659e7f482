"""Quality-side parity pinning (VERDICT r1 #9, r2 #7): every scorer is
locked against INDEPENDENTLY-WRITTEN code on a fixed synthetic split —
BLEU vs nltk's corpus_bleu, ROUGE-L and CIDEr-D vs literal transcriptions
of the pycocoevalcap formulas (rouge.py / cider_scorer.py — the scorers
the reference runs through speaksee), and METEOR exact+stem vs an
exhaustive-search aligner implementing METEOR-1.5's lexicographic
objective. Golden values additionally freeze the exact numbers so drift
fails before it can skew a benchmark comparison.

Round-3 note: transcribing the pycocoevalcap formulas exposed two real
round-2 deviations, both fixed in eval/metrics.py — ROUGE-L used max-F
over references where pycocoevalcap combines the separately-maximized
precision and recall, and the METEOR greedy aligner under-scored vs the
chunk-minimizing objective. The goldens moved accordingly (deliberate).
"""

from collections import defaultdict

import numpy as np
import pytest

from patchioner_tpu.eval import metrics

# Fixed synthetic split: candidate/reference pairs with full 4-gram overlap
# somewhere in the corpus (keeps every BLEU order non-degenerate).
CANDS = [
    "a black dog sitting on a wooden table",
    "a man riding a horse on the beach",
    "two cats sleeping on the red couch",
    "a group of people standing around a kitchen counter",
    "the pizza is on the plate",
    "a red car parked next to a building",
    "a bird flying over the blue water",
    "children playing soccer in the park",
]
REFS = [
    ["a black dog sits on a wooden table", "a dog on a table"],
    ["a man rides a horse at the beach", "a person riding a horse"],
    ["two cats sleeping on a red couch", "cats asleep on the couch"],
    ["people standing around a kitchen counter",
     "a group of people in a kitchen"],
    ["a pizza is on the plate", "the pizza sits on a white plate"],
    ["a red car parked next to a building", "a car near a tall building"],
    ["a bird flies over blue water", "a seagull flying over the water"],
    ["children play soccer in the park", "kids playing football outside"],
]


def test_bleu_parity_vs_nltk():
    """Corpus BLEU-1..4 vs nltk's corpus_bleu (independent implementation
    of the same Papineni definition). Tolerance 1e-6, not exact: our bleu
    reproduces the speaksee/pycocoevalcap scorer's tiny=1e-15/small=1e-9
    ratio smoothing (the scorer the reference actually runs), which
    perturbs non-degenerate values by ~1e-9 relative vs nltk's unsmoothed
    ratios. The exact lock against that scorer's own formulas is
    test_bleu_parity_vs_pycocoevalcap_transcription below."""
    nltk_bleu = pytest.importorskip("nltk.translate.bleu_score")
    cand_t = [metrics.ptb_tokenize(c) for c in CANDS]
    refs_t = [[metrics.ptb_tokenize(r) for r in refs] for refs in REFS]
    ours, _ = metrics.bleu(cand_t, refs_t)
    for n in range(1, 5):
        weights = tuple([1.0 / n] * n)
        want = nltk_bleu.corpus_bleu(refs_t, cand_t, weights=weights)
        assert abs(ours[n - 1] - want) < 1e-6, (n, ours[n - 1], want)


def _pycoco_bleu(cand_t, refs_t, max_n=4):
    """Literal transcription of pycocoevalcap bleu_scorer.py
    compute_score(option='closest'): cook_test clipped counts, per-sentence
    cumulative smoothed ratios with tiny/small, ratio-based brevity on both
    the per-sentence and aggregated scores."""
    import math as _m
    from collections import Counter as _C

    def ngrams(words, n):
        return _C(tuple(words[i:i + n]) for i in range(len(words) - n + 1))

    tiny, small = 1e-15, 1e-9
    tot_guess = [0] * max_n
    tot_correct = [0] * max_n
    tot_testlen = tot_reflen = 0
    bleu_list = [[] for _ in range(max_n)]
    for test, refs in zip(cand_t, refs_t):
        reflen = min((abs(len(r) - len(test)), len(r)) for r in refs)[1]
        maxcounts = {}
        for ref in refs:
            for k in range(1, max_n + 1):
                for g, c in ngrams(ref, k).items():
                    maxcounts[g] = max(maxcounts.get(g, 0), c)
        testlen = len(test)
        guess = [max(0, testlen - k) for k in range(max_n)]
        correct = [0] * max_n
        for k in range(1, max_n + 1):
            for g, c in ngrams(test, k).items():
                correct[k - 1] += min(maxcounts.get(g, 0), c)
        tot_testlen += testlen
        tot_reflen += reflen
        for k in range(max_n):
            tot_guess[k] += guess[k]
            tot_correct[k] += correct[k]
        b = 1.0
        for k in range(max_n):
            b *= (float(correct[k]) + tiny) / (float(guess[k]) + small)
            bleu_list[k].append(b ** (1.0 / (k + 1)))
        ratio = (testlen + tiny) / (reflen + small)
        if ratio < 1:
            for k in range(max_n):
                bleu_list[k][-1] *= _m.exp(1 - 1 / ratio)
    bleus = []
    b = 1.0
    for k in range(max_n):
        b *= (float(tot_correct[k]) + tiny) / (float(tot_guess[k]) + small)
        bleus.append(b ** (1.0 / (k + 1)))
    ratio = (tot_testlen + tiny) / (tot_reflen + small)
    if ratio < 1:
        bleus = [v * _m.exp(1 - 1 / ratio) for v in bleus]
    return bleus, bleu_list


def test_bleu_parity_vs_pycocoevalcap_transcription():
    """Exact lock (1e-15) against a literal transcription of the
    speaksee/pycocoevalcap bleu_scorer the reference runs — INCLUDING the
    degenerate cases nltk and the scorer disagree on: zero n-gram matches
    at some order (tiny-positive, not 0) and testlen == reflen (ratio
    (L+tiny)/(L+small) < 1 applies a ~1e-9 brevity penalty)."""
    cand_t, refs_t = _tokenized()
    # add the degenerate cases on top of the shared corpus
    cand_t = cand_t + [
        ["completely", "different", "words", "here"],  # zero 2..4-gram hits
        ["same", "length", "as", "ref"],               # testlen == reflen
        ["one"],                                       # shorter than any ref
    ]
    refs_t = refs_t + [
        [["nothing", "matches", "at", "all", "anywhere"]],
        [["same", "size", "as", "cand"]],
        [["a", "much", "longer", "reference", "sentence"]],
    ]
    want_corpus, want_inst = _pycoco_bleu(cand_t, refs_t)
    ours, inst = metrics.bleu(cand_t, refs_t)
    for n in range(4):
        assert abs(ours[n] - want_corpus[n]) < 1e-15, (n, ours[n],
                                                       want_corpus[n])
        for i in range(len(cand_t)):
            assert abs(inst[i][n] - want_inst[n][i]) < 1e-15, (n, i)


def _tokenized():
    cand_t = [metrics.ptb_tokenize(c) for c in CANDS]
    refs_t = [[metrics.ptb_tokenize(r) for r in refs] for refs in REFS]
    return cand_t, refs_t


def _pycoco_lcs(string, sub):
    """Literal transcription of pycocoevalcap rouge.py my_lcs."""
    if len(string) < len(sub):
        sub, string = string, sub
    lengths = [[0] * (len(sub) + 1) for _ in range(len(string) + 1)]
    for j in range(1, len(sub) + 1):
        for i in range(1, len(string) + 1):
            if string[i - 1] == sub[j - 1]:
                lengths[i][j] = lengths[i - 1][j - 1] + 1
            else:
                lengths[i][j] = max(lengths[i - 1][j], lengths[i][j - 1])
    return lengths[len(string)][len(sub)]


def test_rouge_l_parity_vs_pycocoevalcap_transcription():
    """ROUGE-L must equal a literal transcription of pycocoevalcap
    rouge.py calc_score — max precision and max recall taken SEPARATELY
    over references (possibly from different refs), combined at beta=1.2."""
    cand_t, refs_t = _tokenized()
    beta = 1.2
    want = []
    for c, refs in zip(cand_t, refs_t):
        prec, rec = [], []
        for r in refs:
            lcs = _pycoco_lcs(r, c)
            prec.append(lcs / float(len(c)))
            rec.append(lcs / float(len(r)))
        pm, rm = max(prec), max(rec)
        want.append(
            ((1 + beta**2) * pm * rm) / (rm + beta**2 * pm)
            if pm != 0 and rm != 0 else 0.0
        )
    corpus, inst = metrics.rouge_l(cand_t, refs_t)
    np.testing.assert_allclose(inst, want, rtol=0, atol=1e-12)
    assert abs(corpus - sum(want) / len(want)) < 1e-12


def test_cider_d_parity_vs_pycocoevalcap_transcription():
    """CIDEr-D must equal a literal transcription of pycocoevalcap
    cider_scorer.py (tf-idf vectors with ref_len = log(#images), min-clipped
    dot, length-gaussian at sigma=6, averaged over refs and n, x10)."""
    cand_t, refs_t = _tokenized()
    n_max, sigma = 4, 6.0

    def precook(words):
        counts = defaultdict(int)
        for k in range(1, n_max + 1):
            for i in range(len(words) - k + 1):
                counts[tuple(words[i : i + k])] += 1
        return counts

    crefs = [[precook(r) for r in refs] for refs in refs_t]
    ctest = [precook(c) for c in cand_t]
    document_frequency = defaultdict(float)
    for refs in crefs:
        for ngram in set(ng for ref in refs for ng in ref):
            document_frequency[ngram] += 1
    ref_len = np.log(float(len(crefs)))

    def counts2vec(cnts):
        vec = [defaultdict(float) for _ in range(n_max)]
        length = 0
        norm = [0.0] * n_max
        for ngram, term_freq in cnts.items():
            df = np.log(max(1.0, document_frequency[ngram]))
            n = len(ngram) - 1
            vec[n][ngram] = float(term_freq) * (ref_len - df)
            norm[n] += pow(vec[n][ngram], 2)
            if n == 1:  # pycocoevalcap counts BIGRAMS here (its quirk)
                length += term_freq
        return vec, [np.sqrt(x) for x in norm], length

    def sim(vh, vr, nh, nr, lh, lr):
        delta = float(lh - lr)
        val = np.zeros(n_max)
        for n in range(n_max):
            for ngram, _ in vh[n].items():
                val[n] += min(vh[n][ngram], vr[n][ngram]) * vr[n][ngram]
            if nh[n] != 0 and nr[n] != 0:
                val[n] /= nh[n] * nr[n]
            val[n] *= np.e ** (-(delta**2) / (2 * sigma**2))
        return val

    want = []
    for test, refs in zip(ctest, crefs):
        vec, norm, length = counts2vec(test)
        score = np.zeros(n_max)
        for ref in refs:
            vr, nr, lr = counts2vec(ref)
            score += sim(vec, vr, norm, nr, length, lr)
        want.append(float(np.mean(score) / len(refs) * 10.0))
    corpus, inst = metrics.cider_d(cand_t, refs_t)
    np.testing.assert_allclose(inst, want, rtol=0, atol=1e-12)
    assert abs(corpus - sum(want) / len(want)) < 1e-12


def test_meteor_exact_stem_vs_exhaustive_aligner():
    """METEOR's beam-search aligner must reach the true optimum of the
    METEOR-1.5 objective (max covered words, then min chunks, then min
    total |i-j| match-start distance — the Java aligner's published
    tie-break — then max weighted mass) — verified against an
    independently-coded exhaustive search over all non-conflicting match
    subsets."""
    from patchioner_tpu.text.porter import stem

    cand_t, refs_t = _tokenized()
    alpha, beta_p, gamma, stem_w = 0.9, 3.0, 0.5, 0.6

    def best_alignment(cand, ref):
        by_i = {}
        for i, cw in enumerate(cand):
            for j, rw in enumerate(ref):
                w = 1.0 if cw == rw else (
                    stem_w if stem(cw) == stem(rw) else 0.0
                )
                if w > 0.0:
                    by_i.setdefault(i, []).append((j, w))
        idxs = sorted(by_i)
        best = [None]

        def rec(k, used_r, chosen):
            if k == len(idxs):
                if not chosen:
                    key = (0, 0, 0, 0.0)
                else:
                    cs = sorted(chosen)
                    chunks = 1
                    for (i1, j1, _), (i2, j2, _) in zip(cs, cs[1:]):
                        if i2 != i1 + 1 or j2 != j1 + 1:
                            chunks += 1
                    key = (len(chosen), -chunks,
                           -sum(abs(i - j) for i, j, _ in chosen),
                           sum(w for _, _, w in chosen))
                if best[0] is None or key > best[0]:
                    best[0] = key
                return
            i = idxs[k]
            rec(k + 1, used_r, chosen)
            for j, w in by_i[i]:
                if j not in used_r:
                    rec(k + 1, used_r | {j}, chosen + [(i, j, w)])

        rec(0, frozenset(), [])
        return best[0]

    def score_pair(cand, ref):
        b = best_alignment(cand, ref)
        if b is None or b[0] == 0:
            return 0.0
        count, negchunks, _negdist, wmass = b
        p = wmass / len(cand)
        r = wmass / len(ref)
        fmean = p * r / (alpha * p + (1 - alpha) * r)
        return fmean * (1 - gamma * ((-negchunks) / count) ** beta_p)

    want = [max(score_pair(c, r) for r in refs)
            for c, refs in zip(cand_t, refs_t)]
    corpus, inst = metrics.meteor(cand_t, refs_t)
    np.testing.assert_allclose(inst, want, rtol=0, atol=1e-12)


# Golden values for the fixed split, generated by
# `python -m tests.test_metric_reference_parity` and locked against the
# per-metric independent oracles above. Any scorer change that moves these
# is a behavior change and must be deliberate. (Round 3: ROUGE_L
# 0.844849 -> 0.857151 and METEOR 0.862907 -> 0.880905 — the oracle-exposed
# aligner/formula fixes described in the module docstring.)
GOLDEN = {
    "Bleu_1": 0.949153,
    "Bleu_2": 0.873524,
    "Bleu_3": 0.752369,
    "Bleu_4": 0.642448,
    "ROUGE_L": 0.857151,
    "CIDEr": 4.041725,
    "METEOR": 0.880905,
    "SPICE": 0.711932,
}


def test_metric_values_locked():
    # synonyms pinned OFF: the goldens lock the exact+stem variant, and
    # "auto" would silently change METEOR/SPICE on machines where an nltk
    # WordNet corpus happens to be installed.
    out = metrics.compute_all_metrics(CANDS, REFS, synonyms=None)
    got = {k: round(v[0], 6) for k, v in out.items()}
    assert set(got) == set(GOLDEN)
    for k, v in GOLDEN.items():
        assert abs(got[k] - v) < 5e-7, (k, got[k], v)


def test_variant_markers():
    m = metrics.variant_markers(synonyms=None)
    assert m == {"METEOR_variant": "exact+stem",
                 "SPICE_variant": "lexicon/exact+stem"}
    m2 = metrics.variant_markers(synonyms=lambda w: {w})
    assert m2["METEOR_variant"] == "exact+stem+synonym"


if __name__ == "__main__":
    out = metrics.compute_all_metrics(CANDS, REFS, synonyms=None)
    print({k: round(v[0], 6) for k, v in out.items()})
