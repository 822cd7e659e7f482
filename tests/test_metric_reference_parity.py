"""Quality-side parity pinning (VERDICT r1 #9, r2 #7): every scorer is
locked against INDEPENDENTLY-WRITTEN code on a fixed synthetic split —
BLEU vs nltk's corpus_bleu, ROUGE-L and CIDEr-D vs literal transcriptions
of the pycocoevalcap formulas (rouge.py / cider_scorer.py — the scorers
the reference runs through speaksee), METEOR exact+stem vs an
exhaustive-search aligner implementing METEOR-1.5's lexicographic
objective, and SPICE vs a re-coded lexicon parser + optimal-matching
tuple-F1 scorer (round 4 — previously the one self-locked golden).
Golden values additionally freeze the exact numbers so drift
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


def _pycoco_rouge(cand_t, refs_t):
    """Literal transcription of pycocoevalcap rouge.py calc_score — max
    precision and max recall taken SEPARATELY over references (possibly
    from different refs), combined at beta=1.2."""
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
    return want


def test_rouge_l_parity_vs_pycocoevalcap_transcription():
    cand_t, refs_t = _tokenized()
    want = _pycoco_rouge(cand_t, refs_t)
    corpus, inst = metrics.rouge_l(cand_t, refs_t)
    np.testing.assert_allclose(inst, want, rtol=0, atol=1e-12)
    assert abs(corpus - sum(want) / len(want)) < 1e-12


def _pycoco_cider(cand_t, refs_t):
    """Literal transcription of pycocoevalcap cider_scorer.py (tf-idf
    vectors with ref_len = log(#images), min-clipped dot, length-gaussian
    at sigma=6, averaged over refs and n, x10)."""
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
    return want


def test_cider_d_parity_vs_pycocoevalcap_transcription():
    cand_t, refs_t = _tokenized()
    want = _pycoco_cider(cand_t, refs_t)
    corpus, inst = metrics.cider_d(cand_t, refs_t)
    np.testing.assert_allclose(inst, want, rtol=0, atol=1e-12)
    assert abs(corpus - sum(want) / len(want)) < 1e-12


def _meteor_oracle(cand_t, refs_t):
    """Exhaustive-search METEOR-1.5 oracle (exact+stem): the true optimum
    of (max covered words, then min chunks, then min total |i-j|
    match-start distance — the Java aligner's published tie-break — then
    max weighted mass), searched over all non-conflicting match subsets.
    Exponential in match options — callers keep sentences short / largely
    repeat-free."""
    from patchioner_tpu.text.porter import stem

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

    return [max(score_pair(c, r) for r in refs)
            for c, refs in zip(cand_t, refs_t)]


def test_meteor_exact_stem_vs_exhaustive_aligner():
    cand_t, refs_t = _tokenized()
    want = _meteor_oracle(cand_t, refs_t)
    corpus, inst = metrics.meteor(cand_t, refs_t)
    np.testing.assert_allclose(inst, want, rtol=0, atol=1e-12)


# ---------------------------------------------------------------------------
# SPICE oracle (VERDICT r3 #4): the SPICE golden was previously locked only
# to itself. Like the four scorers above, back it with independently-written
# code: (a) the scoring stage — duplicate-free tuple matching + P/R/F + mean
# All-F corpus aggregation, the semantics of the Java scorer the reference
# invokes (eval-trace-captioning/compute_scores.py:330-332) — implemented
# here with OPTIMAL bipartite matching (Kuhn's augmenting paths) where the
# package greedily scans in sorted order, and (b) the lexicon-parse rule set
# documented in eval/spice.py, re-coded from the spec with a different
# structure (explicit mention-record passes instead of the package's single
# scan-and-mutate loop). The Stanford dependency parser itself cannot be
# transcribed (JVM-bound); the lexicon variant is what the package documents
# and its CSVs mark.


def _oracle_spice_singulars(word):
    irregular = {
        "people": "person", "men": "man", "women": "woman",
        "children": "child", "feet": "foot", "teeth": "tooth",
        "geese": "goose", "mice": "mouse", "leaves": "leaf",
        "shelves": "shelf", "knives": "knife", "wolves": "wolf",
    }
    if word in irregular:
        return [irregular[word]]
    cands = []
    if word.endswith("ies") and len(word) > 3:
        cands.append(word[:-3] + "y")
    if len(word) > 4 and any(
        word.endswith(suf) for suf in ("sses", "ches", "shes", "xes", "zes")
    ):
        cands.append(word[:-2])
    if word.endswith("s") and not word.endswith("ss") and len(word) > 2:
        cands.append(word[:-1])
        if word.endswith("es") and len(word) > 3:
            cands.append(word[:-2])
    out = []
    for c in cands:
        if c not in out:
            out.append(c)
    return out if out else [word]


def _oracle_parse(tokens, lex):
    """Independent re-implementation of the eval/spice.py parse rules:
    stopword skip, predicative attributes after is/are, greedy longest
    object match with last-word lemmatization, single-word
    attribute-preference deferral, fused-label decomposition, claimed
    pre-nominal attributes (2-word span first), article/claimed-free
    relation spans between consecutive mentions."""
    stop = frozenset(
        "a an the this that these those there is are was were be been being "
        "with of in on at to from by for and or it its his her their as i "
        "you he she we they".split()
    )
    articles = {"a", "an", "the"}
    toks = [t.lower() for t in tokens]

    def obj_lookup(span):
        joined = " ".join(span)
        if joined in lex.objects:
            return joined
        for sing in _oracle_spice_singulars(span[-1]):
            alt = " ".join(list(span[:-1]) + [sing])
            if alt in lex.objects:
                return alt
        return None

    def longest_obj_at(pos):
        for width in range(min(lex.max_phrase, len(toks) - pos), 0, -1):
            head = obj_lookup(toks[pos:pos + width])
            if head is not None:
                return (pos, pos + width, head)
        return None

    # pass 1: mentions + predicative attributes
    mentions, predicative = [], []
    pos = 0
    while pos < len(toks):
        word = toks[pos]
        if word in stop:
            pos += 1
            continue
        if (
            pos > 0
            and toks[pos - 1] in ("is", "are")
            and word in lex.attributes
            and mentions
            and obj_lookup([word]) is None
        ):
            predicative.append((len(mentions) - 1, word))
            pos += 1
            continue
        hit = longest_obj_at(pos)
        if hit is not None and hit[1] - hit[0] == 1 and word in lex.attributes:
            # single-word object that also names an attribute: defer to a
            # following object mention if one starts at the next token
            if pos + 1 < len(toks) and longest_obj_at(pos + 1) is not None:
                hit = None
        if hit is None:
            pos += 1
            continue
        mentions.append(hit)
        pos = hit[1]

    # pass 2: decompose attribute-fused lexicon heads
    tuples = set()
    final_mentions = []
    for start, end, head in mentions:
        parts = head.split()
        while len(parts) > 1 and parts[0] in lex.attributes \
                and " ".join(parts[1:]) in lex.objects:
            tuples.add((" ".join(parts[1:]), parts[0]))
            parts = parts[1:]
        final_mentions.append((start, end, " ".join(parts)))
    for mention_idx, attr in predicative:
        tuples.add((final_mentions[mention_idx][2], attr))

    # pass 3: objects + claimed pre-nominal attributes
    covered = set()
    for start, end, _ in final_mentions:
        covered.update(range(start, end))
    claimed = set()
    for start, end, head in final_mentions:
        tuples.add((head,))
        for width in (2, 1):
            lo = start - width
            if lo < 0:
                continue
            idxs = range(lo, start)
            if any(k in covered or k in claimed for k in idxs):
                continue
            words = toks[lo:start]
            if any(w in articles for w in words):
                continue
            phrase = " ".join(words)
            if phrase in lex.attributes:
                tuples.add((head, phrase))
                claimed.update(idxs)
                break

    # pass 4: relations between consecutive mentions
    for (s1, e1, h1), (s2, e2, h2) in zip(final_mentions, final_mentions[1:]):
        span = [
            toks[k] for k in range(e1, s2)
            if toks[k] not in articles and k not in claimed
        ]
        if span and len(span) <= lex.max_phrase \
                and " ".join(span) in lex.relations:
            tuples.add((h1, " ".join(span), h2))
    return tuples


def _oracle_tuple_match(a, b, syn):
    if len(a) != len(b):
        return False
    return all(
        x == y or (syn is not None and syn(x) & syn(y))
        for x, y in zip(a, b)
    )


def _oracle_max_matching(cand_tuples, ref_tuples, syn):
    """Maximum-cardinality duplicate-free matching (Kuhn's augmenting
    paths) — an upper bound that the package's greedy-sorted scan must
    attain for its scores to be order-independent."""
    cand_list, ref_list = list(cand_tuples), list(ref_tuples)
    match_of_ref = {}

    def augment(ci, visited):
        for ri, r in enumerate(ref_list):
            if ri in visited or not _oracle_tuple_match(cand_list[ci], r, syn):
                continue
            visited.add(ri)
            if ri not in match_of_ref or augment(match_of_ref[ri], visited):
                match_of_ref[ri] = ci
                return True
        return False

    total = 0
    for ci in range(len(cand_list)):
        if augment(ci, set()):
            total += 1
    return total


def _oracle_spice_scores(cand_t, refs_t, lex, syn=None):
    per_f = []
    for cand, refs in zip(cand_t, refs_t):
        ct = _oracle_parse(cand, lex)
        rt = set()
        for r in refs:
            rt |= _oracle_parse(r, lex)
        if not ct or not rt:
            per_f.append(0.0)
            continue
        m = _oracle_max_matching(ct, rt, syn)
        p, r = m / len(ct), m / len(rt)
        per_f.append(2 * p * r / (p + r) if p + r else 0.0)
    corpus = sum(per_f) / len(per_f) if per_f else 0.0
    return corpus, per_f


def test_spice_parity_vs_independent_oracle():
    """Package SPICE == the independent oracle on the fixed split: identical
    tuple sets from the re-coded parse rules, identical per-instance F from
    optimal matching (exact matching makes greedy == optimal), and the
    corpus value equals the committed golden — so the golden is now backed
    by independent code, not by itself (VERDICT r3 #4)."""
    from patchioner_tpu.eval import spice as spice_mod

    lex = spice_mod.SpiceLexicon.vendored()
    cand_t = [metrics.ptb_tokenize(c) for c in CANDS]
    refs_t = [[metrics.ptb_tokenize(r) for r in refs] for refs in REFS]
    # tuple-set level: the re-coded parser agrees caption by caption
    for toks in cand_t + [r for refs in refs_t for r in refs]:
        assert _oracle_parse(toks, lex) == \
            spice_mod.parse_scene_graph(toks, lex), toks
    want_corpus, want_f = _oracle_spice_scores(cand_t, refs_t, lex)
    got_corpus, got_inst = spice_mod.spice(cand_t, refs_t, lexicon=lex)
    got_f = [e["All"]["f"] for e in got_inst]
    np.testing.assert_allclose(got_f, want_f, rtol=0, atol=1e-12)
    assert abs(got_corpus - want_corpus) < 1e-12
    assert abs(round(got_corpus, 6) - GOLDEN["SPICE"]) < 5e-7


def test_spice_matching_is_duplicate_free_and_optimal_under_synonyms():
    """The scoring stage in isolation, on hand-built tuple sets with a
    synonym table that creates many-to-many match options: each reference
    tuple may be consumed once (duplicate-free), and the greedy-sorted scan
    attains the optimal matching cardinality."""
    from patchioner_tpu.eval.spice import _prf

    groups = {"dog": {1}, "puppy": {1}, "canine": {1}, "cat": {2},
              "kitten": {2}, "small": {3}, "little": {3}}

    def syn(w):
        return frozenset(groups.get(w, set()))

    # two candidate ('dog',)-alikes, ONE matching reference: duplicate-free
    # matching must count 1, not 2
    cand = {("dog",), ("puppy",)}
    ref = {("canine",)}
    out = _prf(cand, ref, syn)
    assert out["p"] == 0.5 and out["r"] == 1.0
    assert _oracle_max_matching(cand, ref, syn) == 1

    # many-to-many: greedy in sorted order could strand a candidate if it
    # consumed the wrong reference; optimal is 2 and _prf must reach it
    cand = {("dog", "small"), ("puppy", "little"), ("cat",)}
    ref = {("canine", "little"), ("dog", "small"), ("kitten",)}
    out = _prf(cand, ref, syn)
    assert out["p"] == 1.0 and out["r"] == 1.0
    assert _oracle_max_matching(cand, ref, syn) == 3

    # arity mismatch never matches
    assert _prf({("dog",)}, {("dog", "small")}, syn)["f"] == 0.0


# ---------------------------------------------------------------------------
# Corpus fuzzing (round 4): the fixed split locks exact numbers; these
# sweep randomized corpora through the same independent oracles so the
# scorers cannot drift on shapes the split doesn't exercise (unequal ref
# counts, degenerate overlaps, repeated n-grams, empty tuple sets).

_FUZZ_VOCAB = (
    "a the dog cat man woman bird car tree table chair plate pizza water "
    "sky park street ball book light sign door window wall floor grass "
    "field horse sheep cow boat train plane cup fork glass bowl lamp shoe "
    "hat coat"
).split()

_SPICE_WORDS = (
    "a the black white small large wooden red dog cat man woman table "
    "chair pizza car bird tree on sitting standing near holding riding "
    "is are"
).split()


def _fuzz_corpus(rng, n=6):
    """Sentences sampled WITHOUT replacement (repeat-free) so the METEOR
    exhaustive oracle stays tractable; ref counts vary 1-3 per image."""
    def sent(lo=3, hi=8):
        k = int(rng.integers(lo, hi))
        return list(rng.choice(_FUZZ_VOCAB, size=k, replace=False))

    cand_t = [sent() for _ in range(n)]
    refs_t = [
        [sent() for _ in range(int(rng.integers(1, 4)))] for _ in range(n)
    ]
    return cand_t, refs_t


@pytest.mark.parametrize("seed", [101, 102, 103, 104])
def test_fuzz_bleu_rouge_cider_meteor_vs_oracles(seed):
    rng = np.random.default_rng(seed)
    for _ in range(4):
        cand_t, refs_t = _fuzz_corpus(rng)
        want_corpus, want_inst = _pycoco_bleu(cand_t, refs_t)
        ours, inst = metrics.bleu(cand_t, refs_t)
        for n in range(4):
            assert abs(ours[n] - want_corpus[n]) < 1e-15, (seed, n)
            for i in range(len(cand_t)):
                assert abs(inst[i][n] - want_inst[n][i]) < 1e-15, (seed, n, i)
        _, r_inst = metrics.rouge_l(cand_t, refs_t)
        np.testing.assert_allclose(
            r_inst, _pycoco_rouge(cand_t, refs_t), rtol=0, atol=1e-12)
        _, c_inst = metrics.cider_d(cand_t, refs_t)
        np.testing.assert_allclose(
            c_inst, _pycoco_cider(cand_t, refs_t), rtol=0, atol=1e-12)
        _, m_inst = metrics.meteor(cand_t, refs_t)
        np.testing.assert_allclose(
            m_inst, _meteor_oracle(cand_t, refs_t), rtol=0, atol=1e-12)


@pytest.mark.parametrize("seed", [201, 202, 203])
def test_fuzz_spice_vs_oracle(seed):
    """Random lexicon-word captions (articles/attributes/objects/relations
    mixed, so parses range from empty to multi-relation) through the
    re-coded parser + optimal-matching scorer."""
    from patchioner_tpu.eval import spice as spice_mod

    lex = spice_mod.SpiceLexicon.vendored()
    rng = np.random.default_rng(seed)

    def sent():
        k = int(rng.integers(2, 9))
        return [str(w) for w in rng.choice(_SPICE_WORDS, size=k)]

    for _ in range(6):
        cand_t = [sent() for _ in range(5)]
        refs_t = [
            [sent() for _ in range(int(rng.integers(1, 3)))]
            for _ in range(5)
        ]
        for toks in cand_t + [r for refs in refs_t for r in refs]:
            assert _oracle_parse(toks, lex) == \
                spice_mod.parse_scene_graph(toks, lex), toks
        want_corpus, want_f = _oracle_spice_scores(cand_t, refs_t, lex)
        got_corpus, got_inst = spice_mod.spice(cand_t, refs_t, lexicon=lex)
        np.testing.assert_allclose(
            [e["All"]["f"] for e in got_inst], want_f, rtol=0, atol=1e-12)
        assert abs(got_corpus - want_corpus) < 1e-12


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
