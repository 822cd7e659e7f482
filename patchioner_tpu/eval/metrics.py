"""Caption metrics: BLEU-1..4, METEOR (exact+stem), ROUGE-L, CIDEr-D.

The reference scores through `speaksee` (Java PTBTokenizer + the
pycocoevalcap scorer family, eval-trace-captioning/compute_scores.py:287-332).
This is a dependency-free reimplementation of those scorers' published
algorithms:

  * `ptb_tokenize` approximates Stanford PTBTokenizer's caption behavior
    (lowercase, strip punctuation, split) — identical on the alphanumeric
    captions these benchmarks use.
  * BLEU: corpus-level with closest-reference brevity penalty.
  * ROUGE-L: F_beta (beta=1.2) of the LCS, max over references, averaged.
  * CIDEr-D: tf-idf n-gram cosine (n=1..4) with length-gaussian damping
    (sigma=6) and the min-count clipping, x10 — the pycocoevalcap formulation.
  * METEOR implements the exact and Porter-stem stages of METEOR-1.5
    with its English module weights (1.0/0.6; alpha=0.9, gamma=0.5,
    beta=3 fragmentation penalty). The Java aligner's synonym/paraphrase
    stages need its external resource tables — documented approximation.

All scorers return (corpus_score, per_instance_scores).
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict
from typing import Dict, List, Sequence, Tuple

__all__ = [
    "ptb_tokenize",
    "bleu",
    "rouge_l",
    "cider_d",
    "meteor",
    "compute_all_metrics",
]

_PUNCT = re.compile(r"[^\w\s]")
_WS = re.compile(r"\s+")


def ptb_tokenize(text: str) -> List[str]:
    text = _PUNCT.sub(" ", text.lower())
    return _WS.sub(" ", text).strip().split()


def _ngrams(tokens: Sequence[str], n: int) -> Counter:
    return Counter(tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1))


# -------------------------------------------------------------------- BLEU


def bleu(
    candidates: Sequence[List[str]],
    references: Sequence[List[List[str]]],
    max_n: int = 4,
) -> Tuple[List[float], List[List[float]]]:
    """Corpus BLEU-1..4. Returns ([bleu1..bleu4], per-instance sentence bleu
    computed with the same formula per image)."""

    def stats(cand, refs):
        clipped = []
        totals = []
        for n in range(1, max_n + 1):
            cg = _ngrams(cand, n)
            max_ref = Counter()
            for r in refs:
                rg = _ngrams(r, n)
                for g, c in rg.items():
                    max_ref[g] = max(max_ref[g], c)
            clipped.append(sum(min(c, max_ref[g]) for g, c in cg.items()))
            totals.append(max(sum(cg.values()), 0))
        # closest reference length
        lc = len(cand)
        lr = min((abs(len(r) - lc), len(r)) for r in refs)[1] if refs else 0
        return clipped, totals, lc, lr

    agg_c = [0] * max_n
    agg_t = [0] * max_n
    agg_lc = agg_lr = 0
    per_instance: List[List[float]] = []
    for cand, refs in zip(candidates, references):
        c, t, lc, lr = stats(cand, refs)
        for n in range(max_n):
            agg_c[n] += c[n]
            agg_t[n] += t[n]
        agg_lc += lc
        agg_lr += lr
        inst = []
        bp_i = 1.0 if lc > lr else math.exp(1 - lr / lc) if lc > 0 else 0.0
        logp = 0.0
        for n in range(max_n):
            p = (c[n] / t[n]) if t[n] > 0 and c[n] > 0 else 0.0
            logp += math.log(p) if p > 0 else -1e9
            inst.append(bp_i * math.exp(logp / (n + 1)))
        per_instance.append(inst)

    bp = 1.0 if agg_lc > agg_lr else (
        math.exp(1 - agg_lr / agg_lc) if agg_lc > 0 else 0.0
    )
    corpus = []
    logp = 0.0
    for n in range(max_n):
        p = (agg_c[n] / agg_t[n]) if agg_t[n] > 0 and agg_c[n] > 0 else 0.0
        logp += math.log(p) if p > 0 else -1e9
        corpus.append(bp * math.exp(logp / (n + 1)))
    return corpus, per_instance


# ----------------------------------------------------------------- ROUGE-L


def _lcs_len(a: Sequence[str], b: Sequence[str]) -> int:
    if not a or not b:
        return 0
    dp = [0] * (len(b) + 1)
    for x in a:
        prev = 0
        for j, y in enumerate(b, 1):
            cur = dp[j]
            dp[j] = prev + 1 if x == y else max(dp[j], dp[j - 1])
            prev = cur
    return dp[-1]


def rouge_l(
    candidates: Sequence[List[str]],
    references: Sequence[List[List[str]]],
    beta: float = 1.2,
) -> Tuple[float, List[float]]:
    scores = []
    for cand, refs in zip(candidates, references):
        best = 0.0
        for r in refs:
            lcs = _lcs_len(cand, r)
            if lcs == 0:
                continue
            prec = lcs / len(cand) if cand else 0.0
            rec = lcs / len(r) if r else 0.0
            if prec and rec:
                f = ((1 + beta**2) * prec * rec) / (rec + beta**2 * prec)
                best = max(best, f)
        scores.append(best)
    return (sum(scores) / len(scores) if scores else 0.0), scores


# ----------------------------------------------------------------- CIDEr-D


def cider_d(
    candidates: Sequence[List[str]],
    references: Sequence[List[List[str]]],
    n_max: int = 4,
    sigma: float = 6.0,
) -> Tuple[float, List[float]]:
    """pycocoevalcap CIDEr-D: per-n tf-idf vectors, min-clipped dot with the
    reference vector, length-gaussian damping, averaged over refs and n, x10."""
    num_images = len(references)
    doc_freq: Dict[tuple, int] = defaultdict(int)
    ref_counts = []
    for refs in references:
        seen = set()
        per_ref = []
        for r in refs:
            cnts = Counter()
            for n in range(1, n_max + 1):
                cnts.update(_ngrams(r, n))
            per_ref.append(cnts)
            seen |= set(cnts)
        ref_counts.append(per_ref)
        for g in seen:
            doc_freq[g] += 1
    log_n = math.log(max(num_images, 1))

    def to_vec(cnts: Counter):
        vec = [defaultdict(float) for _ in range(n_max)]
        norm = [0.0] * n_max
        length = 0
        for g, tf in cnts.items():
            idf = log_n - math.log(max(1.0, doc_freq[g]))
            n = len(g) - 1
            vec[n][g] = tf * idf
            norm[n] += vec[n][g] ** 2
            if n == 0:
                length += tf
        return vec, [math.sqrt(x) for x in norm], length

    scores = []
    for cand, per_ref in zip(candidates, ref_counts):
        c_cnts = Counter()
        for n in range(1, n_max + 1):
            c_cnts.update(_ngrams(cand, n))
        cv, cn, cl = to_vec(c_cnts)
        img_score = 0.0
        for r_cnts in per_ref:
            rv, rn, rl = to_vec(r_cnts)
            delta = float(cl - rl)
            sim_total = 0.0
            for n in range(n_max):
                num = sum(min(cv[n][g], rv[n][g]) * rv[n][g] for g in cv[n])
                if cn[n] and rn[n]:
                    val = num / (cn[n] * rn[n])
                else:
                    val = 0.0
                val *= math.exp(-(delta**2) / (2 * sigma**2))
                sim_total += val
            img_score += sim_total / n_max
        scores.append(10.0 * img_score / max(len(per_ref), 1))
    return (sum(scores) / len(scores) if scores else 0.0), scores


# ------------------------------------------------------------------ METEOR


def meteor(
    candidates: Sequence[List[str]],
    references: Sequence[List[List[str]]],
    alpha: float = 0.9,
    beta: float = 3.0,
    gamma: float = 0.5,
    stem_weight: float = 0.6,
) -> Tuple[float, List[float]]:
    """METEOR with exact + Porter-stem match stages.

    The reference scores METEOR with the Java METEOR-1.5 jar (speaksee,
    used by its eval-*-captioning pipelines), whose English config runs
    exact, stem, synonym and paraphrase modules with weights
    (1.0, 0.6, 0.8, 0.6). We implement the first two (the synonym and
    paraphrase tables are external resources); exact matches are tried
    first, then Porter-stem matches over the leftovers at `stem_weight`.
    Precision/recall use the weighted match mass; the fragmentation
    penalty uses the unweighted match count, as in METEOR-1.5.
    Set `stem_weight=0` for pure exact-match scoring.
    """
    from patchioner_tpu.text.porter import stem as _stem

    def align(cand, ref):
        ref_used = [False] * len(ref)
        cand_used = [False] * len(cand)
        matches = []  # (i, j, weight)
        for i, w in enumerate(cand):
            for j, r in enumerate(ref):
                if not ref_used[j] and r == w:
                    ref_used[j] = True
                    cand_used[i] = True
                    matches.append((i, j, 1.0))
                    break
        if stem_weight > 0.0:
            cand_stems = [_stem(w) for w in cand]
            ref_stems = [_stem(r) for r in ref]
            for i, ws in enumerate(cand_stems):
                if cand_used[i]:
                    continue
                for j, rs in enumerate(ref_stems):
                    if not ref_used[j] and rs == ws:
                        ref_used[j] = True
                        cand_used[i] = True
                        matches.append((i, j, stem_weight))
                        break
        m = len(matches)
        if m == 0:
            return 0.0
        matches.sort()
        chunks = 1
        for (i1, j1, _), (i2, j2, _) in zip(matches, matches[1:]):
            if i2 != i1 + 1 or j2 != j1 + 1:
                chunks += 1
        wsum = sum(w for _, _, w in matches)
        p = wsum / len(cand)
        r = wsum / len(ref)
        fmean = p * r / (alpha * p + (1 - alpha) * r)
        penalty = gamma * (chunks / m) ** beta
        return fmean * (1 - penalty)

    scores = []
    for cand, refs in zip(candidates, references):
        scores.append(max((align(cand, r) for r in refs), default=0.0))
    return (sum(scores) / len(scores) if scores else 0.0), scores


# ------------------------------------------------------------------- suite


def compute_all_metrics(
    candidates: Sequence[str],
    references: Sequence[Sequence[str]],
) -> dict:
    """Tokenize and run the full scorer family. Returns
    {metric: (corpus, per_instance)} with the reference CSV's metric names
    (compute_scores.py:308-357)."""
    cand_t = [ptb_tokenize(c) for c in candidates]
    refs_t = [[ptb_tokenize(r) for r in refs] for refs in references]
    b, b_inst = bleu(cand_t, refs_t)
    r, r_inst = rouge_l(cand_t, refs_t)
    c, c_inst = cider_d(cand_t, refs_t)
    m, m_inst = meteor(cand_t, refs_t)
    out = {
        "BLEU-1": (b[0], [x[0] for x in b_inst]),
        "BLEU-2": (b[1], [x[1] for x in b_inst]),
        "BLEU-3": (b[2], [x[2] for x in b_inst]),
        "BLEU-4": (b[3], [x[3] for x in b_inst]),
        "ROUGE-L": (r, r_inst),
        "CIDEr": (c, c_inst),
        "METEOR": (m, m_inst),
    }
    return out
