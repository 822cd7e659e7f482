"""TPU probe: every decoder family's decode loop at GPT-2-base scale.

The flagship (DeCap 4-layer) decode is chain-timed at 12.9 ms/batch
(PERF.md); this probe measures the ALTERNATIVE families the eval grids
exercise — ViECap greedy/beam/contrastive and ClipCap top-p sampling —
each over the real 12-layer/768-d GPT-2 geometry (random weights, bf16),
plus the DeCap reference point at the same geometry. All loops are
KV-cached `lax.scan` programs; timings are submit+sync wall clock per
batch (the serving-relevant number; the ~30 ms tunnel dispatch floor is
included, so treat deltas as the signal — on a TPU VM subtract ~30 ms).

Host detokenization is excluded via a stub tokenizer (no GPT-2 vocab
ships in this zero-egress image; clip-BPE detok was measured separately
at 5.6 ms/batch in the eval harness).

Usage: python -m scripts.probe_decoders_tpu [B] (default 64)
"""

import os as _os
import sys as _sys

# run as `python scripts/<probe>.py` OR `python -m scripts.<probe>`: put the
# repo root on sys.path BEFORE any patchioner_tpu import (the old fallback
# sat below the package imports and could never fire)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from patchioner_tpu.models import clipcap, decap, gpt2, viecap
from patchioner_tpu.utils.compile_cache import enable_compile_cache


class StubTokenizer:
    """encode/decode shims so the search wrappers run without a GPT-2
    vocab; '.'-id matches the real tokenizer's 13."""

    pad_token_id = 0

    def encode(self, text):
        return [13 for _ in text.split()] or [13]

    def decode(self, ids):
        return " ".join(str(int(i)) for i in ids)


def timed(label, fn, reps=3):
    out = fn()  # warmup/compile
    jax.tree_util.tree_map(np.asarray, out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.tree_util.tree_map(np.asarray, out)
        times.append((time.perf_counter() - t0) * 1000)
    print(json.dumps({"decoder": label, "ms_per_batch": round(min(times), 1),
                      "times_ms": [round(t, 1) for t in times]}))
    sys.stdout.flush()


def main():
    enable_compile_cache()
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    print(json.dumps({"devices": [str(d) for d in jax.devices()], "B": b}))
    sys.stdout.flush()
    cfg = gpt2.GPT2Config(dtype=jnp.bfloat16)  # 12L / 768 / 50257
    params = jax.jit(lambda k: gpt2.init_gpt2(k, cfg))(jax.random.PRNGKey(0))
    tok = StubTokenizer()
    rng = np.random.default_rng(0)
    # soft-prompt rows as the searches see them (ViECap continuous prompt
    # length 10 — src/viecap/entrypoint.py defaults)
    embeds = jnp.asarray(rng.standard_normal((b, 10, 768)), jnp.bfloat16)

    timed("viecap_greedy_30tok",
          lambda: viecap._greedy_tokens(params, embeds, cfg, 30))
    # beam search is per-sample by reference design (search.py:193-285
    # beams ONE image's prompt) — time a single image, not the batch
    timed("viecap_beam5_30tok_per_image",
          lambda: viecap.beam_search(
              params, np.asarray(embeds[:1], np.float32),
              cfg, tok, beam_width=5, max_len=30))
    # ...and the vmapped all-images-in-one-program variant the captioner
    # actually runs (token-exact per image; this row / B vs the row above
    # is the batching win)
    timed(f"viecap_beam5_30tok_batched_B{b}",
          lambda: viecap.beam_search_batched(
              params, np.asarray(embeds, np.float32),
              cfg, tok, beam_width=5, max_len=30))
    timed("viecap_contrastive_a0.1_k5_30tok",
          lambda: viecap.contrastive_search(
              params, np.asarray(embeds, np.float32), cfg, tok,
              alpha=0.1, top_k=5, max_len=30))

    key = jax.random.PRNGKey(1)
    timed("clipcap_top_p0.8_67tok",
          lambda: clipcap._sample_tokens(
              params, embeds, key, cfg, 67, 13, 0.8, 1.0))

    dec = jax.jit(
        lambda k: decap.init_decap(k, cfg, prefix_size=768)
    )(jax.random.PRNGKey(2))
    prefix = jnp.asarray(rng.standard_normal((b, 768)), jnp.bfloat16)
    timed("decap_greedy_30tok_12L_with_scores",
          lambda: decap.greedy_decode(dec, prefix, cfg))
    # the caption pipelines discard scores inside ONE jitted program, so
    # the per-step vocab log_softmax is dead code there — this is the
    # number comparable to the viecap greedy row
    tokens_only = jax.jit(lambda d, p: decap.greedy_decode(d, p, cfg)[0])
    timed("decap_greedy_30tok_12L_tokens_only",
          lambda: tokens_only(dec, prefix))


if __name__ == "__main__":
    main()
