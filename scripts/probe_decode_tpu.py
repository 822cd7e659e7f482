"""TPU probe: 30-step KV-cached greedy decode on-chip cost (the last
stage-table entry still quoted with the dispatch floor included)."""

import os as _os
import sys as _sys

# run as `python scripts/<probe>.py` OR `python -m scripts.<probe>`: put the
# repo root on sys.path BEFORE any patchioner_tpu import (the old fallback
# sat below the package imports and could never fire)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import sys

import jax
import jax.numpy as jnp

from patchioner_tpu.eval.chain_bench import chain_time
from patchioner_tpu.models import decap, gpt2

# persistent XLA cache: stop re-paying multi-minute tunnel compiles per process
from patchioner_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

B = 128


def main():
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}))
    sys.stdout.flush()
    gcfg = gpt2.GPT2Config(n_layer=4, n_head=4, n_embd=768,
                           dtype=jnp.bfloat16)
    params = jax.jit(
        lambda k: decap.init_decap(k, gcfg, prefix_size=768)
    )(jax.random.PRNGKey(0))
    prefix = jax.random.normal(jax.random.PRNGKey(1), (B, 768), jnp.float32)

    def link(prefix, params):
        toks, scores = decap.greedy_decode(params, prefix, gcfg)
        # keep the chain data-dependent without changing the prefix value
        return prefix + 0.0 * scores[:, None]

    r = chain_time(link, prefix, params, chain=8, reps=3)
    print(json.dumps({"variant": "greedy_decode_30step_b128", **r}))


if __name__ == "__main__":
    main()
