"""A/B the padded-qkv attention extraction (keep_qkv_padded) on real TPU.

The fusedqkv path pads the token axis to N%128==0; the device profile
(PERF.md "Timeline profile") attributed ~3.3 ms/batch of the flagship step
to the final unpad slices, of which the (B, N, 3D) qkv_last copy is ~2 ms.
`vit_forward(keep_qkv_padded=True)` + `process_self_attention(num_real_k=)`
skips that copy with bitwise-identical extraction
(tests/test_vit.py::test_padded_qkv_attention_extraction_exact).

This probe times the FULL flagship caption step both ways in one session
(pipelined, dispatch-amortized) and asserts token equality.

Usage: python scripts/probe_unpad_tpu.py [iters=20] [batch=128]
"""

import os as _os
import sys as _sys

# run as `python scripts/<probe>.py` OR `python -m scripts.<probe>`: put the
# repo root on sys.path BEFORE any patchioner_tpu import (the old fallback
# sat below the package imports and could never fire)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from patchioner_tpu.utils.compile_cache import enable_compile_cache


def main():
    enable_compile_cache()
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    import __graft_entry__ as g
    from patchioner_tpu.models import decap, vit
    from patchioner_tpu.ops import memory_projection as memproj
    from patchioner_tpu.ops import region_pooling as rp

    vit_cfg, vit_params, gcfg, decoder, bank = g._flagship(
        591753, dtype=jnp.bfloat16
    )
    n_real = vit_cfg.num_global_tokens + vit_cfg.grid_size**2

    def make_step(keep_padded: bool):
        def step(state, pixels, pts, valid):
            outs = vit.vit_forward(
                state["vit"], pixels, vit_cfg, keep_qkv_padded=keep_padded
            )
            self_attn, _ = vit.process_self_attention(
                outs["qkv_last"],
                num_heads=vit_cfg.extract_heads,
                num_global_tokens=vit_cfg.num_global_tokens,
                scale=vit_cfg.extract_scale,
                num_real_k=n_real if keep_padded else None,
            )
            grid = rp.traces_to_grid(pts, valid, vit_cfg.grid_size)
            feats = rp.trace_pool(outs["x_norm_patchtokens"], grid, self_attn)
            bk = memproj.PreparedBank(
                state["bank_rows"], state["bank_inv"], bank.num_real
            )
            prefix = memproj.memory_project(
                feats, bk, normalize=True, use_pallas=True
            )
            tokens, _ = decap.greedy_decode(state["decoder"], prefix, gcfg)
            return tokens

        return jax.jit(step)

    state = {
        "vit": vit_params,
        "decoder": decoder,
        "bank_rows": bank.rows,
        "bank_inv": bank.inv_norm,
    }
    rng = np.random.default_rng(0)
    pixels = jnp.asarray(
        rng.standard_normal((batch, 518, 518, 3)), jnp.bfloat16
    )
    pts = jnp.asarray(rng.uniform(0, 1, (batch, 64, 2)), jnp.float32)
    valid = jnp.ones((batch, 64), jnp.float32)

    results = {}
    toks = {}
    for name, keep in (("sliced", False), ("padded", True)):
        step = make_step(keep)
        t0 = time.perf_counter()
        out = step(state, pixels, pts, valid)
        _ = np.asarray(out[0, :1])  # sync (block_until_ready no-ops on axon)
        print(f"{name}: first call {time.perf_counter() - t0:.1f}s")
        toks[name] = np.asarray(out)
        # pipelined steady state: keep iters batches in flight, sync once
        t0 = time.perf_counter()
        outs = [step(state, pixels, pts, valid) for _ in range(iters)]
        _ = np.asarray(outs[-1][0, :1])
        dt = (time.perf_counter() - t0) / iters * 1e3
        results[name] = dt
        print(f"{name}: {dt:.1f} ms/batch pipelined "
              f"({batch / dt * 1e3:.1f} captions/s)")

    eq = (toks["sliced"] == toks["padded"]).mean()
    print(f"token equality sliced vs padded: {eq:.4f}")
    d = results["sliced"] - results["padded"]
    print(f"padded saves {d:+.2f} ms/batch "
        f"({d / results['sliced'] * 100:+.2f}%)")
    # the timing comparison is only valid if the extraction is in fact
    # bit-identical on this backend (the docstring's contract)
    assert eq == 1.0, (
        f"padded-qkv extraction diverges on this backend (agreement {eq:.4f})"
        " — do NOT adopt keep_qkv_padded from this A/B"
    )


if __name__ == "__main__":
    main()
