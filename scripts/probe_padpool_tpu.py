"""A/B the padded-pooling lever on the flagship caption step (PERF.md r5).

Round-3's profile charged ~3.3 ms/batch to the final (B, N, D) unpad
slice. `vit_forward(keep_tokens_padded=True)` + `trace_pool_padded`
absorb it into the pooling contraction. Both variants are built, token-
checked for equality, then timed INTERLEAVED in one process (A/B/A/B x
reps, pipelined batches) so tunnel drift can't masquerade as a win —
the expected effect (~1%) is smaller than cross-session variance.

Run: python -m scripts.probe_padpool_tpu [iters_per_rep] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax


def main():
    from patchioner_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    import __graft_entry__ as ge
    import jax.numpy as jnp

    on_tpu = jax.default_backend() not in ("cpu",)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    batch, bank = 128, 591753 if on_tpu else 4096
    vit_cfg, vit_params, gcfg, decoder, pbank = ge._flagship(bank, dtype=dtype)
    state = ge.make_state(vit_params, decoder, pbank)
    args = ge.example_inputs(batch)

    steps = {}
    for name, flag in (("unpad", ""), ("padpool", "1")):
        os.environ["PATCHIONER_BENCH_PADPOOL"] = flag
        step = jax.jit(
            ge.make_caption_step(vit_cfg, gcfg, on_tpu, pbank.num_real)
        )
        steps[name] = step

    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf[(0,) * leaf.ndim])
        return out

    # token equality first (also serves as the compile+warmup pass)
    toks = {}
    for name, step in steps.items():
        t0 = time.time()
        toks[name], _ = step(state, *args)
        sync(toks[name])
        print(f"{name}: compiled+ran in {time.time() - t0:.1f}s", flush=True)
    same = bool(np.array_equal(np.asarray(toks["unpad"]),
                               np.asarray(toks["padpool"])))
    print(f"tokens identical: {same}")
    assert same, "padded pooling changed the captions — do not land"

    times = {"unpad": [], "padpool": []}
    for r in range(reps):
        for name in ("unpad", "padpool") if r % 2 == 0 else ("padpool",
                                                            "unpad"):
            step = steps[name]
            out = None
            t0 = time.perf_counter()
            for _ in range(iters):
                out = step(state, *args)
            sync(out)
            dt = (time.perf_counter() - t0) / iters * 1e3
            times[name].append(dt)
            print(f"rep {r} {name}: {dt:.1f} ms/batch", flush=True)
    for name, ts in times.items():
        print(f"{name}: mean {np.mean(ts):.2f} ms  min {np.min(ts):.2f}  "
              f"all {['%.1f' % t for t in ts]}")
    delta = np.mean(times["unpad"]) - np.mean(times["padpool"])
    print(f"padpool saves {delta:+.2f} ms/batch "
          f"({delta / np.mean(times['unpad']) * 100:+.2f}%)")


if __name__ == "__main__":
    main()
