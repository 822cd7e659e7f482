"""Closed-form roofline cross-check of the ported-baseline measurement.

The headline ratio's baseline (bench._naive_reference_port) was revised
downward three times (PERF.md honesty log: 4.19 -> 2.14 -> 2.10 ->
1.744/1.755), every time by removing tunnel-RPC overhead wrongly charged
to it. This script ends the series with physics: an analytic FLOPs +
HBM-traffic model of the reference algorithms on a v5e —
  * stock encoder with MATERIALIZED (B, H, N, N) attention
    (src/model.py:783 semantics in eager/XLA-stock math),
  * growing-context decode re-forwarding the full context each step with
    the (B, T, V) LM head over EVERY position (src/decap/decap.py:131-155
    through HF GPT2LMHeadModel),
  * unfused two-matmul projection with a materialized (B, M) softmax
    (im2txtprojection.py:367-377),
each op costed at max(FLOPs / (eff * peak), bytes / HBM_BW).

Two uncertainty axes define the prediction band:
  * MXU efficiency 0.55-0.75 for flagship-shaped matmuls (the fused side
    measures 61.4% END-TO-END incl. decode, individual matmuls profile at
    ~65-75% — PERF.md round-3 profile), 0.40-0.60 for the decode's
    skinnier (B*t, 768) rows;
  * how many HBM round-trips XLA gives the 5.8 GB/layer attention logits:
    2 passes (softmax fully fused into the QK^T/PV pair) to 4 passes
    (write, softmax read+write, read).

Verdict rule: a measurement INSIDE the band is consistent with hardware
limits — no further revision warranted. A measurement far ABOVE the
fast bound would mean the baseline is still under-charged (ratio
overstated); far BELOW the slow bound would mean it carries overhead
that isn't the algorithm's (ratio understated).

Run: python -m scripts.baseline_roofline   (pure arithmetic, no devices)
Asserted by tests/test_perf_headline.py.
"""

from __future__ import annotations

import json

# flagship geometry (bench.py defaults)
B, N, D, H, LAYERS = 128, 1374, 768, 12, 12
VOCAB, GD, GLAYERS, T = 50257, 768, 4, 30
BANK_M = 591753

PEAK_BF16 = 197e12  # v5e MXU peak, FLOP/s
HBM_BW = 819e9      # v5e HBM bandwidth, B/s
BF16, F32 = 2, 4

EFF_LO, EFF_MID, EFF_HI = 0.55, 0.65, 0.75
DEC_EFF_LO, DEC_EFF_HI = 0.40, 0.60


def mm(m, n, k):
    return 2 * m * n * k


def op_time(flops, nbytes, eff):
    return max(flops / (eff * PEAK_BF16), nbytes / HBM_BW)


def encoder_ms(eff, logit_passes) -> float:
    """Stock-XLA encoder. `logit_passes` = HBM round-trips of the
    materialized (B, H, N, N) logits: 2 (max fusion) .. 4 (min fusion)."""
    hd = D // H
    ops = [
        # (flops, hbm bytes): weights + activations in/out, bf16
        (mm(B * N, 3 * D, D), (B * N * D + 3 * D * D + B * N * 3 * D) * BF16),
        # QK^T writes the logits once — the op the Pallas path deletes
        (mm(B * H * N, N, hd), (2 * B * N * D + B * H * N * N) * BF16),
        # softmax: any passes beyond the qk-write + pv-read are extra
        (5 * B * H * N * N, max(0, logit_passes - 2) * B * H * N * N * BF16),
        (mm(B * H * N, hd, N), (B * H * N * N + 2 * B * N * D) * BF16),
        (mm(B * N, D, D), (2 * B * N * D + D * D) * BF16),
        (mm(B * N, 4 * D, D), (B * N * D + 4 * D * D + B * N * 4 * D) * BF16),
        (mm(B * N, D, 4 * D), (B * N * 4 * D + 4 * D * D + B * N * D) * BF16),
        # LN x2 + residual x2 + GELU: ~6 elementwise passes of (B, N, D)
        (0, 6 * B * N * D * BF16),
    ]
    return LAYERS * sum(op_time(f, b, eff) for f, b in ops) * 1e3


def projection_ms(eff) -> float:
    flops = 2 * mm(B, BANK_M, D)  # sim + recombination
    nbytes = 2 * BANK_M * D * BF16 + 2 * B * BANK_M * F32  # bank x2, softmax
    return op_time(flops, nbytes, eff) * 1e3


def decode_ms(eff) -> float:
    """Growing-context: step t re-forwards t positions through 4 layers and
    the full-vocab LM head (HF computes logits for every position)."""
    total = 0.0
    for t in range(1, T + 1):
        flops = GLAYERS * (
            mm(B * t, 3 * GD, GD) + mm(B * t, GD, GD)
            + 2 * mm(B * t, 4 * GD, GD) + 2 * 2 * B * t * t * GD
        ) + mm(B * t, VOCAB, GD)
        nbytes = (
            (GLAYERS * (12 * GD * GD) + GD * VOCAB) * BF16  # weights/step
            + 10 * B * t * GD * BF16                         # activations
            + B * t * VOCAB * F32                            # logits out
        )
        total += op_time(flops, nbytes, eff)
    return total * 1e3


def predict() -> dict:
    fast = (encoder_ms(EFF_HI, 2) + projection_ms(EFF_HI)
            + decode_ms(DEC_EFF_HI))
    slow = (encoder_ms(EFF_LO, 4) + projection_ms(EFF_LO)
            + decode_ms(DEC_EFF_LO))
    mid = (encoder_ms(EFF_MID, 3) + projection_ms(EFF_MID) + decode_ms(0.5))
    return {
        "encoder_ms_band": [round(encoder_ms(EFF_HI, 2), 1),
                            round(encoder_ms(EFF_LO, 4), 1)],
        "decode_ms_band": [round(decode_ms(DEC_EFF_HI), 1),
                           round(decode_ms(DEC_EFF_LO), 1)],
        "projection_ms": round(projection_ms(EFF_MID), 1),
        "total_ms_band": [round(fast, 1), round(slow, 1)],
        "mid_ms": round(mid, 1),
        "captions_per_sec_band": [round(B / slow * 1e3, 1),
                                  round(B / fast * 1e3, 1)],
        "mid_captions_per_sec": round(B / mid * 1e3, 1),
        "eff_band": [EFF_LO, EFF_HI],
        "decode_eff_band": [DEC_EFF_LO, DEC_EFF_HI],
        "logit_passes_band": [2, 4],
    }


def check(measured_cps: float, tolerance: float = 0.03) -> bool:
    lo, hi = predict()["captions_per_sec_band"]
    return lo * (1 - tolerance) <= measured_cps <= hi * (1 + tolerance)


def main():
    p = predict()
    measured_cps = 204.0  # r4 builder session, floor-corrected (PERF.md)
    bench_r4 = 389.912 / 1.755  # BENCH_r04.json value / vs_baseline
    print(json.dumps(p, indent=2))
    lo, hi = p["captions_per_sec_band"]
    for name, v in (("builder ~204 cps", measured_cps),
                    (f"driver {bench_r4:.1f} cps (BENCH_r04)", bench_r4)):
        inside = check(v)
        print(f"{name}: {'INSIDE' if inside else 'OUTSIDE'} the roofline "
              f"band [{lo}, {hi}] captions/s (3% tolerance)")


if __name__ == "__main__":
    main()
