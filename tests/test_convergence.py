"""End-to-end convergence proof at CPU test scale (VERDICT r4 missing #1).

Runs the full learn-to-caption loop — contrastive tower alignment, text-only
DeCap training through the production CLI, support-memory bank build, the
REAL trace-captioning eval + scorers over on-disk JPEGs — on the synthetic
closed-vocabulary world, and pins discriminative thresholds. Every other
test in the suite proves operator parity; this one proves the system
LEARNS (reference loop: src/decap/decoderTraining.py:62-387 ->
src/decap/decap.py:116-183 -> eval_trace_captioning.py:110-486).

Thresholds carry wide margins below the measured values (calibration run,
2026-08-20 CPU: align retrieval 1.0, train/held-out reconstruction
1.0/1.0, eval exact-match 0.90, CIDEr 9.4 vs shuffled control 1.5) so
they gate regressions, not noise. ~6-7 min on this box — the single most
expensive test in the suite, and the only one that would catch a silent
break in the train->bank->eval->score composition (the committed
grid-rehearsal reports score 0.0 by design and cannot).
"""

import json
import os

import pytest


@pytest.fixture(scope="module")
def proof(tmp_path_factory):
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo not in sys.path:
        sys.path.insert(0, repo)
    from scripts import convergence_proof as cp

    out = tmp_path_factory.mktemp("convergence")
    info = cp.run_proof(str(out), cp.TEST, seed=0, verbose=False)
    # keep the artifact inspectable on failure
    print(json.dumps(
        {k: v for k, v in info.items() if k != "reconstruction"},
        indent=2, default=float,
    ))
    return info


def test_alignment_learns_retrieval(proof):
    assert proof["align_retrieval_acc"] >= 0.85


def test_decoder_converges(proof):
    assert proof["decoder_last_epoch"]["loss"] < proof[
        "decoder_first_epoch"]["loss"] * 0.5
    assert proof["decoder_last_epoch"]["acc"] >= 0.95


def test_reconstruction_train_and_held_out(proof):
    rec = proof["reconstruction"]
    assert rec["train_exact_match"] >= 0.85
    assert rec["train_token_acc"] >= 0.9
    # captions never seen by ANY training stage — compositional
    # generalization of the text-only-trained decoder
    assert rec["held_out_exact_match"] >= 0.5
    assert rec["held_out_token_acc"] >= 0.7


def test_real_eval_scores_discriminative(proof):
    es, cs = proof["eval_scores"], proof["control_scores"]
    assert proof["eval_exact_match"] >= 0.5
    assert es["CIDEr"] >= 4.0
    # the shuffled-GT control must collapse: same grammar keeps some n-gram
    # credit, but a >=3x CIDEr gap separates "learned" from "plumbing
    # accident" (a pred/ref misalignment scores like the control)
    assert es["CIDEr"] >= 3.0 * cs["CIDEr"]
    assert es["Bleu_4"] >= 2.0 * cs["Bleu_4"]


def test_viecap_mapper_learns(proof):
    """Loss-level convergence of the ViECap mapping network through
    train/prefix_cli.py. Caption-level quality is structurally out of
    reach offline (the reference rides a frozen PRETRAINED GPT-2), but the
    trainable component must still steer the frozen LM toward the caption
    tokens: loss down, teacher-forced accuracy up vs the first epoch."""
    vm = proof["viecap_mapper"]
    assert vm["last_epoch"]["loss"] <= vm["first_epoch"]["loss"] - 0.15
    assert vm["last_epoch"]["acc"] >= 1.5 * max(
        vm["first_epoch"]["acc"], 0.05
    )


def test_held_out_images_inherit_support(proof):
    # held-out-combo images can only be captioned via nearest support
    # captions; partial n-gram credit should still be far above zero
    assert proof["held_out_image_scores"]["Bleu_1"] >= 0.5
