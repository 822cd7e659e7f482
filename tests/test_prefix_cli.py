"""Prefix-mapper training CLI (ViECap / ClipCap mains) + checkpoint
round-trip into the decoder-family entry points.

Reference cycle being reproduced: src/viecap/training/main.py trains the
MappingNetwork and torch.saves it; viecap/entrypoint.py:82-96 torch.loads
it for inference. Here the CLI writes Orbax train states and the nested
config block's `weight_path` pointed at the out_dir restores the mapper.
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from patchioner_tpu.io.checkpoints import (
    CheckpointManager,
    load_mapper_from_train_dir,
)
from patchioner_tpu.train import prefix_cli


def make_corpus(tmp_path, n=16, dim=16):
    anns = [{"image_id": i, "caption": f"a photo of thing {i} on a table"}
            for i in range(n)]
    p = tmp_path / "caps.json"
    p.write_text(json.dumps({"annotations": anns}))
    feats = np.random.default_rng(0).standard_normal((n, dim)).astype(
        np.float32)
    fp = tmp_path / "feats.npy"
    np.save(fp, feats)
    return str(p), str(fp)


def test_viecap_cli_trains_resumes_and_round_trips(tmp_path):
    p, fp = make_corpus(tmp_path)
    out = tmp_path / "viecap_ckpt"
    argv = [
        "--model", "viecap", "--data", p, "--features", fp,
        "--out_dir", str(out), "--epochs", "1", "--bs", "8",
        "--num_layers", "2", "--n_layer", "1", "--n_head", "2",
        "--n_embd", "768", "--vocab_size", "101", "--max_seq_len", "12",
        "--limit_steps", "1", "--allow_random",
    ]
    prefix_cli.main(argv)
    assert (out / "train_log.csv").exists()
    assert json.load(open(out / "mapper_meta.json"))["model"] == "viecap"
    assert CheckpointManager(str(out)).latest_step() == 1

    # resume continues
    prefix_cli.main(argv + ["--resume", "--limit_steps", "2"])
    assert CheckpointManager(str(out)).latest_step() == 2

    trained = load_mapper_from_train_dir(str(out))
    assert "prefix_const" in trained and len(trained["layers"]) == 2

    # the trained mapper loads through the ORCHESTRATOR's nested viecap
    # block by pointing weight_path at the train dir
    from patchioner_tpu.models import patchioner as pa

    vc = pa._build_viecap_family(
        {"weight_path": str(out), "clip_hidden_size": 16},
        None, jax.random.PRNGKey(0), True, None, None,
    )
    np.testing.assert_array_equal(
        np.asarray(vc.mapping_params["linear"]["w"]),
        np.asarray(trained["linear"]["w"]))
    # the restored mapper RUNS (None biases must survive the Orbax
    # round-trip as empty nodes)
    from patchioner_tpu.models import viecap as viecap_mod

    soft = viecap_mod.mapping_network_forward(
        vc.mapping_params,
        jnp.asarray(np.random.default_rng(1).standard_normal((2, 16)),
                    jnp.float32),
        vc.cfg, 768)
    assert soft.shape == (2, vc.cfg.continuous_prompt_length, 768)
    assert np.isfinite(np.asarray(soft)).all()


def test_clipcap_cli_trains_and_round_trips(tmp_path, monkeypatch):
    p, fp = make_corpus(tmp_path)
    out = tmp_path / "clipcap_ckpt"
    prefix_cli.main([
        "--model", "clipcap", "--data", p, "--features", fp,
        "--out_dir", str(out), "--epochs", "1", "--bs", "8",
        "--prefix_length", "3", "--n_layer", "1", "--n_head", "2",
        "--n_embd", "768", "--vocab_size", "101", "--max_seq_len", "12",
        "--noise", "0.0", "--limit_steps", "1", "--allow_random",
    ])
    trained = load_mapper_from_train_dir(str(out))
    assert set(trained) == {"fc1", "fc2"}

    # round-trip through Patchioner.from_config's nested clipcap block
    from patchioner_tpu.models import vit
    from patchioner_tpu.models.patchioner import Patchioner

    small = dict(vit.VARIANTS["dinov2_vitb14_reg"], depth=2)
    monkeypatch.setitem(vit.VARIANTS, "dinov2_vitb14_reg", small)
    m = Patchioner.from_config(
        {
            "prefix_size": 16,
            "support_memory_size": 0,
            "dino_model": "dinov2_vitb14_reg",
            "crop_dim": 56,
            "normalize": True,
            "projection_type": "coco",
            "clipcap": {"weight_path": str(out), "prefix_length": 3,
                        "mapping_type": "mlp"},
        },
        allow_missing_weights=True,
    )
    np.testing.assert_array_equal(
        np.asarray(m.clipcap.mapper_params["fc1"]["w"]),
        np.asarray(trained["fc1"]["w"]))

    # a checkpoint from the OTHER family is rejected loudly
    from patchioner_tpu.models import gpt2, viecap as viecap_mod

    wrong = tmp_path / "viecap_ckpt_wrong"
    vmap = viecap_mod.init_mapping_network(
        jax.random.PRNGKey(3),
        viecap_mod.ViecapConfig(clip_hidden_size=16, num_layers=1), 768)
    CheckpointManager(str(wrong)).save(
        1, {"params": vmap, "opt_state": {}, "step": 1})
    with pytest.raises(ValueError, match="ClipCap"):
        Patchioner.from_config(
            {
                "prefix_size": 16,
                "support_memory_size": 0,
                "dino_model": "dinov2_vitb14_reg",
                "crop_dim": 56,
                "normalize": True,
                "projection_type": "coco",
                "clipcap": {"weight_path": str(wrong),
                            "prefix_length": 3, "mapping_type": "mlp"},
            },
            allow_missing_weights=True,
        )
