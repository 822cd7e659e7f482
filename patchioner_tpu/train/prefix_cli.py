"""Prefix-mapper training CLI — the ViECap / ClipCap training mains.

Reference: src/viecap/training/main.py (argparse loop training the
MappingNetwork on text-only CLIP features with noise, GPT-2 frozen) and
src/clipcap/clipcapTraining.py (MLP/Transformer prefix mapper over
pre-extracted image features, `only_prefix`). One CLI covers both:

  python -m patchioner_tpu.train.prefix_cli --model viecap \
      --data captions.json --out_dir ./viecap_ckpt --epochs 5 \
      [--features feats.npy | on-the-fly CLIP text encode] \
      [--noise 0.016] [--num_layers 8] [--dp N] [--resume]

  python -m patchioner_tpu.train.prefix_cli --model clipcap \
      --data captions.json --features image_feats.npy \
      --prefix_length 10 --out_dir ./clipcap_ckpt

Checkpoints are Orbax train states (mapper + optimizer + step) with
`--resume`, like decoder training. The trained mapper round-trips into the
captioner: point the nested config block's `weight_path` at `--out_dir`
(the reference's torch.save -> entrypoint torch.load cycle,
viecap/training/main.py:100-105 -> viecap/entrypoint.py:82-96).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp


def build_argparser():
    p = argparse.ArgumentParser()
    p.add_argument("--model", choices=["viecap", "clipcap"], required=True)
    p.add_argument("--data", required=True, help="COCO-format caption json")
    p.add_argument("--features", default=None,
                   help=".npy aligned with the corpus (image features for "
                        "clipcap; omit for viecap to CLIP-text-encode on "
                        "the fly like the reference)")
    p.add_argument("--out_dir", default="./prefix_ckpt")
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--bs", type=int, default=80)  # viecap main.py default
    p.add_argument("--lr", type=float, default=2e-5)
    p.add_argument("--warmup_steps", type=int, default=5000)
    p.add_argument("--noise", type=float, default=None,
                   help="feature noise VARIANCE (viecap main.py:122, "
                        "applied as utils.noise_injection). Defaults per "
                        "model: 0.016 for viecap, 0.0 for clipcap (the "
                        "reference clipcapTraining has no noise)")
    p.add_argument("--normalize_prefix", action="store_true",
                   help="L2-normalize features once before training "
                        "(clipcapTraining.py:44,350 ClipCocoDataset "
                        "normalize_prefix)")
    p.add_argument("--max_seq_len", type=int, default=40)
    p.add_argument("--loss_chunk", type=int, default=0)
    # mapper geometry
    p.add_argument("--num_layers", type=int, default=8,
                   help="viecap MappingNetwork depth")
    p.add_argument("--prefix_length", type=int, default=10,
                   help="clipcap soft-prefix length")
    # frozen language model (zero-egress default: seeded random init)
    p.add_argument("--gpt2_weights", default=None,
                   help="local torch GPT-2 lm-head state dict")
    p.add_argument("--n_layer", type=int, default=12)
    p.add_argument("--n_head", type=int, default=12)
    p.add_argument("--n_embd", type=int, default=768)
    p.add_argument("--vocab_size", type=int, default=50257)
    p.add_argument("--dp", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--save_every", type=int, default=1)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--limit_steps", type=int, default=0)
    p.add_argument("--allow_random", action="store_true",
                   help="permit seeded random GPT-2 + fallback tokenizer "
                        "(zero-egress environments)")
    return p


def _tokenize(captions, tokenizer, max_len):
    """GPT-2-encode + 0-pad to (N, max_len) with a real-token mask — the
    reference pads with 0 and masks, viecap/training/main.py dataset."""
    toks = np.zeros((len(captions), max_len), np.int32)
    mask = np.zeros((len(captions), max_len), np.float32)
    for i, c in enumerate(captions):
        ids = tokenizer.encode(c)[:max_len]
        toks[i, : len(ids)] = ids
        mask[i, : len(ids)] = 1.0
    return toks, mask


def main(argv=None):
    import optax

    from patchioner_tpu.models import clipcap as clipcap_mod
    from patchioner_tpu.models import gpt2 as gpt2_mod
    from patchioner_tpu.models import patchioner as patchioner_mod
    from patchioner_tpu.models import viecap as viecap_mod
    from patchioner_tpu.io.checkpoints import CheckpointManager
    from patchioner_tpu.parallel import sharding
    from patchioner_tpu.train import data as data_mod
    from patchioner_tpu.train import prefix_train

    args = build_argparser().parse_args(argv)
    from patchioner_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()  # flagship TPU compiles are minutes; cache persists them
    captions, _ = data_mod.load_coco_captions(args.data)
    n = len(captions)

    gcfg = gpt2_mod.GPT2Config(
        vocab_size=args.vocab_size, n_layer=args.n_layer,
        n_head=args.n_head, n_embd=args.n_embd,
    )
    if args.gpt2_weights and not os.path.exists(args.gpt2_weights):
        # --allow_random must not absorb an explicit-but-mistyped weights
        # path: the mapper would train against a RANDOM frozen LM all run
        raise FileNotFoundError(
            f"--gpt2_weights {args.gpt2_weights!r} not found"
        )
    if args.gpt2_weights and os.path.exists(args.gpt2_weights):
        import torch

        from patchioner_tpu.io import torch_port

        gpt2_params = torch_port.port_hf_gpt2_lmhead(
            torch.load(args.gpt2_weights, map_location="cpu"), gcfg.n_layer
        )
    elif args.allow_random:
        gpt2_params = jax.jit(
            lambda k: gpt2_mod.init_gpt2(k, gcfg)
        )(jax.random.PRNGKey(args.seed + 1))
    else:
        raise SystemExit("no --gpt2_weights; pass --allow_random for a "
                         "seeded frozen LM")

    tokenizer = patchioner_mod._get_gpt2_tokenizer(
        allow_fallback=args.allow_random
    )
    tokens, mask = _tokenize(captions, tokenizer, args.max_seq_len)

    if args.features:
        features = np.load(args.features).astype(np.float32)
        assert len(features) == n, (features.shape, n)
    else:
        # ViECap trains TEXT-ONLY: the caption's own CLIP text embedding is
        # the feature (viecap/training/main.py:43-48); noise bridges the
        # modality gap at inference.
        from patchioner_tpu.train import text_spaces

        space = text_spaces.build_text_space(
            "clip", None, seed=args.seed + 7
        ) if args.allow_random else None
        if space is None:
            raise SystemExit("--features required (or --allow_random for a "
                             "seeded CLIP text tower)")
        chunks = []
        for i in range(0, n, 512):
            chunks.append(np.asarray(
                space.encode_texts(captions[i : i + 512], batch_size=512)
            ))
        features = np.concatenate(chunks)
    if args.noise is None:
        args.noise = 0.016 if args.model == "viecap" else 0.0
    if args.normalize_prefix:
        features = features / np.maximum(
            np.linalg.norm(features, axis=-1, keepdims=True), 1e-12
        )
    feat_dim = int(features.shape[1])

    key = jax.random.PRNGKey(args.seed)
    if args.model == "viecap":
        vcfg = viecap_mod.ViecapConfig(
            clip_hidden_size=feat_dim, num_layers=args.num_layers
        )
        mapper = viecap_mod.init_mapping_network(key, vcfg, gcfg.n_embd)
        mapper_fn = lambda p, f: viecap_mod.mapping_network_forward(
            p, f, vcfg, gcfg.n_embd
        )
        meta = {"model": "viecap", "clip_hidden_size": feat_dim,
                "num_layers": args.num_layers, "n_embd": gcfg.n_embd}
    else:
        mapper = clipcap_mod.init_mlp_mapper(
            key, feat_dim, args.prefix_length, gcfg.n_embd
        )
        mapper_fn = lambda p, f: clipcap_mod.mlp_mapper_forward(
            p, f, args.prefix_length, gcfg.n_embd
        )
        meta = {"model": "clipcap", "prefix_size": feat_dim,
                "prefix_length": args.prefix_length, "n_embd": gcfg.n_embd}

    total_steps = max(1, args.epochs * (n // max(args.bs, 1)))
    # short runs clamp the reference's 5000-step warmup so the decay
    # keeps a positive length
    warmup = min(args.warmup_steps, max(1, total_steps // 10))
    tcfg = prefix_train.PrefixTrainConfig(
        lr=args.lr, warmup_steps=warmup, total_steps=total_steps,
        noise_variance=args.noise, loss_chunk=args.loss_chunk,
    )
    # reference recipe parity (viecap/training/main.py:51-54,
    # clipcapTraining.py:300-303): transformers.AdamW — weight_decay 0.0,
    # bias correction — with get_linear_schedule_with_warmup (linear
    # warmup, LINEAR decay to 0 at total_steps). optax.adamw's 1e-4
    # default wd and a cosine decay silently diverged from that.
    schedule = optax.join_schedules(
        [
            optax.linear_schedule(0.0, tcfg.lr, warmup),
            optax.linear_schedule(
                tcfg.lr, 0.0, max(1, tcfg.total_steps - warmup)
            ),
        ],
        [warmup],
    )
    tx = optax.adamw(schedule, weight_decay=tcfg.weight_decay)
    mesh = sharding.make_mesh(dp=args.dp, mp=1)
    step_fn = prefix_train.make_prefix_train_step(
        mapper_fn, gcfg, tcfg, tx, mesh=mesh
    )
    opt_state = tx.init(mapper)

    ckpt = CheckpointManager(args.out_dir)
    state = {"params": mapper, "opt_state": opt_state, "step": 0}
    if args.resume and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        mapper, opt_state = state["params"], state["opt_state"]
        print(f"resumed from step {state['step']}")
    step = int(state["step"])

    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(args.out_dir, "mapper_meta.json"), "w") as f:
        json.dump(meta, f)
    gpt2_params = sharding.replicate(mesh, gpt2_params)
    # Stage the corpus tensors on device ONCE when they fit next to the
    # training working set; per-step batch selection is then a device-side
    # gather instead of a host slice + transfer (measured ~70 ms/step of
    # tunnel traffic at bs 1024, PERF.md). The 566k-caption corpus at
    # 768-d f32 (~2 GB) measured OOM on one 16 GB v5e next to the
    # bs-1024 frozen-12L working set, so big corpora keep the host path.
    from jax.sharding import NamedSharding, PartitionSpec

    repl = NamedSharding(mesh, PartitionSpec())
    corpus_bytes = features.nbytes + tokens.nbytes + mask.nbytes
    stage_on_device = corpus_bytes <= 1_000_000_000
    if stage_on_device:
        features = jax.device_put(jnp.asarray(features), repl)
        tokens = jax.device_put(jnp.asarray(tokens), repl)
        mask = jax.device_put(jnp.asarray(mask), repl)
        # batch selection runs INSIDE the jitted step: one dispatch per
        # step whose only host payload is the (bs,) index vector. Separate
        # gather/device_put dispatches measured ~0 win over host slices on
        # the tunnel (each dispatch is its own ~40 ms RPC).
        base_step = step_fn

        def _staged(mapper, opt_state, gp, f_all, t_all, m_all, idx, key):
            return base_step(mapper, opt_state, gp, f_all[idx], t_all[idx],
                             m_all[idx], key)

        step_fn = jax.jit(
            _staged,
            in_shardings=(repl,) * 7 + (repl,),
            out_shardings=(repl, repl, repl),
            donate_argnums=(0, 1),
        )
    if n < args.bs:
        # batch_iterator drops the remainder, so a corpus smaller than one
        # batch trains ZERO steps per epoch — fail fast instead of logging
        # NaN epochs and saving an untrained mapper that looks finished.
        raise SystemExit(
            f"corpus ({n} captions) is smaller than --bs {args.bs}: no "
            f"full batch would ever run; lower --bs"
        )
    key = jax.random.PRNGKey(args.seed + 2)
    log_path = os.path.join(args.out_dir, "train_log.csv")
    done = False
    # resume continues FROM the restored step's epoch instead of re-running
    # all epochs on top (which would run the LR schedule off its end to 0
    # and retrain epochs the checkpoint already covers); mid-epoch progress
    # rounds down to the epoch boundary, and seed-per-epoch reproduces the
    # same data order as an uninterrupted run
    steps_per_epoch = max(1, n // max(args.bs, 1))
    start_epoch = min(args.epochs, step // steps_per_epoch)
    if start_epoch:
        print(f"resuming at epoch {start_epoch}/{args.epochs}")
    with mesh:
        for epoch in range(start_epoch, args.epochs):
            losses, accs = [], []
            t0 = time.time()
            for idx in data_mod.batch_iterator(n, args.bs,
                                               seed=args.seed + epoch):
                key, k = jax.random.split(key)
                if stage_on_device:
                    mapper, opt_state, m = step_fn(
                        mapper, opt_state, gpt2_params, features, tokens,
                        mask, jnp.asarray(idx), k,
                    )
                else:
                    mapper, opt_state, m = step_fn(
                        mapper, opt_state, gpt2_params,
                        jnp.asarray(features[idx]), jnp.asarray(tokens[idx]),
                        jnp.asarray(mask[idx]), k,
                    )
                losses.append(m["loss"])
                accs.append(m["acc"])
                step += 1
                if args.limit_steps and step >= args.limit_steps:
                    done = True
                    break
            loss = float(np.mean([np.asarray(x) for x in losses]))
            acc = float(np.mean([np.asarray(x) for x in accs]))
            dt = time.time() - t0
            line = f"{epoch},{step},{loss:.5f},{acc:.5f},{dt:.1f}"
            print("epoch,step,loss,acc,seconds ->", line)
            with open(log_path, "a") as f:
                f.write(line + "\n")
            if (epoch + 1) % args.save_every == 0 or done:
                ckpt.save(step, {"params": mapper, "opt_state": opt_state,
                                 "step": step})
            if done:
                break
    ckpt.save(step, {"params": mapper, "opt_state": opt_state, "step": step})
    print(f"done at step {step}; checkpoints in {args.out_dir}")


if __name__ == "__main__":
    main()
