"""Decoder training CLI — the `decoderTraining.py` equivalent, TPU-native.

Reference: src/decap/decoderTraining.py:410-440 (argparse surface) and
:62-387 (loop). Differences by design: data parallelism is a sharded jit
program over a device mesh (not torchrun/DDP/NCCL), checkpoints are Orbax
train states with resume, and the frozen text-encoding pipeline runs
pre-extracted or through the JAX CLIP text tower.

Usage:
  python -m patchioner_tpu.train.cli --data captions.json --out_dir ./ckpt \
      --epochs 10 --bs 64 [--gaussian_noise 0.016] [--im_proj --bank bank.h5]
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from patchioner_tpu.models import decap as decap_mod
from patchioner_tpu.models import gpt2 as gpt2_mod
from patchioner_tpu.train import data as data_mod
from patchioner_tpu.train import decoder_train
from patchioner_tpu.train import text_spaces


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train the DeCap/CapDec decoder")
    p.add_argument("--data", required=True,
                   help="caption corpus (COCO json or json list of strings)")
    p.add_argument("--features", default=None,
                   help="pre-extracted text features .npy aligned with --data")
    p.add_argument("--encode_on_the_fly", action="store_true",
                   help="encode captions with a frozen text tower instead of "
                        "--features (reference decoderTraining.py:289-306)")
    p.add_argument("--text_encoder", default="clip",
                   choices=list(text_spaces.TEXT_SPACE_NAMES),
                   help="text-embedding space to train in (the reference's "
                        "--use_open_clip/--use_dinotxt/--use-regionclip/"
                        "--denseclip_config switches, "
                        "decoderTraining.py:116-208)")
    p.add_argument("--text_weights", default=None,
                   help="checkpoint for the chosen text encoder")
    p.add_argument("--denseclip_config", default="denseclip_segmentation_vitb16",
                   help="vendored DenseCLIP yaml name (text geometry)")
    p.add_argument("--clip_text_weights", default=None,
                   help="legacy alias for --text_weights with "
                        "--text_encoder clip")
    p.add_argument("--talk2dino_weights", default=None)
    p.add_argument("--out_dir", default="./decap_ckpt")
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--bs", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--warmup", type=int, default=1000,
                   help="reference train_decoder default "
                        "(decoderTraining.py:63)")
    p.add_argument("--weight_decay", type=float, default=0.01,
                   help="torch AdamW default, what the reference runs "
                        "(decoderTraining.py:255)")
    p.add_argument("--prefix_size", type=int, default=768)
    p.add_argument("--max_seq_len", type=int, default=20,
                   help="reference max_seq_len (dataset.py:45); captions "
                        "are RAW-sliced like pad_tokens, no EOT re-insert")
    p.add_argument("--gaussian_noise", type=float, default=0.0,
                   help="CapDec noise variance")
    p.add_argument("--im_proj", action="store_true",
                   help="project features through the support memory")
    p.add_argument("--bank", default=None, help="memory bank .h5 for --im_proj")
    p.add_argument("--mix_captions", action="store_true",
                   help="pair tokens with a different same-image caption's features")
    p.add_argument("--dp", type=int, default=None, help="data-parallel axis size")
    p.add_argument("--mp", type=int, default=1, help="bank tensor-parallel size")
    p.add_argument("--save_every", type=int, default=1)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--limit_steps", type=int, default=None)
    p.add_argument("--loss_chunk", type=int, default=0,
                   help="compute the lm-head CE this many sequence positions "
                        "at a time (0 = unchunked); lets batch sizes whose "
                        "full (B, T, V) logits would OOM train (e.g. 4096)")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="split each --bs batch into this many micro-batches "
                        "scanned inside ONE jitted step (one big-batch-"
                        "equivalent optimizer update); trains batch-size "
                        "recipes beyond one chip's activation memory. "
                        "--bs must be divisible by it")
    p.add_argument("--pack_len", type=int, default=0,
                   help="pack captions into rows of this many positions with "
                        "segment-local attention (0 = off). COCO captions "
                        "average ~11 tokens vs the reference 20-token pad, so packing "
                        "~3x's the captions trained per step; --bs counts "
                        "packed ROWS in this mode (train/packing.py)")
    # decoder architecture (defaults = the DeCap decoder_config.pkl values)
    p.add_argument("--n_layer", type=int, default=4)
    p.add_argument("--n_head", type=int, default=4)
    p.add_argument("--n_embd", type=int, default=768)
    p.add_argument("--vocab_size", type=int, default=50257)
    return p


def _microbatch(a, grad_accum):
    """Reshape a (B, ...) host batch to (grad_accum, B/grad_accum, ...) for
    the accumulating train step (decoder_train.TrainConfig.grad_accum)."""
    if grad_accum <= 1:
        return a
    return a.reshape((grad_accum, a.shape[0] // grad_accum) + a.shape[1:])


def main(argv=None):
    args = build_argparser().parse_args(argv)
    from patchioner_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()  # flagship TPU compiles are minutes; cache persists them

    captions, image_ids = data_mod.load_coco_captions(args.data)
    ds = data_mod.CaptionDataset(captions, image_ids, max_len=args.max_seq_len)
    n = len(ds)

    if args.features:
        features = np.load(args.features).astype(np.float32)
        assert len(features) == n, "features misaligned with captions"
        if features.shape[1] != args.prefix_size:
            # same auto-correction as the encode-on-the-fly path: the
            # reference derives prefix_size from the feature space
            # (decoderTraining.py:84-105); a mismatch would otherwise die
            # minutes later inside the first jitted step as an opaque
            # dot_general shape error
            print(f"Updating prefix_size from {args.prefix_size} to "
                  f"{features.shape[1]} (loaded features)")
            args.prefix_size = int(features.shape[1])
    elif args.encode_on_the_fly:
        # Frozen text tower (+ optional Talk2DINO projection) — the
        # reference's in-loop encode path (decoderTraining.py:289-306),
        # done once up front here since the encoder is frozen anyway
        # (identical features, no repeated work). The tower is selected by
        # --text_encoder: clip/open_clip/dinotxt/regionclip/denseclip
        # (decoderTraining.py:116-208).
        space = text_spaces.build_text_space(
            args.text_encoder,
            args.text_weights or args.clip_text_weights,
            denseclip_config=args.denseclip_config,
            seed=args.seed + 7,
        )
        project = None
        if args.talk2dino_weights and not os.path.exists(args.talk2dino_weights):
            # an explicitly requested projection must not silently vanish:
            # hours of training in the wrong embedding space
            raise FileNotFoundError(
                f"--talk2dino_weights {args.talk2dino_weights!r} not found"
            )
        if args.talk2dino_weights and os.path.exists(args.talk2dino_weights):
            import torch

            from patchioner_tpu.io import torch_port
            from patchioner_tpu.models import talk2dino as t2d

            t2dp = torch_port.port_talk2dino(
                torch.load(args.talk2dino_weights, map_location="cpu")
            )
            project = lambda x: t2d.project_clip_txt(t2dp, x)
        chunks = []
        for i in range(0, n, 256):
            # encoder tokens are tokenized at the TOWER's context length
            # (13 for DenseCLIP), independent of the decoder targets
            toks = space.tokenize(captions[i : i + 256])
            f = space.encode_tokens(toks)
            if project is not None:
                f = project(f)
            chunks.append(np.asarray(f))
        features = np.concatenate(chunks).astype(np.float32)
        if features.shape[1] != args.prefix_size:
            # the reference derives prefix_size from the loaded tower
            # (decoderTraining.py:84-105,131-138)
            print(f"Updating prefix_size from {args.prefix_size} to "
                  f"{features.shape[1]} ({args.text_encoder} space)")
            args.prefix_size = int(features.shape[1])
    else:
        raise SystemExit(
            "--features or --encode_on_the_fly required (see also "
            "patchioner_tpu.train.extract_features)"
        )

    gcfg = gpt2_mod.GPT2Config(
        vocab_size=args.vocab_size, n_layer=args.n_layer, n_head=args.n_head,
        n_embd=args.n_embd,
    )
    params = decap_mod.init_decap(
        jax.random.PRNGKey(args.seed), gcfg, args.prefix_size
    )

    if args.grad_accum > 1 and args.bs % args.grad_accum:
        raise SystemExit(
            f"--bs {args.bs} not divisible by --grad_accum {args.grad_accum}"
        )
    if args.pack_len:
        from patchioner_tpu.train import packing

        # Size the LR schedule and the static segment budget from an ACTUAL
        # epoch-0 pack: a packed step consumes --bs ROWS (~3x captions), so
        # caption-count step math would end the linear decay ~1/3 into it;
        # and deriving max_segments from the observed pack keeps one
        # degenerate 1-token caption from inflating the (R, S) axis to
        # ~pack_len (review r3c).
        pack0 = packing.pack_captions(ds.tokens, args.pack_len)
        max_segments = pack0.seg_feature_idx.shape[1]
        steps_per_epoch = pack0.targets.shape[0] // args.bs
        if steps_per_epoch == 0:
            raise SystemExit(
                f"--bs {args.bs} rows exceeds the packed corpus "
                f"({pack0.targets.shape[0]} rows at --pack_len "
                f"{args.pack_len}); lower --bs — packed rows hold several "
                "captions each"
            )
    else:
        steps_per_epoch = n // args.bs
    tcfg = decoder_train.TrainConfig(
        lr=args.lr,
        warmup_steps=args.warmup,
        weight_decay=args.weight_decay,
        total_steps=args.epochs * max(steps_per_epoch, 1),
        gaussian_noise=args.gaussian_noise,
        loss_chunk=args.loss_chunk,
        grad_accum=args.grad_accum,
    )
    tx = decoder_train.make_optimizer(tcfg)
    opt_state = tx.init(params)

    bank_rows = None
    if args.im_proj:
        if not args.bank:
            raise SystemExit("--im_proj requires --bank")
        from patchioner_tpu.io import memory_bank as mb

        # dinotxt banks store the full 2048-d embedding; training projects
        # through the patch-aligned [:, 1024:] half, applied at LOAD like
        # the reference (im2txtprojection.py:405-406)
        # dataset key auto-detected from the file (banks built for VG /
        # MSMarco / CC3M corpora load too, not just coco_captions)
        loaded = mb.load_bank(
            args.bank, dinotxt_slice=args.text_encoder == "dinotxt",
        )
        if loaded is None:
            raise SystemExit(f"--bank {args.bank}: no *-embeddings dataset")
        bank_rows = jnp.asarray(loaded.embeddings)

    from patchioner_tpu.parallel import sharding

    mesh = sharding.make_mesh(dp=args.dp, mp=args.mp)
    if args.pack_len:
        step_fn = decoder_train.make_packed_train_step(
            gcfg, tcfg, tx, use_bank=bank_rows is not None, mesh=mesh
        )
    else:
        step_fn = decoder_train.make_train_step(
            gcfg, tcfg, tx, use_bank=bank_rows is not None, mesh=mesh
        )

    from patchioner_tpu.io.checkpoints import CheckpointManager

    ckpt = CheckpointManager(args.out_dir)
    state = {"params": params, "opt_state": opt_state, "step": 0}
    if args.resume and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        params, opt_state = state["params"], state["opt_state"]
        print(f"resumed from step {state['step']}")

    rng = random.Random(args.seed)
    key = jax.random.PRNGKey(args.seed)
    step = int(state["step"])
    log_path = os.path.join(args.out_dir, "train_log.csv")
    os.makedirs(args.out_dir, exist_ok=True)

    if args.pack_len:
        from jax.sharding import NamedSharding, PartitionSpec

        # One resident copy of ALL caption features, placed REPLICATED on
        # the mesh up front — a plain jnp.asarray would commit it to one
        # device and re-broadcast every step (review r3c). Each step's
        # seg_feature_idx gathers its captions from it on device.
        features_dev = jax.device_put(
            features, NamedSharding(mesh, PartitionSpec())
        )

    # Unpacked loop staging (same adaptive scheme as train/prefix_cli):
    # when the whole corpus fits comfortably in HBM, stage features+tokens
    # on device ONCE and gather each batch by index INSIDE the jitted step —
    # per-step host slices stream ~3-13 MB over the link (0.2-1.3 s/step on
    # the dev tunnel at bs=4096; CLAUDE.md: never stream big per-batch
    # tensors in a timed phase). Falls back to host slices for
    # bigger-than-HBM corpora.
    stage_on_device = (not args.pack_len) and (
        features.nbytes + ds.tokens.nbytes <= 1_000_000_000
    )
    if stage_on_device:
        from jax.sharding import NamedSharding, PartitionSpec

        repl = NamedSharding(mesh, PartitionSpec())
        feats_all = jax.device_put(jnp.asarray(features), repl)
        toks_all = jax.device_put(jnp.asarray(np.asarray(ds.tokens)), repl)
        base_step = step_fn
        ga = args.grad_accum

        def _staged(params, opt_state, f_all, t_all, fidx, tidx, k, *extra):
            bf, bt = f_all[fidx], t_all[tidx]
            if ga > 1:
                bf = bf.reshape((ga, bf.shape[0] // ga) + bf.shape[1:])
                bt = bt.reshape((ga, bt.shape[0] // ga) + bt.shape[1:])
            return base_step(params, opt_state, bf, bt, k, *extra)

        # everything enters replicated (the inner step re-shards its batch
        # over dp internally); explicit shardings also place params on the
        # mesh — without them the first call mixes single-device params
        # with mesh-resident corpus arrays and jit rejects the computation
        n_in = 7 + (1 if bank_rows is not None else 0)
        staged_step = jax.jit(
            _staged, in_shardings=(repl,) * n_in,
            out_shardings=(repl, repl, repl), donate_argnums=(0, 1),
        )

    # resume continues FROM the restored step's epoch instead of re-running
    # all epochs on top (which would run the LR schedule off its end to 0
    # and retrain epochs the checkpoint already covers); mid-epoch progress
    # rounds down to the epoch boundary, and seed-per-epoch data ordering
    # reproduces an uninterrupted run's remaining epochs
    start_epoch = min(args.epochs, step // max(steps_per_epoch, 1))
    if start_epoch:
        print(f"resuming at epoch {start_epoch}/{args.epochs}")
        # keep the mix-index RNG stream aligned with an uninterrupted run
        for _ in range(start_epoch):
            if args.mix_captions:
                ds.mix_indices(rng)
    with mesh:
        for epoch in range(start_epoch, args.epochs):
            mix = ds.mix_indices(rng) if args.mix_captions else None
            if args.pack_len:
                order = np.random.default_rng(args.seed + epoch).permutation(n)
                pack = packing.pack_captions(
                    ds.tokens, args.pack_len,
                    feature_indices=mix, order=order,
                    max_segments=max_segments,
                )
                nrows = pack.targets.shape[0]
                losses, accs = [], []
                t0 = time.time()
                for start in range(0, nrows - args.bs + 1, args.bs):
                    batch = packing.PackedBatch(
                        *(jnp.asarray(_microbatch(a[start : start + args.bs],
                                                  args.grad_accum))
                          for a in pack)
                    )
                    key, k = jax.random.split(key)
                    extra = (bank_rows,) if bank_rows is not None else ()
                    params, opt_state, metrics = step_fn(
                        params, opt_state, features_dev, batch, k, *extra
                    )
                    losses.append(metrics["loss"])
                    accs.append(metrics["acc"])
                    step += 1
                    if args.limit_steps and step >= args.limit_steps:
                        break
                if not losses:
                    print(
                        f"WARNING: epoch {epoch} ran 0 packed steps "
                        f"({nrows} rows < --bs {args.bs}); nothing trained",
                        file=sys.stderr,
                    )
                epoch_loss = (float(np.mean([np.asarray(x) for x in losses]))
                              if losses else 0.0)
                epoch_acc = (float(np.mean([np.asarray(x) for x in accs]))
                             if accs else 0.0)
                line = (
                    f"{epoch},{step},{epoch_loss:.5f},"
                    f"{epoch_acc:.5f},{time.time() - t0:.1f}"
                )
                print(f"epoch,step,loss,acc,seconds -> {line} "
                      f"(packed: {nrows} rows, "
                      f"{packing.packing_efficiency(pack):.0%} slot use)")
                with open(log_path, "a") as f:
                    f.write(line + "\n")
                if (epoch + 1) % args.save_every == 0:
                    ckpt.save(step, {"params": params, "opt_state": opt_state,
                                     "step": step})
                if args.limit_steps and step >= args.limit_steps:
                    break
                continue
            # Metrics stay device-side until epoch end: a float() per step
            # would block on the async dispatch queue and serialize host and
            # device (the reference pays the same sync via .item(),
            # decoderTraining.py:336-345; here deferring it lets steps
            # pipeline).
            losses, accs = [], []
            t0 = time.time()
            for idx in data_mod.batch_iterator(
                n, args.bs, seed=args.seed + epoch
            ):
                feat_idx = mix[idx] if mix is not None else idx
                key, k = jax.random.split(key)
                extra = (bank_rows,) if bank_rows is not None else ()
                if stage_on_device:
                    params, opt_state, metrics = staged_step(
                        params, opt_state, feats_all, toks_all,
                        jnp.asarray(feat_idx), jnp.asarray(idx), k, *extra
                    )
                else:
                    params, opt_state, metrics = step_fn(
                        params, opt_state,
                        jnp.asarray(_microbatch(features[feat_idx],
                                                args.grad_accum)),
                        jnp.asarray(_microbatch(ds.tokens[idx],
                                                args.grad_accum)),
                        k, *extra,
                    )
                losses.append(metrics["loss"])
                accs.append(metrics["acc"])
                step += 1
                if args.limit_steps and step >= args.limit_steps:
                    break
            epoch_loss = float(np.mean([np.asarray(x) for x in losses])) if losses else 0.0
            epoch_acc = float(np.mean([np.asarray(x) for x in accs])) if accs else 0.0
            line = (
                f"{epoch},{step},{epoch_loss:.5f},"
                f"{epoch_acc:.5f},{time.time() - t0:.1f}"
            )
            print(f"epoch,step,loss,acc,seconds -> {line}")
            with open(log_path, "a") as f:
                f.write(line + "\n")
            if (epoch + 1) % args.save_every == 0:
                ckpt.save(step, {"params": params, "opt_state": opt_state,
                                 "step": step})
            if args.limit_steps and step >= args.limit_steps:
                break
    ckpt.save(step, {"params": params, "opt_state": opt_state, "step": step})
    print(f"done at step {step}; checkpoints in {args.out_dir}")


if __name__ == "__main__":
    main()
