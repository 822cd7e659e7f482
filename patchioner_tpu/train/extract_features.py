"""Pre-extract features for decoder training / ClipCap training.

Reference: src/clipcap/clipcap_dino_parse_coco.py (612 LoC — DINO feature
pre-extraction with patch-selection strategies) and the --pre_extract_features
path of decoderTraining.py. Two modes:

  * text: encode a caption corpus with the CLIP text tower (optionally
    Talk2DINO-projected) -> .npy aligned with the corpus — the input for
    train/cli.py --features.
  * image: run a Patchioner backbone over an image folder and store the
    selected token per image (cls / avg_self_attn / avg_patch).

Usage:
  python -m patchioner_tpu.train.extract_features text --data captions.json \
      --out feats.npy [--text-encoder dinotxt] [--talk2dino weights.pth]
  python -m patchioner_tpu.train.extract_features bank --data captions.json \
      --size 500000 --text-encoder regionclip --text-weights ckpt.pth
  python -m patchioner_tpu.train.extract_features image --config model.yaml \
      --images dir/ --out feats.npy --select cls

The `text` and `bank` modes accept any of the five reference text spaces
(clip / open_clip / dinotxt / regionclip / denseclip —
decoderTraining.py:116-208) via train/text_spaces.py.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

import jax
import jax.numpy as jnp


def _build_space(args):
    from patchioner_tpu.train import text_spaces

    weights = getattr(args, "text_weights", None) or getattr(
        args, "clip_weights", None
    )
    if not (weights and os.path.exists(weights)) and not args.allow_random:
        raise SystemExit(
            "no local text weights (--text-weights); pass --allow-random "
            "for a seeded tower"
        )
    return text_spaces.build_text_space(
        args.text_encoder, weights,
        denseclip_config=args.denseclip_config,
    )


def _talk2dino_project(path):
    if not path:
        return None
    if not os.path.exists(path):
        # explicit path that resolves to nothing must fail, not silently
        # extract features in the wrong embedding space
        raise FileNotFoundError(f"talk2dino weights {path!r} not found")
    import torch

    from patchioner_tpu.io import torch_port
    from patchioner_tpu.models import talk2dino as t2d

    t2d_params = torch_port.port_talk2dino(
        torch.load(path, map_location="cpu")
    )
    return lambda x: t2d.project_clip_txt(t2d_params, x)


def extract_text_features(args):
    from patchioner_tpu.train import data as data_mod

    captions, _ = data_mod.load_coco_captions(args.data)
    space = _build_space(args)
    project = _talk2dino_project(args.talk2dino)

    out = []
    for i in range(0, len(captions), args.bs):
        toks = space.tokenize(captions[i : i + args.bs])
        feats = space.encode_tokens(toks)
        if project is not None:
            feats = project(feats)
        out.append(np.asarray(feats))
    feats = np.concatenate(out).astype(np.float32)
    np.save(args.out, feats)
    print(f"wrote {feats.shape} -> {args.out}")


def build_memory_bank(args):
    """Build + save an HDF5 support-memory bank in any text space — the
    reference's Im2TxtProjector bank-building loop
    (im2txtprojection.py:448-560) with the tower swapped per --text_encoder.
    Banks store the FULL tower output (2048-d for dinotxt; the `[:, 1024:]`
    patch-aligned slice is applied at LOAD, :405-406), with the Talk2DINO
    projection applied at build time when requested (the reference's
    use_talk2dino banks)."""
    from patchioner_tpu.io import memory_bank as mb

    captions = mb.load_caption_corpus(
        args.data, args.size, sample=not args.no_sample, seed=args.seed
    )
    space = _build_space(args)
    project = _talk2dino_project(args.talk2dino)

    def encode(texts):
        feats = space.encode_texts_for_bank(texts, batch_size=len(texts))
        if project is not None:
            feats = np.asarray(project(jnp.asarray(feats)))
        return feats

    bank = mb.build_bank(captions, encode, batch_size=args.bs)
    if args.out:
        out, dataset = args.out, mb.PROJECTION_DATASETS.get(
            args.projection_type, args.projection_type
        )
    else:
        filename, dataset = mb.bank_filename(
            args.projection_type,
            support_memory_size=args.size,
            use_talk2dino=project is not None,
            use_open_clip=args.text_encoder == "open_clip",
        )
        out = os.path.join(args.bank_dir, filename)
    mb.save_bank(out, dataset, bank)
    print(f"wrote bank {bank.embeddings.shape} [{args.text_encoder}] -> {out}")


def extract_image_features(args):
    from PIL import Image

    from patchioner_tpu.models.patchioner import Patchioner
    from patchioner_tpu.utils import transforms

    model = Patchioner.from_config(
        args.config, allow_missing_weights=args.allow_random
    )
    paths = sorted(
        os.path.join(args.images, f)
        for f in os.listdir(args.images)
        if f.lower().endswith((".jpg", ".jpeg", ".png"))
    )
    out, names = [], []
    for i in range(0, len(paths), args.bs):
        batch = np.stack([
            # uint8: encode_images normalizes on device (4x less
            # host->device traffic than f32 pixels)
            transforms.preprocess_pil_uint8(
                Image.open(p), model.resize_dim, model.crop_dim
            )
            for p in paths[i : i + args.bs]
        ])
        enc = model.encode_images(batch)
        if args.select == "cls":
            feats = enc["x_norm_clstoken"]
        elif args.select == "avg_self_attn":
            feats = jnp.mean(
                enc["self_attn"][..., None] * enc["x_norm_patchtokens"], axis=1
            )
        else:  # avg_patch
            feats = jnp.mean(enc["x_norm_patchtokens"], axis=1)
        out.append(np.asarray(feats))
        names.extend(os.path.basename(p) for p in paths[i : i + args.bs])
    feats = np.concatenate(out).astype(np.float32)
    np.save(args.out, feats)
    with open(args.out + ".names.json", "w") as f:
        json.dump(names, f)
    print(f"wrote {feats.shape} -> {args.out}")


def main(argv=None):
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="mode", required=True)
    t = sub.add_parser("text")
    t.add_argument("--data", required=True)
    t.add_argument("--out", required=True)
    t.add_argument("--text-encoder", default="clip", dest="text_encoder",
                   choices=["clip", "open_clip", "dinotxt", "regionclip",
                            "denseclip"])
    t.add_argument("--text-weights", default=None, dest="text_weights")
    t.add_argument("--denseclip-config",
                   default="denseclip_segmentation_vitb16",
                   dest="denseclip_config")
    t.add_argument("--clip-weights", default=None,
                   help="legacy alias for --text-weights")
    t.add_argument("--talk2dino", default=None)
    t.add_argument("--bs", type=int, default=256)
    t.add_argument("--allow-random", action="store_true")
    k = sub.add_parser("bank", help="build an HDF5 support-memory bank")
    k.add_argument("--data", required=True,
                   help="COCO-format annotation json (caption corpus)")
    k.add_argument("--size", type=int, default=500000)
    k.add_argument("--projection-type", default="coco",
                   dest="projection_type")
    k.add_argument("--out", default=None,
                   help="explicit output path (default: reference filename "
                        "scheme under --bank-dir)")
    k.add_argument("--bank-dir", default=".", dest="bank_dir")
    k.add_argument("--text-encoder", default="clip", dest="text_encoder",
                   choices=["clip", "open_clip", "dinotxt", "regionclip",
                            "denseclip"])
    k.add_argument("--text-weights", default=None, dest="text_weights")
    k.add_argument("--denseclip-config",
                   default="denseclip_segmentation_vitb16",
                   dest="denseclip_config")
    k.add_argument("--talk2dino", default=None)
    k.add_argument("--no-sample", action="store_true", dest="no_sample",
                   help="head slice instead of random.sample (VG corpora)")
    k.add_argument("--seed", type=int, default=None)
    k.add_argument("--bs", type=int, default=1000)
    k.add_argument("--allow-random", action="store_true")
    i = sub.add_parser("image")
    i.add_argument("--config", required=True)
    i.add_argument("--images", required=True)
    i.add_argument("--out", required=True)
    i.add_argument("--select", default="cls",
                   choices=["cls", "avg_self_attn", "avg_patch"])
    i.add_argument("--bs", type=int, default=16)
    i.add_argument("--allow-random", action="store_true")
    args = p.parse_args(argv)
    from patchioner_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()  # flagship TPU compiles are minutes; cache persists them
    if args.mode == "text":
        extract_text_features(args)
    elif args.mode == "bank":
        build_memory_bank(args)
    else:
        extract_image_features(args)


if __name__ == "__main__":
    main()
