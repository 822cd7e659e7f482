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
      --out feats.npy [--talk2dino weights.pth] [--clip-weights hf_clip.pt]
  python -m patchioner_tpu.train.extract_features image --config model.yaml \
      --images dir/ --out feats.npy --select cls
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

import jax
import jax.numpy as jnp


def extract_text_features(args):
    from patchioner_tpu.models import clip as clip_mod
    from patchioner_tpu.text import clip_bpe
    from patchioner_tpu.train import data as data_mod

    captions, _ = data_mod.load_coco_captions(args.data)
    tcfg = clip_mod.ClipTextConfig()
    if args.clip_weights and os.path.exists(args.clip_weights):
        import torch

        sd = torch.load(args.clip_weights, map_location="cpu")
        params = clip_mod.port_hf_clip_text(sd, tcfg.depth)
    elif args.allow_random:
        params = clip_mod.init_clip_text(jax.random.PRNGKey(0), tcfg)
    else:
        raise SystemExit("no local CLIP text weights (--clip-weights)")

    project = None
    if args.talk2dino and os.path.exists(args.talk2dino):
        import torch

        from patchioner_tpu.io import torch_port
        from patchioner_tpu.models import talk2dino as t2d

        t2d_params = torch_port.port_talk2dino(
            torch.load(args.talk2dino, map_location="cpu")
        )
        project = lambda x: t2d.project_clip_txt(t2d_params, x)

    tok = clip_bpe.get_tokenizer()
    out = []
    for i in range(0, len(captions), args.bs):
        toks = jnp.asarray(tok.tokenize(captions[i : i + args.bs], 77))
        feats = clip_mod.clip_text_forward(params, toks, tcfg)
        if project is not None:
            feats = project(feats)
        out.append(np.asarray(feats))
    feats = np.concatenate(out).astype(np.float32)
    np.save(args.out, feats)
    print(f"wrote {feats.shape} -> {args.out}")


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
            transforms.preprocess_pil(
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
    t.add_argument("--clip-weights", default=None)
    t.add_argument("--talk2dino", default=None)
    t.add_argument("--bs", type=int, default=256)
    t.add_argument("--allow-random", action="store_true")
    i = sub.add_parser("image")
    i.add_argument("--config", required=True)
    i.add_argument("--images", required=True)
    i.add_argument("--out", required=True)
    i.add_argument("--select", default="cls",
                   choices=["cls", "avg_self_attn", "avg_patch"])
    i.add_argument("--bs", type=int, default=16)
    i.add_argument("--allow-random", action="store_true")
    args = p.parse_args(argv)
    if args.mode == "text":
        extract_text_features(args)
    else:
        extract_image_features(args)


if __name__ == "__main__":
    main()
