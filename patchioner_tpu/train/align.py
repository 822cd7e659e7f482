"""Contrastive image-text alignment trainer (CLIP-style InfoNCE).

The reference NEVER trains its towers — it rides pretrained CLIP/DINOv2
weights whose shared embedding space is what makes text-only decoder
training transfer to images (SURVEY.md; src/decap/decoderTraining.py). In
this zero-egress build no pretrained space exists, so the convergence proof
(scripts/convergence_proof.py) creates one from scratch: a real
DINOv2-architecture tower (models/vit.py) and a real CLIP text tower
(models/clip.py) trained with the standard symmetric-InfoNCE recipe on the
synthetic world (train/synthetic.py).

TPU-shaped like the other trainers: one jitted step, params donated, the
whole (tiny) dataset staged on device, batches gathered by index inside the
step. The image embedding is the MASKED MEAN over final-norm patch tokens
(the mask = the object's patches) so the trained space matches what the
captioner pools under a trace at eval time (ops/region_pooling semantics).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from patchioner_tpu.models import clip as clip_mod
from patchioner_tpu.models import vit as vit_mod
from patchioner_tpu.utils import transforms

__all__ = ["AlignConfig", "init_align", "image_embed", "text_embed",
           "make_align_step", "train_align"]


@dataclasses.dataclass(frozen=True)
class AlignConfig:
    vit: vit_mod.ViTConfig
    text: clip_mod.ClipTextConfig
    lr: float = 1e-3
    weight_decay: float = 0.01
    steps: int = 400
    batch: int = 48
    init_logit_scale: float = 2.6593  # ln(1/0.07), CLIP's init
    max_logit_scale: float = 4.6052  # ln(100), CLIP's clamp

    def __post_init__(self):
        if self.text.proj_dim != self.vit.embed_dim:
            raise ValueError(
                "text proj_dim must equal the ViT embed_dim — the bank and "
                "the pooled patch features must share one space "
                f"({self.text.proj_dim} vs {self.vit.embed_dim})"
            )


def init_align(key: jax.Array, cfg: AlignConfig) -> dict:
    kv, kt = jax.random.split(key)
    return {
        "vit": vit_mod.init_vit(kv, cfg.vit),
        "text": clip_mod.init_clip_text(kt, cfg.text),
        "logit_scale": jnp.asarray(cfg.init_logit_scale, jnp.float32),
    }


def _l2(x, eps=1e-8):
    return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + eps)


def image_embed(
    vit_params: dict, pixels_u8: jax.Array, vit_cfg: vit_mod.ViTConfig,
    patch_mask: jax.Array,
) -> jax.Array:
    """(B, H, W, 3) uint8 + (B, P) bool -> (B, D) normalized masked-mean
    patch embedding, through the SAME normalization + forward the captioner
    runs at eval (Patchioner.encode_images -> vit_forward)."""
    mean = jnp.asarray(transforms.IMAGENET_MEAN)
    std = jnp.asarray(transforms.IMAGENET_STD)
    x = (pixels_u8.astype(jnp.float32) / 255.0 - mean) / std
    toks = vit_mod.vit_forward(vit_params, x, vit_cfg)["x_norm_patchtokens"]
    m = patch_mask.astype(toks.dtype)
    pooled = (toks * m[:, :, None]).sum(1) / jnp.maximum(
        m.sum(1, keepdims=True), 1.0
    )
    return _l2(pooled)


def text_embed(
    text_params: dict, tokens: jax.Array, text_cfg: clip_mod.ClipTextConfig
) -> jax.Array:
    return _l2(clip_mod.clip_text_forward(text_params, tokens, text_cfg))


def make_align_step(cfg: AlignConfig, tx: optax.GradientTransformation):
    """-> jitted (params, opt_state, pixels_u8, patch_mask, tokens) ->
    (params, opt_state, metrics). Symmetric InfoNCE over the batch; batches
    must not repeat a caption (duplicate captions are false negatives)."""

    def loss_fn(params, pixels, mask, tokens):
        img = image_embed(params["vit"], pixels, cfg.vit, mask)
        txt = text_embed(params["text"], tokens, cfg.text)
        scale = jnp.exp(
            jnp.clip(params["logit_scale"], 0.0, cfg.max_logit_scale)
        )
        logits = scale * img @ txt.T
        labels = jnp.arange(logits.shape[0])
        loss = 0.5 * (
            optax.softmax_cross_entropy_with_integer_labels(
                logits, labels
            ).mean()
            + optax.softmax_cross_entropy_with_integer_labels(
                logits.T, labels
            ).mean()
        )
        acc = (jnp.argmax(logits, axis=-1) == labels).mean()
        return loss, acc

    def step(params, opt_state, pixels, mask, tokens):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, pixels, mask, tokens
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "acc": acc}

    return jax.jit(step, donate_argnums=(0, 1))


def train_align(
    cfg: AlignConfig,
    combos,
    *,
    seed: int = 0,
    img_size: Optional[int] = None,
    log_every: int = 50,
    verbose: bool = True,
) -> Tuple[dict, dict]:
    """Train the two towers on the synthetic world. Returns (params, info).

    Each step renders a FRESH batch of unique combos (jitter = the
    augmentation; uniqueness kills false negatives). Host rendering is
    microseconds per image — nothing here needs a tf.data-style pipeline.
    """
    from patchioner_tpu.text import clip_bpe

    from patchioner_tpu.train import synthetic

    img_size = img_size or cfg.vit.img_size
    grid = img_size // cfg.vit.patch_size
    tok = clip_bpe.get_tokenizer()
    captions = [c.caption for c in combos]
    tokens_all = np.asarray(
        tok.tokenize(captions, cfg.text.context_length), np.int32
    )
    masks_all = np.stack(
        [synthetic.patch_mask_for(c, grid) for c in combos]
    )

    tx = optax.adamw(
        optax.cosine_decay_schedule(cfg.lr, cfg.steps), b1=0.9, b2=0.98,
        weight_decay=cfg.weight_decay,
    )
    # jit the inits: eager per-layer RNG/zeros are hundreds of individual
    # dispatches — minutes over a remote-device tunnel (CLAUDE.md rule)
    params = jax.jit(lambda k: init_align(k, cfg))(jax.random.PRNGKey(seed))
    opt_state = jax.jit(tx.init)(params)
    step_fn = make_align_step(cfg, tx)

    rng = np.random.default_rng(seed + 1)
    n = len(combos)
    bs = min(cfg.batch, n)
    history = []
    for step in range(cfg.steps):
        idx = rng.permutation(n)[:bs]
        pixels = synthetic.render_training_batch(
            [combos[i] for i in idx], rng, img_size
        )
        params, opt_state, metrics = step_fn(
            params, opt_state, jnp.asarray(pixels),
            jnp.asarray(masks_all[idx]), jnp.asarray(tokens_all[idx]),
        )
        if (step + 1) % log_every == 0 or step == cfg.steps - 1:
            loss = float(metrics["loss"])
            acc = float(metrics["acc"])
            history.append({"step": step + 1, "loss": loss, "acc": acc})
            if verbose:
                print(f"align step {step + 1}/{cfg.steps} "
                      f"loss {loss:.4f} batch-acc {acc:.3f}")
    return params, {"history": history, "final": history[-1] if history else None}


def retrieval_accuracy(
    params: dict, cfg: AlignConfig, combos, *, seed: int = 123,
    img_size: Optional[int] = None,
) -> float:
    """Fraction of fresh renderings whose masked-mean image embedding ranks
    its own caption first among ALL combos' captions — the alignment-quality
    gate the convergence proof pins."""
    from patchioner_tpu.text import clip_bpe

    from patchioner_tpu.train import synthetic

    img_size = img_size or cfg.vit.img_size
    grid = img_size // cfg.vit.patch_size
    tok = clip_bpe.get_tokenizer()
    tokens = jnp.asarray(
        tok.tokenize([c.caption for c in combos], cfg.text.context_length)
    )
    txt = text_embed(params["text"], tokens, cfg.text)
    rng = np.random.default_rng(seed)
    pixels = synthetic.render_training_batch(combos, rng, img_size)
    masks = np.stack([synthetic.patch_mask_for(c, grid) for c in combos])
    img = image_embed(
        params["vit"], jnp.asarray(pixels), cfg.vit, jnp.asarray(masks)
    )
    pred = jnp.argmax(img @ txt.T, axis=-1)
    return float((pred == jnp.arange(len(combos))).mean())
