"""Patchioner — the central orchestrator, TPU-native.

Rebuilds the reference's `Patchioner` (src/model.py:98-1436): one frozen
vision backbone emits patch tokens; every spatial query (whole image, bbox
set, trace, single patch, register) reduces to one embedding by weighted
patch aggregation; the embedding is projected through the support memory into
CLIP-text space and greedy-decoded by DeCap's 4-layer GPT-2.

Design differences from the reference (all behavior-preserving):
  * No forward hooks — the encoder returns last-block fused-qkv activations
    directly (models/vit.py), so the whole image->tokens step is ONE jitted
    XLA program.
  * Region aggregation is batched masked reductions (ops/region_pooling), not
    per-(image, box) Python loops.
  * The memory projection runs as a fused Pallas kernel streaming the bank
    once through VMEM (ops/memory_projection) on TPU.
  * Greedy decode is a lax.scan over a static KV cache (models/decap) instead
    of re-feeding the growing context every step.

The `forward(...)` flag surface, output dict keys, and nesting match the
reference (src/model.py:718-1058) so eval harnesses port unchanged.
"""

from __future__ import annotations

import dataclasses
import os
import threading
import warnings
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from patchioner_tpu.models import decap as decap_mod
from patchioner_tpu.models import gpt2 as gpt2_mod
from patchioner_tpu.models import talk2dino as t2d
from patchioner_tpu.models import vit as vit_mod
from patchioner_tpu.ops import memory_projection as memproj
from patchioner_tpu.ops import region_pooling as rp
from patchioner_tpu.text import clip_bpe

__all__ = ["Patchioner"]


def _as_nhwc(imgs) -> jnp.ndarray:
    """Accept NHWC or NCHW float batches (torch pipelines produce NCHW)."""
    x = jnp.asarray(imgs)
    if x.ndim != 4:
        raise ValueError(f"expected a 4D image batch, got shape {x.shape}")
    if x.shape[1] == 3 and x.shape[-1] != 3:
        x = x.transpose(0, 2, 3, 1)
    return x


@jax.jit
def _normalize_uint8(x: jnp.ndarray, mean: jnp.ndarray,
                     std: jnp.ndarray) -> jnp.ndarray:
    """uint8 NHWC -> normalized float32, ON DEVICE. Lets input pipelines
    ship uint8 over the host->device link (4x fewer bytes than float32 —
    the link, not the decode, bounds eval input throughput) and fold the
    /255-mean/std into one fused device kernel."""
    return (x.astype(jnp.float32) / 255.0 - mean) / std


class _FallbackWordTokenizer:
    """Whitespace tokenizer used ONLY when the GPT-2 BPE vocab files are
    unavailable (zero-egress) and allow_missing_weights=True — keeps the
    ViECap/ClipCap pipelines runnable; NOT caption parity."""

    pad_token_id = 0

    def __init__(self):
        self.vocab, self.rev = {}, {}

    def _id(self, w):
        if w not in self.vocab:
            i = len(self.vocab) + 10
            self.vocab[w] = i
            self.rev[i] = w
        return self.vocab[w]

    def encode(self, text):
        return [self._id(w) for w in text.strip().split(" ") if w]

    def decode(self, ids):
        return " ".join(self.rev.get(int(i), "") for i in ids).strip()


_WARNED_GPT2_FALLBACK = False


def _get_gpt2_tokenizer(allow_fallback: bool):
    """GPT-2 tokenizer resolution: transformers' local cache, then the
    in-tree byte-level BPE implementation over any locally present vocab
    files (text/gpt2_bpe.py — $GPT2_BPE_DIR or the HF cache), then a
    whitespace fallback (warned once; not caption parity)."""
    try:
        from transformers import AutoTokenizer

        return AutoTokenizer.from_pretrained("gpt2", local_files_only=True)
    except Exception:
        pass
    from patchioner_tpu.text import gpt2_bpe

    tok = gpt2_bpe.load_gpt2_tokenizer()
    if tok is not None:
        return tok
    if allow_fallback:
        global _WARNED_GPT2_FALLBACK
        if not _WARNED_GPT2_FALLBACK:
            _WARNED_GPT2_FALLBACK = True
            warnings.warn(
                "GPT-2 vocab files unavailable locally (set $GPT2_BPE_DIR "
                "to a dir with vocab.json+merges.txt) — using a whitespace "
                "fallback tokenizer (not caption parity)"
            )
        return _FallbackWordTokenizer()
    raise FileNotFoundError(
        "GPT-2 tokenizer files unavailable; set $GPT2_BPE_DIR or pass "
        "allow_missing_weights=True"
    )


def uses_fallback_tokenizer(model) -> bool:
    """True when any GPT-2-decoding component of `model` (ViECap / MeaCap /
    ClipCap) would detokenize through the whitespace fallback — i.e. its
    caption STRINGS are not parity with the reference's GPT-2 BPE decode.
    DeCap uses the self-contained CLIP BPE and never trips this."""
    for comp in (getattr(model, "viecap", None), getattr(model, "clipcap", None)):
        if isinstance(getattr(comp, "tokenizer", None), _FallbackWordTokenizer):
            return True
    return False


def require_parity_tokenizer(model, allow_fallback: bool, context: str):
    """Fail-fast policy for result-producing runs (VERDICT r3 #5): a CSV
    must not be silently produced on whitespace-fallback tokenization. The
    eval CLIs and ExperimentRunner call this after the model builds; the
    interactive demo keeps the warn-once path instead."""
    if allow_fallback or not uses_fallback_tokenizer(model):
        return
    raise RuntimeError(
        f"{context}: this model decodes captions through GPT-2, but no "
        "GPT-2 BPE vocab is available locally, so caption strings would "
        "come from the whitespace FALLBACK tokenizer (not parity with the "
        "reference). Set $GPT2_BPE_DIR to a directory containing "
        "vocab.json + merges.txt (or populate the HF cache), or pass "
        "--allow-tokenizer-fallback to run anyway."
    )


def _build_viecap_family(vcfg_dict: dict, clip_model_name, rng_key,
                         allow_missing_weights: bool, gpt2_tokenizer,
                         concept_extractor):
    """Build VieCap or MeaCap from the nested `viecap:` config block
    (reference: src/model.py:107-113, viecap/entrypoint.py:61-96)."""
    from patchioner_tpu.models import viecap as viecap_mod

    vd = dict(vcfg_dict)
    mea = vd.pop("meacap", None)
    clip_hidden = vd.get("clip_hidden_size") or (
        640 if clip_model_name and "RN" in clip_model_name else 512
    )
    cfg = viecap_mod.ViecapConfig(
        continuous_prompt_length=vd.get("continuous_prompt_length", 10),
        clip_project_length=vd.get("clip_project_length", 10),
        clip_hidden_size=clip_hidden,
        temperature=vd.get("temperature", 0.01),
        top_k=vd.get("top_k", 3),
        threshold=vd.get("threshold", 0.2),
        using_hard_prompt=vd.get("using_hard_prompt", False),
        soft_prompt_first=vd.get("soft_prompt_first", False),
        only_hard_prompt=vd.get("only_hard_prompt", False),
        using_greedy_search=vd.get("using_greedy_search", False),
        beam_width=vd.get("beam_width", 5),
        name_of_entities_text=vd.get(
            "name_of_entities_text", "vinvl_vgoi_entities"
        ),
        prompt_ensemble=vd.get("prompt_ensemble", False),
        # serving lever, OFF = reference per-batch-max padding (see
        # ViecapConfig.hard_prompt_pad_multiple)
        hard_prompt_pad_multiple=vd.get("hard_prompt_pad_multiple", 0),
    )
    gpt2_cfg = gpt2_mod.GPT2_BASE_CONFIG

    weight_path = vd.get("weight_path")
    if weight_path and os.path.isdir(weight_path):
        # an Orbax dir from this framework's train/prefix_cli.py — the
        # native round-trip of the reference's torch.save/torch.load cycle
        # (viecap/training/main.py:100-105 -> entrypoint.py:82-96)
        from patchioner_tpu.io import checkpoints

        mapping = checkpoints.load_mapper_from_train_dir(weight_path)
        if "prefix_const" not in mapping:
            raise ValueError(
                f"{weight_path!r} is not a ViECap MappingNetwork training "
                f"checkpoint (trained with --model clipcap?)"
            )
        gpt2_params = None
    elif weight_path and os.path.exists(weight_path):
        import torch

        sd = torch.load(weight_path, map_location="cpu")
        mapping = viecap_mod.port_mapping_network(sd, num_layers=cfg.num_layers)
        if any(k.startswith("gpt.") for k in sd):
            from patchioner_tpu.io import torch_port

            gpt2_params = torch_port.port_hf_gpt2_lmhead(
                {k[4:]: v for k, v in sd.items() if k.startswith("gpt.")},
                gpt2_cfg.n_layer,
            )
        else:
            gpt2_params = None
    elif allow_missing_weights:
        mapping = viecap_mod.init_mapping_network(rng_key, cfg, gpt2_cfg.n_embd)
        gpt2_params = None
    else:
        raise FileNotFoundError(f"ViECap weights not found: {weight_path}")
    if gpt2_params is None:
        if not allow_missing_weights:
            raise FileNotFoundError(
                "pretrained GPT-2 weights unavailable locally for ViECap"
            )
        gpt2_params = gpt2_mod.init_gpt2(rng_key, gpt2_cfg)
    gpt2_params = jax.tree_util.tree_map(jnp.asarray, gpt2_params)
    # None biases (bias=False linears) are empty pytree nodes — skipped.
    mapping = jax.tree_util.tree_map(jnp.asarray, mapping)

    tokenizer = gpt2_tokenizer or _get_gpt2_tokenizer(allow_missing_weights)

    if mea is not None:
        from patchioner_tpu.models import meacap as meacap_mod

        base = mea.get("memory_base_path", "")
        mem_id = mea.get("memory_id", "")
        mem_dir = os.path.join(base, "memory", mem_id)
        if os.path.exists(mem_dir):
            captions, clip_emb = meacap_mod.MeaCap.load_memory(base, mem_id)
        elif allow_missing_weights:
            captions = [f"synthetic memory caption {i}" for i in range(64)]
            clip_emb = np.asarray(
                jax.random.normal(rng_key, (64, clip_hidden)), np.float32
            )
        else:
            raise FileNotFoundError(f"MeaCap memory bank not found: {mem_dir}")
        return meacap_mod.MeaCap(
            cfg, gpt2_cfg, gpt2_params, mapping, captions, clip_emb, tokenizer,
            memory_caption_num=mea.get("memory_caption_num", 5),
            concept_extractor=concept_extractor,
        )

    # Entity vocabulary + embeddings (vendored reference data artifacts).
    from patchioner_tpu.models.viecap import VOCAB_DIR, load_entities_text

    suffix = (vd.get("suffix") or (clip_model_name or "ViT-B/32")).replace("/", "")
    name = cfg.name_of_entities_text
    vocab_files = {
        "coco_entities": "coco_categories.json",
        "vinvl_vgoi_entities": "vgcocooiobjects_v1_class2ind.json",
        "visual_genome_entities": "all_objects_attributes_relationships.pickle",
        "open_image_entities": "oidv7-class-descriptions-boxable.csv",
        "vinvl_vg_entities": "VG-SGG-dicts-vgoi6-clipped.json",
    }
    emb_stems = {
        "coco_entities": "coco_embeddings",
        "vinvl_vgoi_entities": "vgoi_embeddings",
        "visual_genome_entities": "visual_genome_embedding",
        "open_image_entities": "open_image_embeddings",
        "vinvl_vg_entities": "vg_embeddings",
    }
    files_path = vd.get("files_path", "")
    vocab_dir = os.path.join(files_path, "annotations/vocabulary")
    if not os.path.exists(vocab_dir):
        vocab_dir = VOCAB_DIR
    entities = load_entities_text(
        name, os.path.join(vocab_dir, vocab_files[name])
    )
    ens = "_with_ensemble" if cfg.prompt_ensemble else ""
    emb_path = os.path.join(vocab_dir, f"{emb_stems[name]}_{suffix}{ens}.pickle")
    if os.path.exists(emb_path):
        import pickle as _pickle

        with open(emb_path, "rb") as f:
            emb = _pickle.load(f)
        emb = np.asarray(
            emb.detach().cpu().numpy() if hasattr(emb, "detach") else emb,
            np.float32,
        )
    elif allow_missing_weights:
        emb = np.asarray(
            jax.random.normal(rng_key, (len(entities), clip_hidden)), np.float32
        )
    else:
        raise FileNotFoundError(f"entity embeddings not found: {emb_path}")
    return viecap_mod.VieCap(
        cfg, gpt2_cfg, gpt2_params, mapping, entities, emb, tokenizer
    )


def _traces_to_arrays(traces, max_points: Optional[int] = None):
    """Reference trace format (list per image of point dicts {'x','y'} — the
    flattened Localized-Narratives traces, src/bbox_utils.py:158) -> padded
    (B, P, 2) array + (B, P) validity mask. Plain (x, y) pairs are accepted
    too (convenience for the JSON demo API)."""
    seqs = []
    for tr in traces:
        pts = [
            (float(p["x"]), float(p["y"])) if isinstance(p, dict)
            else (float(p[0]), float(p[1]))
            for p in tr
        ]
        seqs.append(pts)
    p = max_points or max((len(s) for s in seqs), default=1) or 1
    out = np.zeros((len(seqs), p, 2), np.float32)
    valid = np.zeros((len(seqs), p), np.float32)
    for i, s in enumerate(seqs):
        if s:
            out[i, : len(s)] = s[: p]
            valid[i, : len(s)] = 1.0
    return jnp.asarray(out), jnp.asarray(valid)


class Patchioner:
    """Zero-shot captioner over a frozen patch-token backbone.

    Build with `Patchioner.from_config(path_or_dict_or_hf_id)` — the config
    schema is the reference's YAML (configs/*.yaml; src/model.py:666-715).
    """

    def __init__(
        self,
        *,
        vit_cfg,
        vit_params: dict,
        backbone_type: str = "DINO",
        skip_last_layers: int = 0,
        diag_last_layers: int = 0,
        skip_ln_post: bool = False,
        gpt2_cfg: Optional[gpt2_mod.GPT2Config],
        decoder: Optional[decap_mod.DecapParams],
        bank: Optional[memproj.PreparedBank],
        bank_texts: Optional[list],
        normalize: bool = True,
        calculate_argmax_text: bool = False,
        embed_inversion: bool = False,
        inversion: Optional[dict] = None,
        tokenizer=None,
        entry_length: int = decap_mod.ENTRY_LENGTH,
        config: Optional[dict] = None,
        viecap=None,
        clipcap=None,
    ):
        self.vit_cfg = vit_cfg
        self.vit_params = vit_params
        self.backbone_type = backbone_type  # 'DINO' | 'CLIP' | 'INViTE'
        self.skip_last_layers = skip_last_layers
        self.diag_last_layers = diag_last_layers
        self.skip_ln_post = skip_ln_post
        self.gpt2_cfg = gpt2_cfg
        self.decoder = decoder
        self.bank = bank
        self.bank_texts = bank_texts
        self.normalize = normalize
        self.calculate_argmax_text = calculate_argmax_text
        self.embed_inversion = embed_inversion
        self.inversion = inversion
        self.tokenizer = tokenizer or clip_bpe.get_tokenizer()
        self.entry_length = entry_length
        self.config = config or {}
        # per-instance serving locks (class-level defaults cover snapshots
        # restored without __init__): _compile_lock serializes fused-program
        # cache builds, _placed_lock the one-time mesh state replication
        self._compile_lock = threading.RLock()
        self._placed_lock = threading.Lock()
        self.viecap = viecap  # VieCap or MeaCap instance (delegated decoding)
        self.clipcap = clipcap  # ClipCap instance
        # Normalization stats for the uint8 device-side input path
        # (encode_images); default = the reference's ImageNet transform
        # (src/model.py:556-567), overridable per config.
        from patchioner_tpu.utils import transforms as _T

        self._image_mean = jnp.asarray(
            self.config.get("image_mean", _T.IMAGENET_MEAN), jnp.float32
        )
        self._image_std = jnp.asarray(
            self.config.get("image_std", _T.IMAGENET_STD), jnp.float32
        )
        # Attention-extraction parameters (reference src/model.py:336-337,
        # 557: scale always 0.125, 1 global token for CLIP towers).
        if backbone_type == "DINO":
            self.extract_heads = vit_cfg.extract_heads
            self.num_global_tokens = vit_cfg.num_global_tokens
            self.extract_scale = vit_cfg.extract_scale
        else:
            # reference rule (src/model.py:336): 16 heads iff dino_model is
            # SET and not a vits name, else 6 — e.g. a denseclip config
            # without a dino_model key extracts with 6 heads there; the
            # shipped non-DINO configs all set dino_model, where 16 applies
            dm = (self.config or {}).get("dino_model")
            self.extract_heads = 16 if dm is not None and "vits" not in dm else 6
            self.num_global_tokens = 1
            self.extract_scale = 0.125
        self.patch_size = vit_cfg.patch_size
        self.crop_dim = vit_cfg.img_size
        self.resize_dim = int(self.config.get("resize_dim", vit_cfg.img_size))
        self._use_pallas = jax.default_backend() not in ("cpu",)

    # ------------------------------------------------------------- build

    @classmethod
    def from_config(
        cls,
        config,
        *,
        rng_seed: int = 0,
        allow_missing_weights: bool = False,
        random_bank_size: Optional[int] = None,
        dtype=jnp.float32,
        gpt2_tokenizer=None,
        concept_extractor=None,
    ) -> "Patchioner":
        """Build from the reference YAML schema (path, dict, or HF model id —
        remote ids require local cache in this zero-egress build).

        With `allow_missing_weights=True`, absent checkpoint/bank artifacts
        fall back to seeded random init — the full pipeline stays runnable
        (benchmarks, sharding dry-runs, integration tests)."""
        if isinstance(config, str):
            if os.path.exists(config):
                with open(config) as f:
                    config = yaml.safe_load(f)
            else:
                # Treat as a HF model id / URL: download config.yaml
                # (reference src/model.py:666-683) — networked envs only.
                from patchioner_tpu.io.hf_hub import (
                    get_model_path_with_hf_fallback,
                )

                repo_id = str(config).split("huggingface.co/")[-1]
                path = get_model_path_with_hf_fallback(
                    None, hf_repo_id=repo_id, filename="config.yaml"
                )
                with open(path) as f:
                    config = yaml.safe_load(f)
                config.setdefault("hf_repo_id", repo_id)
        config = dict(config)
        if "kkv_attention" in config and "attention_type" not in config:
            # Reference quirk: the loader reads `attention_type` only; configs
            # carrying the README-documented `kkv_attention` key are silently
            # ignored (src/model.py:696 vs README). We warn instead of guessing.
            warnings.warn(
                "config key 'kkv_attention' is ignored (reference parity); "
                "use attention_type: 'kkv'"
            )


        dino_model = config.get("dino_model", None)
        crop_dim = int(config.get("crop_dim", 518))
        attention_type = config.get("attention_type", "qkv")
        key = jax.random.PRNGKey(rng_seed)
        k_vit, k_dec, k_bank = jax.random.split(key, 3)

        backbone_type = "DINO"
        skip_last_layers = 0
        diag_last_layers = 0
        skip_ln_post = False
        if dino_model is not None and "dinov2" in dino_model:
            variant = dino_model
            if "dinotxt" in dino_model:
                # DINO.txt unwraps to its inner dinov2 backbone
                # (src/model.py:345-346); the tet1280d20h24l release wraps a
                # ViT-L/14 with registers. Banks slice [:, 1024:] at load.
                backbone_type = "DINO"
                variant = "dinov2_vitl14_reg"
            # extension over the reference schema: 'dino_geometry' overrides
            # the variant's tower geometry (embed_dim/depth/num_heads/...)
            # — lets from-scratch-trained towers (train/align.py, the
            # convergence proof) and CPU-scale tests flow through the SAME
            # builder as the flagship instead of a side-door constructor
            geom = dict(config.get("dino_geometry") or {})
            vit_cfg = vit_mod.config_for(
                variant, img_size=crop_dim, dtype=dtype, **geom
            )
            # extensions over the reference schema — measured encoder
            # variants (PERF.md): opt-in, defaults match the reference
            if (
                config.get("attn_impl")
                or config.get("softmax_f32") is not None
                or config.get("gelu_approx") is not None
                or config.get("mlp_fused") is not None
                or config.get("qkv_fused") is not None
                or config.get("proj_fused") is not None
            ):
                vit_cfg = dataclasses.replace(
                    vit_cfg,
                    attn_impl=config.get("attn_impl", vit_cfg.attn_impl),
                    softmax_f32=bool(config.get("softmax_f32", vit_cfg.softmax_f32)),
                    gelu_approx=bool(config.get("gelu_approx", vit_cfg.gelu_approx)),
                    mlp_fused=bool(config.get("mlp_fused", vit_cfg.mlp_fused)),
                    qkv_fused=bool(config.get("qkv_fused", vit_cfg.qkv_fused)),
                    proj_fused=bool(config.get("proj_fused", vit_cfg.proj_fused)),
                )
            dino_weights = config.get("dino_weights", None)
            if dino_weights and str(dino_weights).endswith(".npz") and \
                    os.path.exists(dino_weights):
                # native-format tower weights (io/checkpoints.save_params_npz)
                # — how train/align.py's from-scratch towers load back in;
                # torch .pth porting stays the path for reference checkpoints
                from patchioner_tpu.io import checkpoints

                template = jax.eval_shape(
                    lambda k: vit_mod.init_vit(k, vit_cfg), k_vit
                )
                vit_params = checkpoints.load_params_npz(
                    dino_weights, template
                )
            elif dino_weights and os.path.exists(dino_weights):
                import torch

                from patchioner_tpu.io import torch_port

                sd = torch.load(dino_weights, map_location="cpu")
                if isinstance(sd, dict) and "state_dict" in sd:
                    sd = sd["state_dict"]
                if "dinotxt" in dino_model:
                    # hub dinotxt checkpoints nest the backbone under
                    # visual_model.backbone.model (src/model.py:345-346)
                    from patchioner_tpu.models import dinotxt as dinotxt_mod

                    vit_params = dinotxt_mod.port_dinotxt_visual(
                        sd, vit_cfg.depth, vit_cfg.num_registers
                    )
                else:
                    vit_params = torch_port.port_dinov2(
                        sd, vit_cfg.depth, vit_cfg.num_registers
                    )
            elif allow_missing_weights:
                vit_params = jax.jit(lambda k: vit_mod.init_vit(k, vit_cfg))(k_vit)
            else:
                raise FileNotFoundError(
                    "no local DINOv2 weights (set 'dino_weights' or pass "
                    "allow_missing_weights=True)"
                )
            if config.get("encoder_w8a8"):
                vit_params = vit_mod.quantize_vit_weights(vit_params)
        elif config.get("regionclip_config") is not None:
            # RegionCLIP: CLIP ModifiedResNet, attnpool spatial features
            # (src/regionclip/clip_backbone.py:243-300), effective patch 32.
            from patchioner_tpu.models import resnet_clip as rn_mod

            backbone_type = "RegionCLIP"
            rc = dict(config["regionclip_config"])
            vit_cfg = rn_mod.ResNetClipConfig(
                img_size=crop_dim,
                output_dim=rc.get("embed_dim", 1024),
                dtype=dtype,
            )
            ckpt = rc.get("checkpoint")
            if ckpt and os.path.exists(ckpt):
                import torch

                sd = torch.load(ckpt, map_location="cpu")
                sd = sd.get("model", sd)
                # detectron-style prefixes (regionclip/loader.py:92-105)
                sd = {
                    (k.replace("backbone.", "visual.", 1)
                     if k.startswith("backbone.") else k): v
                    for k, v in sd.items()
                }
                vit_params = rn_mod.port_clip_resnet(sd, vit_cfg, prefix="visual.")
            elif allow_missing_weights:
                vit_params = jax.jit(lambda k: rn_mod.init_resnet_clip(k, vit_cfg))(k_vit)
            else:
                raise FileNotFoundError(f"RegionCLIP checkpoint not found: {ckpt}")
        elif config.get("proxyclip_clipmodel") is not None:
            # ProxyCLIP: CLIP visual trunk + DINO proxy-affinity last layer
            # (src/proxyclip/proxyclip.py; src/model.py:191,781). Patch
            # tokens only, on the VFM grid.
            from patchioner_tpu.models import clip as clip_mod
            from patchioner_tpu.models import proxyclip as pc_mod

            backbone_type = "ProxyCLIP"
            clip_name = config["proxyclip_clipmodel"]
            vfm_name = config.get("proxyclip_vfm", "dinov2")
            cpatch = 14 if "/14" in clip_name else (32 if "/32" in clip_name else 16)
            if "ViT-L" in clip_name:
                cw, cd_, ch, cp = 1024, 24, 16, 768
            else:
                cw, cd_, ch, cp = 768, 12, 12, 512
            clip_cfg = clip_mod.ClipVisionConfig(
                img_size=224, patch_size=cpatch, width=cw, depth=cd_,
                heads=ch, proj_dim=cp, dtype=dtype,
            )
            vfm_cfg = vit_mod.config_for(
                "dinov2_vitb14_reg" if vfm_name == "dinov2" else "dinov2_vitb14",
                img_size=crop_dim, dtype=dtype,
            )
            pcfg = pc_mod.ProxyClipConfig(
                clip=clip_cfg, vfm=vfm_cfg,
                beta=float(config.get("proxyclip_beta", 1.2)),
                gamma=float(config.get("proxyclip_gamma", 3.0)),
            )
            if allow_missing_weights:
                kc, kv2 = jax.random.split(k_vit)
                vit_params = jax.jit(lambda a, b: {
                    "clip": clip_mod.init_clip_vision(a, clip_cfg),
                    "vfm": vit_mod.init_vit(b, vfm_cfg),
                })(kc, kv2)
            else:
                clip_w = config.get("clip_weights")
                dino_w = config.get("dino_weights")
                if not (clip_w and os.path.exists(clip_w) and dino_w
                        and os.path.exists(dino_w)):
                    raise FileNotFoundError(
                        "ProxyCLIP needs 'clip_weights' (openai layout) and "
                        "'dino_weights' locally"
                    )
                import torch

                from patchioner_tpu.io import torch_port

                csd = torch.load(clip_w, map_location="cpu")
                prefix = "visual." if any(
                    k.startswith("visual.") for k in csd) else ""
                dsd = torch.load(dino_w, map_location="cpu")
                vit_params = {
                    "clip": clip_mod.port_openai_clip_vision(
                        csd, cd_, prefix=prefix),
                    "vfm": torch_port.port_dinov2(
                        dsd, vfm_cfg.depth, vfm_cfg.num_registers),
                }
            vit_cfg = pcfg  # ProxyClipConfig carries both tower configs
        elif config.get("alphaclip_config") is not None:
            # AlphaCLIP: CLIP ViT with an extra 1-channel alpha conv added to
            # the patch embedding — region conditioning happens INSIDE the
            # encoder (src/alphaclip; src/model.py:1060-1354). The reference
            # runs one encoder pass per region; here regions batch into one
            # forward (the alpha mask is just another conv input).
            from patchioner_tpu.models import clip as clip_mod

            backbone_type = "AlphaClip"
            acfg = dict(config["alphaclip_config"])
            name = acfg.get("name", "ViT-B/16")
            patch = acfg.get("patch_size") or (
                32 if "/32" in name else (14 if "/14" in name else 16)
            )
            if "ViT-L" in name:
                width, depth, heads, proj = 1024, 24, 16, 768
            else:
                width, depth, heads, proj = 768, 12, 12, 512
            vit_cfg = clip_mod.ClipVisionConfig(
                img_size=crop_dim, patch_size=patch, width=width, depth=depth,
                heads=heads, proj_dim=acfg.get("embed_dim", proj), dtype=dtype,
            )
            ckpt = acfg.get("checkpoint", None)
            if ckpt and os.path.exists(ckpt):
                import torch

                sd = torch.load(ckpt, map_location="cpu")
                prefix = "visual." if any(
                    k.startswith("visual.") for k in sd
                ) else ""
                vit_params = clip_mod.port_openai_clip_vision(
                    sd, depth, prefix=prefix
                )
            elif allow_missing_weights:
                vit_params = jax.jit(lambda k: clip_mod.init_clip_vision(k, vit_cfg))(k_vit)
            else:
                raise FileNotFoundError("no local AlphaCLIP checkpoint")
            if "alpha_embed_w" not in vit_params:
                vit_params["alpha_embed_w"] = clip_mod.init_alpha_embed(
                    k_vit, vit_cfg
                )
        elif config.get("denseclip_config") is not None:
            # DenseCLIP's visual tower IS a standard CLIP ViT whose forward
            # returns ln_post+proj over ALL tokens (src/denseclip/clip_loader/
            # models.py:156-181) — exactly clip_visual_forward. The config
            # YAML provides geometry (vendored copies in data/denseclip_configs).
            from patchioner_tpu.models import clip as clip_mod

            backbone_type = "DenseClip"
            dc_name = config["denseclip_config"]
            dc_path = dc_name if os.path.exists(str(dc_name)) else os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(vit_mod.__file__))),
                "data", "denseclip_configs", f"{dc_name}.yaml",
            )
            with open(dc_path) as f:
                dc = yaml.safe_load(f)
            vis = dc.get("model", {}).get("vision", {})
            vit_cfg = clip_mod.ClipVisionConfig(
                img_size=crop_dim,
                patch_size=vis.get("vision_patch_size", 16),
                width=vis.get("vision_width", 768),
                depth=vis.get("vision_layers", 12),
                heads=vis.get("vision_width", 768) // 64,
                proj_dim=vis.get("embed_dim", 512),
                dtype=dtype,
            )
            ckpt = dc.get("checkpoint", {}).get("path")
            ckpt = config.get("denseclip_weights", ckpt)
            if ckpt and os.path.exists(ckpt):
                import torch

                sd = torch.load(ckpt, map_location="cpu")
                sd = sd.get("state_dict", sd)
                # segmentation checkpoints prefix the tower with 'backbone.'
                sd = {k.replace("backbone.", "", 1) if k.startswith("backbone.")
                      else k: v for k, v in sd.items()}
                prefix = "visual." if any(
                    k.startswith("visual.") for k in sd) else ""
                vit_params = clip_mod.port_openai_clip_vision(
                    sd, vit_cfg.depth, prefix=prefix)
            elif allow_missing_weights:
                vit_params = jax.jit(lambda k: clip_mod.init_clip_vision(k, vit_cfg))(k_vit)
            else:
                raise FileNotFoundError(f"DenseCLIP checkpoint not found: {ckpt}")
        elif config.get("use_open_clip") and dino_model is not None:
            # OpenCLIP backbone: standard CLIP ViT but the reference projects
            # the PRE-ln_post transformer output (hook at src/model.py:766-768,
            # applied :848-859) — skip_ln_post reproduces the quirk.
            from patchioner_tpu.models import clip as clip_mod

            backbone_type = "OpenCLIP"
            skip_ln_post = True
            patch = int(str(dino_model).split("/")[-1])
            if "ViT-L" in dino_model:
                width, depth, heads, proj = 1024, 24, 16, 768
            else:
                width, depth, heads, proj = 768, 12, 12, 512
            vit_cfg = clip_mod.ClipVisionConfig(
                img_size=crop_dim, patch_size=patch, width=width, depth=depth,
                heads=heads, proj_dim=proj, dtype=dtype,
            )
            clip_weights = config.get("clip_weights", None)
            if clip_weights and os.path.exists(clip_weights):
                import torch

                sd = torch.load(clip_weights, map_location="cpu")
                prefix = "visual." if any(
                    k.startswith("visual.") for k in sd) else ""
                vit_params = clip_mod.port_openai_clip_vision(
                    sd, depth, prefix=prefix)
            elif allow_missing_weights:
                vit_params = jax.jit(lambda k: clip_mod.init_clip_vision(k, vit_cfg))(k_vit)
            else:
                raise FileNotFoundError("no local OpenCLIP weights")
        elif (dino_model is not None and "openai" in dino_model) or config.get(
            "invite_config"
        ):
            # timm-style OpenAI CLIP names, e.g. 'vit_base_patch16_clip_224
            # .openai' (reference src/model.py:358-377), or INViTE's
            # truncated-layer CLIP fork (src/INViTE, src/model.py:464).
            from patchioner_tpu.models import clip as clip_mod

            backbone_type = "CLIP"
            invite = config.get("invite_config") or {}
            if invite:
                backbone_type = "INViTE"
                # last k layers get diagonal-only attention
                # (invite_config.extract_last_k_th_token; INViTE loader.py:52)
                diag_last_layers = max(
                    0, int(invite.get("extract_last_k_th_token", -1))
                )
                name = invite.get("name", "ViT-B/32")
                patch = 32 if "/32" in name else (16 if "/16" in name else 14)
            else:
                patch = int(dino_model.split("patch")[1].split("_")[0])
            if "large" in (dino_model or "") or "ViT-L" in str(invite.get("name", "")):
                width, depth, heads, proj = 1024, 24, 16, 768
            else:
                width, depth, heads, proj = 768, 12, 12, 512
            vit_cfg = clip_mod.ClipVisionConfig(
                img_size=crop_dim, patch_size=patch, width=width, depth=depth,
                heads=heads, proj_dim=proj, dtype=dtype,
            )
            clip_weights = config.get("clip_weights", None)
            if clip_weights and os.path.exists(clip_weights):
                import torch

                sd = torch.load(clip_weights, map_location="cpu")
                vit_params = clip_mod.port_hf_clip_vision(sd, depth)
            elif allow_missing_weights:
                vit_params = jax.jit(lambda k: clip_mod.init_clip_vision(k, vit_cfg))(k_vit)
            else:
                raise FileNotFoundError(
                    "no local CLIP weights (set 'clip_weights' or pass "
                    "allow_missing_weights=True)"
                )
        else:
            raise NotImplementedError(
                f"backbone '{dino_model}' not wired yet "
                "(DINOv2 / OpenAI-CLIP / INViTE variants)"
            )
        vit_params = jax.tree_util.tree_map(jnp.asarray, vit_params)
        if attention_type != "qkv":
            # The reference rewires `self.dino.blocks[-1].attn.qkv`
            # UNCONDITIONALLY (src/model.py:569-582): that works for any
            # timm-style tower (DINOv2 hub, timm OpenAI CLIP, INViTE's
            # fork once loaded) and crashes on towers without `.blocks`
            # (OpenCLIP resblocks, ResNets). Match: reorder wherever the
            # params carry a fused last-block qkv, raise clearly elsewhere.
            blocks = vit_params.get("blocks") if isinstance(vit_params, dict) else None
            if blocks and isinstance(blocks[-1], dict) and "qkv" in blocks[-1]:
                vit_params = vit_mod.reorder_qkv_params(vit_params, attention_type)
            else:
                raise ValueError(
                    f"attention_type={attention_type!r} needs a tower with "
                    f"a fused last-block qkv; {backbone_type} has none "
                    "(the reference's .blocks[-1].attn.qkv access crashes "
                    "there too)"
                )

        calculate_argmax_text = bool(config.get("calculate_argmax_text", False))

        # --- decoder (the DeCap 4L/4H/768 architecture; dtype follows the
        # model-wide dtype so bf16 flagships decode in bf16 with f32 logits)
        prefix_size = int(config["prefix_size"])
        # extension over the reference schema: 'decap_arch' overrides the
        # DeCap decoder geometry (reference hard-codes 4L/4H/768 via its
        # decoder_config.pkl, src/decap/decap.py:46-58) — CPU-scale
        # convergence tests train and load tiny decoders through the same
        # train/cli.py -> from_config round-trip as the real one
        da = dict(config.get("decap_arch") or {})
        gpt2_cfg = gpt2_mod.GPT2Config(
            n_layer=int(da.get("n_layer", 4)),
            n_head=int(da.get("n_head", 4)),
            n_embd=int(da.get("n_embd", 768)),
            vocab_size=int(da.get("vocab_size",
                                  gpt2_mod.GPT2Config.vocab_size)),
            dtype=dtype,
        )
        decoder = None
        if not calculate_argmax_text:
            weights = config.get("decap_weights", None)
            if weights and os.path.isdir(weights):
                # a directory is an Orbax train-checkpoint dir from this
                # framework's own `train/cli.py` — the native round-trip
                # (the reference's equivalent is torch.load of its own
                # torch.save, decap.py:207-218)
                from patchioner_tpu.io import checkpoints

                decoder = checkpoints.load_decap_from_train_dir(weights)
                got = decoder.clip_project["w"].shape
                got_layers = len(decoder.gpt2["blocks"])
                if (got[0] != prefix_size or got[1] != gpt2_cfg.n_embd
                        or got_layers != gpt2_cfg.n_layer):
                    raise ValueError(
                        f"decoder checkpoint at {weights!r} has "
                        f"{got_layers} layers mapping {got[0]}->{got[1]} "
                        f"but this config expects n_layer="
                        f"{gpt2_cfg.n_layer}, prefix_size={prefix_size} "
                        f"-> n_embd={gpt2_cfg.n_embd}"
                    )
            elif weights and os.path.exists(weights):
                import torch

                from patchioner_tpu.io import torch_port

                sd = torch.load(weights, map_location="cpu")
                ported = torch_port.port_decap(sd, n_layer=gpt2_cfg.n_layer)
                decoder = decap_mod.DecapParams(
                    gpt2=ported["gpt2"], clip_project=ported["clip_project"]
                )
            elif allow_missing_weights:
                decoder = jax.jit(lambda k: decap_mod.init_decap(k, gpt2_cfg, prefix_size))(k_dec)
            else:
                raise FileNotFoundError(
                    "no local DeCap weights ('decap_weights' missing); pass "
                    "allow_missing_weights=True for random init"
                )
            decoder = jax.tree_util.tree_map(jnp.asarray, decoder)

        # --- Talk2DINO embedding inversion (src/model.py:618-625). Detected
        # before the bank build: with inversion active the bank lives in
        # Talk2DINO (DINO) space and the decoder prefix in CLIP space, so the
        # random-init fallback bank must use the inversion's input dim, not
        # `prefix_size` (reference banks get this via the use_talk2dino HDF5).
        embed_inversion = False
        inversion = None
        t2d_weights = config.get("talk2dino_weights", None)
        if t2d_weights and os.path.exists(t2d_weights):
            import torch

            from patchioner_tpu.io import torch_port

            t2d_params = torch_port.port_talk2dino(
                torch.load(t2d_weights, map_location="cpu")
            )
            inversion = t2d.build_inversion(t2d_params)
            embed_inversion = True

        # --- support memory
        bank = None
        bank_texts = None
        support_size = int(config.get("support_memory_size", 0))
        if support_size > 0:
            from patchioner_tpu.io import memory_bank as mb

            projection_type = config.get("projection_type", "coco")
            bank_path = config.get("memory_bank_path", None)
            dataset = None
            if bank_path is None:
                memdir = os.getenv("IM2TXT_MEMORY_PATH", "/im2txtmemories")
                fname, dataset = mb.bank_filename(
                    projection_type,
                    # pass None through: bank_filename resolves it like the
                    # reference (ViT-B/16 under talk2dino, else ViT-B/32,
                    # im2txtprojection.py:284-295) — a hardcoded ViT-B/16
                    # here mis-named non-talk2dino drop-in banks
                    config.get("clip_model_name"),
                    support_size,
                    use_talk2dino=config.get("use_talk2dino_project", True),
                    linear_talk2dino=config.get("linear_talk2dino", False),
                    talk2dino_attn_type=config.get("talk2dino_attn_type", "qkv"),
                    use_open_clip=config.get("use_open_clip", False),
                )
                bank_path = os.path.join(memdir, fname)
            loaded = None
            if os.path.exists(bank_path):
                loaded = mb.load_bank(
                    bank_path,
                    dataset or mb.PROJECTION_DATASETS.get(projection_type, projection_type),
                    dinotxt_slice="dinotxt" in (dino_model or ""),
                )
            # extension over the reference schema: memory_bank_int8 stores
            # the bank per-row int8-quantized (4x smaller resident in HBM,
            # dequantized inside the projection kernel; see PERF.md)
            bank_int8 = bool(config.get("memory_bank_int8", False))

            def _make_bank(emb):
                if bank_int8:
                    return memproj.quantize_bank(jnp.asarray(emb))
                return memproj.prepare_bank(
                    jnp.asarray(emb), dtype=None if dtype == jnp.float32 else dtype
                )

            if loaded is not None:
                # zero-norm rows already filtered (with texts in lockstep)
                # by io.memory_bank.load_bank, which owns that invariant
                emb = loaded.embeddings
                bank_texts = loaded.texts
                if (dino_model is not None) and ("dinov2" not in dino_model):
                    emb = emb / np.linalg.norm(emb, axis=-1, keepdims=True)
                bank = _make_bank(emb)
            elif allow_missing_weights:
                size = random_bank_size or support_size
                bank_dim = (
                    int(inversion["A_pinv"].shape[1])
                    if embed_inversion
                    else prefix_size
                )
                emb = jax.random.normal(k_bank, (size, bank_dim), jnp.float32)
                bank = _make_bank(emb)
                bank_texts = [f"synthetic caption {i}" for i in range(size)]
            else:
                raise FileNotFoundError(f"memory bank not found at {bank_path}")

        # --- alternative decoder families (nested config blocks)
        viecap = None
        clipcap = None
        if config.get("viecap") is not None:
            viecap = _build_viecap_family(
                config["viecap"],
                config.get("clip_model_name"),
                jax.random.PRNGKey(rng_seed + 1),
                allow_missing_weights,
                gpt2_tokenizer,
                concept_extractor,
            )
        if config.get("clipcap") is not None:
            from patchioner_tpu.models import clipcap as clipcap_mod

            # ClipCap consumes the BACKBONE feature dim, not prefix_size:
            # the reference overrides it per dinov2 size fragment
            # (src/model.py:119-127; substring match, so dinotxt names
            # resolve through their inner vitl fragment too).
            cc_feature_dim = prefix_size
            if dino_model is not None:
                for frag, dim in (
                    ("dinov2_vits14", 384),
                    ("dinov2_vitb14", 768),
                    ("dinov2_vitl14", 1024),
                    ("dinov2_vitg14", 1536),
                ):
                    if frag in dino_model:
                        cc_feature_dim = dim
                        break
            cd = dict(config["clipcap"])
            ccfg = clipcap_mod.ClipCapConfig(
                prefix_length=cd.get("prefix_length", 10),
                clip_length=cd.get("clip_length", 10),
                num_layers=cd.get("num_layers", 8),
                mapping_type=cd.get("mapping_type", "mlp").lower(),
                temperature=cd.get("temperature", 1.0),
                top_p=cd.get("top_p", 0.8),
                entry_length=cd.get("entry_length", 67),
                stop_token=cd.get("stop_token", "."),
                normalize_prefix=cd.get("normalize_prefix", False),
            )
            g_cfg = gpt2_mod.GPT2_BASE_CONFIG
            k_cc = jax.random.PRNGKey(rng_seed + 2)
            wp = cd.get("weight_path")
            gpt2_params_cc = None
            if wp and os.path.isdir(wp):
                # Orbax dir from train/prefix_cli.py --model clipcap
                from patchioner_tpu.io import checkpoints

                mapper = checkpoints.load_mapper_from_train_dir(wp)
                if "fc1" not in mapper:
                    raise ValueError(
                        f"{wp!r} is not a ClipCap MLP-mapper training "
                        f"checkpoint (trained with --model viecap?)"
                    )
            elif wp and os.path.exists(wp):
                import torch

                sd = torch.load(wp, map_location="cpu")
                ported_cc = clipcap_mod.port_clipcap(sd, ccfg, g_cfg.n_layer)
                mapper = ported_cc["mapper"]
                gpt2_params_cc = ported_cc.get("gpt2")
            elif allow_missing_weights:
                if ccfg.mapping_type == "transformer":
                    # random init must match the params the transformer
                    # forward consumes (ClipCap._project builds this same
                    # ViecapConfig), not the MLP layout
                    from patchioner_tpu.models import viecap as viecap_mod

                    vcfg_cc = viecap_mod.ViecapConfig(
                        continuous_prompt_length=ccfg.prefix_length,
                        clip_project_length=ccfg.clip_length,
                        clip_hidden_size=cc_feature_dim,
                        num_layers=ccfg.num_layers,
                        num_heads=ccfg.num_heads,
                        mlp_ratio=ccfg.mlp_ratio,
                    )
                    mapper = viecap_mod.init_mapping_network(
                        k_cc, vcfg_cc, g_cfg.n_embd
                    )
                else:
                    mapper = clipcap_mod.init_mlp_mapper(
                        k_cc, cc_feature_dim, ccfg.prefix_length,
                        g_cfg.n_embd
                    )
            else:
                raise FileNotFoundError(f"ClipCap weights not found: {wp}")
            if gpt2_params_cc is None:
                if not allow_missing_weights:
                    raise FileNotFoundError(
                        "pretrained GPT-2 weights unavailable for ClipCap"
                    )
                gpt2_params_cc = gpt2_mod.init_gpt2(k_cc, g_cfg)
            tok = gpt2_tokenizer or _get_gpt2_tokenizer(allow_missing_weights)
            clipcap = clipcap_mod.ClipCap(
                ccfg, g_cfg,
                jax.tree_util.tree_map(jnp.asarray, gpt2_params_cc),
                jax.tree_util.tree_map(jnp.asarray, mapper),
                tok, prefix_size=cc_feature_dim,
            )

        return cls(
            vit_cfg=vit_cfg,
            vit_params=vit_params,
            backbone_type=backbone_type,
            skip_last_layers=skip_last_layers,
            diag_last_layers=diag_last_layers,
            skip_ln_post=skip_ln_post,
            gpt2_cfg=gpt2_cfg,
            decoder=decoder,
            bank=bank,
            bank_texts=bank_texts,
            normalize=bool(config.get("normalize", True)),
            calculate_argmax_text=calculate_argmax_text,
            embed_inversion=embed_inversion,
            inversion=inversion,
            config=config,
            viecap=viecap,
            clipcap=clipcap,
        )

    # ------------------------------------------------------------ device fns

    def encode_images(self, imgs) -> dict:
        """Backbone forward + attention extraction, one jitted program.

        Returns the DINOv2-style dict plus `self_attn` (B, P) and
        `self_attn_maps` (B, H, P) softmaxed per head (src/model.py:863-877).
        """
        pixels = _as_nhwc(imgs)
        if pixels.dtype == jnp.uint8:
            # uint8 input contract: resized/cropped but UN-normalized
            # (transforms.preprocess_pil_uint8); normalize on device with
            # the model's stats (config keys image_mean/image_std, default
            # the reference's ImageNet normalization, src/model.py:556-567)
            pixels = _normalize_uint8(pixels, self._image_mean,
                                      self._image_std)
        if self.backbone_type == "RegionCLIP":
            from patchioner_tpu.models import resnet_clip as rn_mod

            # attnpool cls + attnpool-projected local features; ResNets have
            # no extractable qkv self-attention (reference has_attention
            # False for RegionCLIP, src/model.py:863-866).
            return rn_mod.resnet_spatial_forward(
                self.vit_params, pixels, self.vit_cfg,
                use_attnpool_for_spatial_feats=self.config.get(
                    "regionclip_config", {}
                ).get("use_attnpool_for_spatial_feats", True),
            )
        if self.backbone_type == "ProxyCLIP":
            from patchioner_tpu.models import proxyclip as pc_mod

            # Patch tokens only; no CLS and no extractable self-attention
            # (reference: src/model.py:784-786, has_attention False).
            return pc_mod.proxyclip_forward(
                self.vit_params["clip"], self.vit_params["vfm"], pixels,
                self.vit_cfg,
            )
        if self.backbone_type == "DINO":
            outs = vit_mod.vit_forward(self.vit_params, pixels, self.vit_cfg)
        else:  # CLIP family (timm OpenAI / INViTE / AlphaCLIP)
            from patchioner_tpu.models import clip as clip_mod

            alpha = None
            if self.backbone_type == "AlphaClip":
                # whole-image forward uses an all-ones mask (src/model.py:800-814)
                alpha = jnp.ones(pixels.shape[:3] + (1,), pixels.dtype)
            outs = clip_mod.clip_visual_forward(
                self.vit_params, pixels, self.vit_cfg,
                skip_last_layers=self.skip_last_layers,
                diag_last_layers=self.diag_last_layers,
                alpha=alpha,
                skip_ln_post=self.skip_ln_post,
            )
            outs["x_norm_regtokens"] = jnp.zeros(
                (pixels.shape[0], 0, outs["x_norm_patchtokens"].shape[-1])
            )
        self_attn, maps = vit_mod.process_self_attention(
            outs["qkv_last"],
            num_heads=self.extract_heads,
            num_global_tokens=self.num_global_tokens,
            scale=self.extract_scale,
        )
        outs["self_attn"] = self_attn
        outs["self_attn_maps"] = jax.nn.softmax(maps, axis=-1)
        return outs

    def analyze_feature_compatibility(self, imgs, analyze_layers: bool = True):
        """RegionCLIP layer3-vs-layer4 feature diagnostic (src/model.py:1438-1528).

        Returns per-layer metrics: spatial resolution, bank-similarity stats
        for the CLS token and the patch mean, norms, and projection
        variability/efficiency. Reference quirk preserved: the reference
        calls forward_return_spatial_feats with its default
        use_attnpool_for_spatial_feats=True, so under the standard res5
        config both the 'layer3' and 'layer4' rows analyze the SAME layer4
        attnpool features — only the nominal patch size differs
        (src/model.py:1477 + clip_backbone.py:271-283).
        """
        if self.backbone_type != "RegionCLIP":
            print("Feature compatibility analysis only available for "
                  "RegionCLIP ResNet models")
            return {}
        from patchioner_tpu.models import resnet_clip as rn_mod

        pixels = _as_nhwc(imgs)
        if analyze_layers:
            layer_configs = [
                {"patch_size": 16, "use_layer3": True, "name": "layer3"},
                {"patch_size": 32, "use_layer3": False, "name": "layer4"},
            ]
        else:
            use_l3 = self.patch_size == 16
            layer_configs = [{
                "patch_size": self.patch_size, "use_layer3": use_l3,
                "name": "layer3" if use_l3 else "layer4",
            }]
        res5_out = self.config.get("regionclip_config", {}).get(
            "res5_out", True)
        results = {}
        for lc in layer_configs:
            outs = rn_mod.resnet_spatial_forward(
                self.vit_params, pixels, self.vit_cfg,
                use_layer3=lc["use_layer3"], res5_out=res5_out,
            )
            feats = outs["x_norm_patchtokens"]
            cls_feats = outs["x_norm_clstoken"]
            side = int(feats.shape[1] ** 0.5)
            layer_results = {
                "spatial_resolution": f"{side}x{side}",
                "embed_dim": int(feats.shape[-1]),
                "num_patches": int(feats.shape[1]),
            }
            if self.bank is not None and feats.shape[-1] == self.bank.rows.shape[-1]:
                patch_mean = jnp.mean(feats, axis=1)
                proj_patches = memproj.memory_project(
                    patch_mean, self.bank, normalize=True,
                    use_pallas=self._use_pallas)
                proj_cls = memproj.memory_project(
                    cls_feats, self.bank, normalize=True,
                    use_pallas=self._use_pallas)
                # sims vs the STORED (un-normalized) rows, as the reference
                # does with im_proj.embs_dataset (src/model.py:1495-1496)
                rows = self._bank_real_rows().astype(jnp.float32)
                cls_sims = proj_cls.astype(jnp.float32) @ rows.T
                patch_sims = proj_patches.astype(jnp.float32) @ rows.T
                layer_results.update({
                    "cls_max_similarity": float(jnp.mean(jnp.max(cls_sims, axis=1))),
                    "cls_mean_similarity": float(jnp.mean(cls_sims)),
                    "patch_max_similarity": float(jnp.mean(jnp.max(patch_sims, axis=1))),
                    "patch_mean_similarity": float(jnp.mean(patch_sims)),
                    "cls_feature_norm": float(jnp.mean(jnp.linalg.norm(cls_feats, axis=1))),
                    "patch_feature_norm": float(jnp.mean(jnp.linalg.norm(patch_mean, axis=1))),
                    "cls_projected_norm": float(jnp.mean(jnp.linalg.norm(proj_cls, axis=1))),
                    "patch_projected_norm": float(jnp.mean(jnp.linalg.norm(proj_patches, axis=1))),
                })
                # torch.std is Bessel-corrected — match it (src/model.py:1512-1513)
                feature_std = float(jnp.mean(jnp.std(
                    feats.reshape(-1, feats.shape[-1]), axis=0, ddof=1)))
                projection_std = float(jnp.mean(jnp.std(
                    proj_patches, axis=0, ddof=1)))
                layer_results.update({
                    "feature_variability": feature_std,
                    "projection_variability": projection_std,
                    "projection_efficiency": projection_std / (feature_std + 1e-8),
                })
            results[lc["name"]] = layer_results
        return results

    @staticmethod
    def print_compatibility_analysis(analysis_results) -> None:
        """Formatted report for analyze_feature_compatibility
        (src/model.py:1529-1576)."""
        print("\n" + "=" * 60)
        print("REGIONCLIP LAYER COMPATIBILITY ANALYSIS")
        print("=" * 60)
        for layer_name, m in analysis_results.items():
            print(f"\n{layer_name.upper()} FEATURES:")
            print("-" * 30)
            print(f"Spatial Resolution: {m['spatial_resolution']}")
            print(f"Embedding Dimension: {m['embed_dim']}")
            print(f"Number of Patches: {m['num_patches']}")
            if "cls_max_similarity" in m:
                print("\nSimilarity to Text Memory Bank:")
                print(f"  CLS Token - Max: {m['cls_max_similarity']:.4f}, "
                      f"Mean: {m['cls_mean_similarity']:.4f}")
                print(f"  Patch Avg - Max: {m['patch_max_similarity']:.4f}, "
                      f"Mean: {m['patch_mean_similarity']:.4f}")
                print("\nFeature Norms:")
                print(f"  CLS Features: {m['cls_feature_norm']:.4f}")
                print(f"  Patch Features: {m['patch_feature_norm']:.4f}")
                print(f"  CLS Projected: {m['cls_projected_norm']:.4f}")
                print(f"  Patch Projected: {m['patch_projected_norm']:.4f}")
                print("\nProjection Quality:")
                print(f"  Feature Variability: {m['feature_variability']:.4f}")
                print(f"  Projection Variability: {m['projection_variability']:.4f}")
                print(f"  Projection Efficiency: {m['projection_efficiency']:.4f}")
        l3, l4 = analysis_results.get("layer3", {}), analysis_results.get("layer4", {})
        if len(analysis_results) == 2 and "cls_max_similarity" in l3 \
                and "cls_max_similarity" in l4:
            print(f"\n{'COMPARISON (Layer3 vs Layer4)':^60}")
            print("-" * 60)
            s3, s4 = l3["patch_max_similarity"], l4["patch_max_similarity"]
            print(f"Better Text Similarity: {'Layer3' if s3 > s4 else 'Layer4'} "
                  f"({max(s3, s4):.4f} vs {min(s3, s4):.4f})")
            e3, e4 = l3["projection_efficiency"], l4["projection_efficiency"]
            print(f"Better Projection Efficiency: {'Layer3' if e3 > e4 else 'Layer4'} "
                  f"({max(e3, e4):.4f} vs {min(e3, e4):.4f})")
            print(f"Spatial Resolution: Layer3 ({l3['spatial_resolution']}) "
                  f"vs Layer4 ({l4['spatial_resolution']})")

    def _bank_real_rows(self) -> jnp.ndarray:
        """Un-padded f32 bank rows (dequantized when the bank is int8) —
        the reference's im_proj.embs_dataset as stored."""
        b = self.bank
        rows = b.rows[: b.num_real]
        if rows.dtype == jnp.int8:
            rows = rows.astype(jnp.float32) * b.scale[: b.num_real]
        return rows.astype(jnp.float32)

    def project_features(
        self, feats: jnp.ndarray, project: bool = True, normalize: Optional[bool] = None
    ) -> jnp.ndarray:
        """Memory projection (+ optional Talk2DINO inversion) -> prefix space.

        Reference quirk preserved: in embed-inversion mode the projection
        always runs, regardless of the `project` flag
        (src/model.py:1417-1421)."""
        norm = self.normalize if normalize is None else normalize
        if (project or self.embed_inversion) and self.bank is not None:
            feats = memproj.memory_project(
                feats, self.bank, normalize=norm, use_pallas=self._use_pallas
            )
        if self.embed_inversion:
            feats = t2d.revert_transformation(feats, self.inversion)
        return feats

    # -------------------------------------------------------- caption core

    def caption_tokens(
        self,
        feats,
        project: bool = True,
        return_n_best_sims: Optional[int] = None,
        compute_scores: bool = False,
    ):
        """(N, D) features -> N caption strings (reference
        src/model.py:1392-1423 semantics, including the argmax-text mode and
        the ViECap/MeaCap/ClipCap delegation)."""
        feats = jnp.asarray(feats)
        if self.viecap is not None:
            if return_n_best_sims:
                raise Exception("return_n_best_sims is not supported with viecap")
            return self.viecap.forward(feats, compute_scores=compute_scores)
        if self.clipcap is not None:
            if return_n_best_sims:
                raise Exception("return_n_best_sims is not supported with clipcap")
            return self.clipcap.forward(feats, compute_scores=compute_scores)
        if self.bank is None:
            project = False
            # Bank-dependent outputs are undefined without a support memory;
            # fail loudly up front instead of AttributeError-ing in
            # _bank_real_rows after captions were already decoded. (The
            # reference crashes too in this combination — its decoder path
            # never returns sims so the caller's tuple unpack at
            # src/model.py:1025,1034 fails — so there is no behavior to
            # match, only a clearer error to raise.)
            if return_n_best_sims is not None or self.calculate_argmax_text:
                raise ValueError(
                    "return_n_best_sims / calculate_argmax_text require a "
                    "support memory bank (support_memory_size > 0)"
                )
        if self.calculate_argmax_text:
            idx = np.asarray(memproj.memory_argmax(feats, self._bank_real_rows()))
            captions = [self.bank_texts[i] for i in idx]
            if return_n_best_sims:
                sims = np.asarray(
                    memproj.memory_topk_sims(
                        feats, self._bank_real_rows(), return_n_best_sims
                    )
                ).tolist()
                captions = (captions, sims)
            return captions if not compute_scores else (captions, [1.0] * len(idx))

        prefix = self.project_features(feats, project=project)
        tokens, scores = decap_mod.greedy_decode(
            self.decoder, prefix, self.gpt2_cfg, self.entry_length
        )
        tokens = np.asarray(tokens)
        capts = [self.tokenizer.decode_caption(row) for row in tokens]
        if return_n_best_sims is not None:
            sims = np.asarray(
                memproj.memory_topk_sims(
                    feats, self._bank_real_rows(), return_n_best_sims
                )
            ).tolist()
            out = (capts, sims)
        else:
            out = capts
        if compute_scores:
            return out, np.asarray(scores).tolist()
        return out

    # -------------------------------------------------------------- forward

    # ---------------------------------------- fused trace-caption fast path

    def supports_fused_trace_path(self) -> bool:
        """True when trace captioning can run as ONE jitted program —
        the DINO-backbone DeCap mainline (no ViECap/ClipCap delegation,
        no argmax-text; embed-inversion is included in the program)."""
        return (
            self.backbone_type == "DINO"
            and self.viecap is None
            and self.clipcap is None
            and not self.calculate_argmax_text
            and self.bank is not None
            and self.decoder is not None
        )

    def _make_fused_step(self, key, pool):
        """Build (and cache) a single-dispatch caption program:
        normalize(uint8) -> encoder -> `pool` -> memory projection ->
        [inversion] -> greedy decode, one jit.

        `forward(...)` runs the same math as ~6 separate jitted dispatches;
        per-dispatch latency is irrelevant locally but each costs an RPC on
        remote-device transports, and the final sync lands earlier.
        Semantics are identical (tests pin token equality per variant).

        `pool(outs, extract_attn, *args) -> (B', D)` reduces the encoder
        outputs to per-caption features; `extract_attn()` lazily computes
        the CLS->patch attention row (reference quirks included)."""
        # build under a lock: concurrent server workers racing the first
        # dispatch must not each pay a multi-minute flagship compile (or
        # clobber each other's lazily-created cache dict)
        with self._compile_lock:
            cached = getattr(self, "_fused_trace_cache", None)
            if cached is None:
                cached = self._fused_trace_cache = {}
            if key in cached:
                return cached[key]
            step = self._build_fused_step(key, pool)
            cached[key] = step
            return step

    def _build_fused_step(self, key, pool):

        vit_cfg, gcfg = self.vit_cfg, self.gpt2_cfg
        use_pallas = self._use_pallas
        normalize = self.normalize
        entry_length = self.entry_length
        embed_inv = self.embed_inversion
        ex_heads = self.extract_heads
        ex_ng = self.num_global_tokens
        ex_scale = self.extract_scale
        is_q = isinstance(self.bank, memproj.QuantizedBank)
        num_real = self.bank.num_real

        # real token count for masked (padded-qkv) attention extraction —
        # skips the (B, N, 3D) unpad copy on the fusedqkv path (PERF.md).
        # Computed from the ENCODER geometry (ex_ng is the extraction-time
        # global-token count, which may differ for exotic configs)
        n_real = vit_cfg.num_global_tokens + vit_cfg.grid_size**2

        def step(state, pixels, *args):
            # trace-time geometry check: the fused program bakes n_real and
            # the pooling grid from the CONFIG resolution, while
            # vit_forward itself adapts pos-embeds to the runtime grid — a
            # different input resolution would silently leak fusedqkv pad
            # keys into the extracted attention (or crash in trace_pool's
            # reshape). forward() derives its grid from the actual patch
            # count and handles any resolution; route there instead.
            if pixels.shape[1] != vit_cfg.img_size or (
                pixels.shape[2] != vit_cfg.img_size
            ):
                raise ValueError(
                    f"fused caption paths require the config resolution "
                    f"{vit_cfg.img_size}px, got "
                    f"{pixels.shape[1]}x{pixels.shape[2]} — use forward() "
                    f"for other resolutions"
                )
            if pixels.dtype == jnp.uint8:
                pixels = (pixels.astype(jnp.float32) / 255.0
                          - state["mean"]) / state["std"]
            outs = vit_mod.vit_forward(
                state["vit"], pixels, vit_cfg,
                keep_qkv_padded=True,
                # trace pooling absorbs the unpad slice into its weights
                # (trace_pool_padded); the bbox/cls/region pools reshape to
                # the exact grid and need the sliced tokens
                keep_tokens_padded=getattr(pool, "wants_padded_tokens",
                                           False),
            )

            def extract_attn():
                a, _ = vit_mod.process_self_attention(
                    outs["qkv_last"], num_heads=ex_heads,
                    num_global_tokens=ex_ng, scale=ex_scale,
                    num_real_k=n_real,
                )
                return a

            feats = pool(outs, extract_attn, *args)
            if is_q:
                bank = memproj.QuantizedBank(
                    state["bank_rows"], state["bank_scale"],
                    state["bank_inv"], num_real,
                )
            else:
                bank = memproj.PreparedBank(
                    state["bank_rows"], state["bank_inv"], num_real
                )
            prefix = memproj.memory_project(
                feats, bank, normalize=normalize, use_pallas=use_pallas
            )
            if embed_inv:
                prefix = t2d.revert_transformation(prefix, state["inversion"])
            tokens, _ = decap_mod.greedy_decode(
                state["decoder"], prefix, gcfg, entry_length
            )
            return tokens

        return jax.jit(step)

    def _fused_state(self):
        state = {
            "vit": self.vit_params,
            "decoder": self.decoder,
            "bank_rows": self.bank.rows,
            "bank_inv": self.bank.inv_norm,
            "mean": self._image_mean,
            "std": self._image_std,
        }
        if isinstance(self.bank, memproj.QuantizedBank):
            state["bank_scale"] = self.bank.scale
        if self.embed_inversion:
            state["inversion"] = self.inversion
        return state

    # ---------------------------------------------------- native snapshots

    def _snapshot_tree(self) -> dict:
        """All array state as plain dicts/lists of numpy arrays
        (msgpack-serializable; NamedTuples flattened to dicts)."""
        tree: dict = {"vit": self.vit_params}
        if self.decoder is not None:
            tree["decoder"] = dict(self.decoder._asdict())
        if self.bank is not None:
            tree["bank"] = {
                k: v for k, v in self.bank._asdict().items()
                if hasattr(v, "shape")
            }
        if self.inversion is not None:
            tree["inversion"] = dict(self.inversion)
        if self.viecap is not None:
            vc = self.viecap
            tree["viecap"] = {
                "gpt2": vc.gpt2_params,
                "mapping": vc.mapping_params,
                "entity_embeddings": vc.texts_embeddings,
            }
            if getattr(vc, "memory_clip_embeddings", None) is not None:
                tree["viecap"]["memory_clip_embeddings"] = (
                    vc.memory_clip_embeddings
                )
        if self.clipcap is not None:
            tree["clipcap"] = {
                "gpt2": self.clipcap.gpt2_params,
                "mapper": self.clipcap.mapper_params,
            }
        return jax.tree_util.tree_map(lambda a: np.asarray(a), tree)

    def save_pretrained(self, out_dir: str) -> None:
        """Snapshot the BUILT model to a self-contained directory:
        config.json (the from_config schema), state.msgpack (every param
        tree, bank included), meta.json (non-array state: bank class +
        size, text lists). `load_pretrained(out_dir)` restores without the
        original torch checkpoints / HDF5 banks — the reference has no
        native persistence; it re-ports torch state on every load
        (src/model.py:666-715). Quantized (int8) banks snapshot as-is."""
        from flax import serialization

        os.makedirs(out_dir, exist_ok=True)
        import json

        meta: dict = {"format_version": 1}
        if self.bank is not None:
            meta["bank_class"] = type(self.bank).__name__
            meta["bank_num_real"] = int(self.bank.num_real)
        if self.bank_texts is not None:
            meta["bank_texts"] = list(self.bank_texts)
        if self.viecap is not None and getattr(
            self.viecap, "memory_captions", None
        ) is not None:
            meta["meacap_memory_captions"] = list(
                self.viecap.memory_captions
            )
        with open(os.path.join(out_dir, "state.msgpack"), "wb") as f:
            f.write(serialization.msgpack_serialize(self._snapshot_tree()))
        with open(os.path.join(out_dir, "config.json"), "w") as f:
            json.dump(self.config, f, indent=1)
        with open(os.path.join(out_dir, "meta.json"), "w") as f:
            json.dump(meta, f)

    @classmethod
    def load_pretrained(cls, snap_dir: str, **from_config_kw) -> "Patchioner":
        """Restore a `save_pretrained` snapshot: rebuild the structure from
        the saved config (random init, tiny placeholder bank — nothing is
        ported), then swap in the saved arrays. Extra kwargs forward to
        `from_config` (e.g. dtype, concept_extractor)."""
        import json

        from flax import serialization

        with open(os.path.join(snap_dir, "config.json")) as f:
            config = json.load(f)
        with open(os.path.join(snap_dir, "meta.json")) as f:
            meta = json.load(f)
        with open(os.path.join(snap_dir, "state.msgpack"), "rb") as f:
            tree = serialization.msgpack_restore(f.read())
        from_config_kw.setdefault("allow_missing_weights", True)
        if "bank" in tree:
            # skip the full-size random placeholder bank — it is replaced
            from_config_kw.setdefault("random_bank_size", 2)
        m = cls.from_config(config, **from_config_kw)

        as_jnp = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
        m.vit_params = as_jnp(tree["vit"])
        if "decoder" in tree:
            m.decoder = decap_mod.DecapParams(**as_jnp(tree["decoder"]))
        if "bank" in tree:
            bank_cls = getattr(memproj, meta["bank_class"])
            m.bank = bank_cls(
                num_real=int(meta["bank_num_real"]), **as_jnp(tree["bank"])
            )
            m.bank_texts = meta.get("bank_texts")
        if "inversion" in tree:
            m.inversion = as_jnp(tree["inversion"])
            m.embed_inversion = True
        if "viecap" in tree and m.viecap is not None:
            vc = m.viecap
            vc.gpt2_params = as_jnp(tree["viecap"]["gpt2"])
            vc.mapping_params = as_jnp(tree["viecap"]["mapping"])
            vc.texts_embeddings = jnp.asarray(
                tree["viecap"]["entity_embeddings"]
            )
            if "memory_clip_embeddings" in tree["viecap"]:
                vc.memory_clip_embeddings = jnp.asarray(
                    tree["viecap"]["memory_clip_embeddings"]
                )
                if meta.get("meacap_memory_captions") is not None:
                    vc.memory_captions = list(
                        meta["meacap_memory_captions"]
                    )
        if "clipcap" in tree and m.clipcap is not None:
            m.clipcap.gpt2_params = as_jnp(tree["clipcap"]["gpt2"])
            m.clipcap.mapper_params = as_jnp(tree["clipcap"]["mapper"])
        # compiled-step caches key on bank geometry, but drop them anyway:
        # the snapshot may carry a different bank size than the rebuild
        m._fused_trace_cache = {}
        m._placed_state_cache = None
        return m

    # ------------------------------------------------- multi-chip serving

    # class attrs so older pickles / subclasses get the single-device
    # default without an __init__ change; the class-level locks are shared
    # fallbacks for instances restored without __init__
    _serve_mesh = None
    _placed_state_cache = None
    _placed_gen = 0
    _placed_lock = threading.Lock()
    _compile_lock = threading.RLock()

    # Assigning a new bank/decoder/vit_params (hot-swap) drops the placed
    # mesh state immediately: caching by id() risks address-reuse
    # collisions after GC, and caching strong refs would pin the old
    # ~GB-scale bank (host + replicated device copies) until the next
    # dispatch. The setter is the one place a swap can happen.
    def _component_property(name):  # noqa: N805 — class-body helper
        key = "_" + name

        def fget(self):
            return getattr(self, key)

        def fset(self, value):
            setattr(self, key, value)
            self._placed_state_cache = None
            # generation bump: an in-flight _placed_fused_state transfer
            # that snapshotted the OLD components must not publish its
            # result over this invalidation (lost-update race)
            self._placed_gen = self._placed_gen + 1

        return property(fget, fset)

    bank = _component_property("bank")
    decoder = _component_property("decoder")
    vit_params = _component_property("vit_params")
    del _component_property

    def place_on_mesh(self, mesh, dp_axis: str = "dp"):
        """Route the fused caption programs data-parallel over a device
        mesh (the v5e-8 deployment shape: PERF.md's scaling analysis —
        the caption step has NO cross-batch communication, so dp scaling
        is embarrassingly parallel and GSPMD splits the batch).

        Model state (params + bank, ~1.3 GB at flagship scale) is
        replicated onto the mesh ONCE and cached; every subsequent
        `caption_*_fused` call dp-shards its batch arrays over `dp_axis`
        and gathers only the (B, T) token ids. Batches that don't divide
        the dp size are padded with copies of row 0 and sliced after
        decode (same trick as CaptionServer bucket padding — results are
        padding-independent, pinned by tests/test_serve_mesh.py).

        Call with `mesh=None` to revert to single-device dispatch. The
        reference has no inference parallelism at all (SURVEY §2.6: DDP
        exists only for decoder training; eval is strictly single-GPU),
        so this is TPU-native upside, not a port.
        """
        if mesh is not None and dp_axis not in mesh.axis_names:
            raise ValueError(
                f"dp_axis={dp_axis!r} not in mesh axes {mesh.axis_names}"
            )
        # under the placement lock: replacing the lock itself (an earlier
        # version did) would let a worker inside the old lock's critical
        # section run concurrently with one holding the new lock
        with self._placed_lock:
            self._serve_mesh = (mesh, dp_axis) if mesh is not None else None
            self._placed_state_cache = None
            self._placed_gen = self._placed_gen + 1

    def _placed_fused_state(self):
        """Replicate the fused-step state over the serving mesh once;
        the bank/decoder/vit_params property setters (and place_on_mesh)
        drop the cache, so a hot-swap can neither serve stale state nor
        pin the swapped-out arrays. Locked: two server workers racing the
        first dispatch must not both pay the full-state transfer (minutes
        over a slow link for a ~GB flagship state)."""
        cached = self._placed_state_cache
        if cached is not None:
            return cached
        with self._placed_lock:
            cached = self._placed_state_cache
            if cached is not None:
                return cached
            gen = self._placed_gen
            sm = self._serve_mesh
            if sm is None:
                # a concurrent place_on_mesh(None) won the race — the
                # caller re-checks and dispatches single-device
                return None
            mesh, _ = sm
            state = jax.device_put(
                self._fused_state(),
                jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()),
            )
            if self._placed_gen == gen:
                # only publish if no hot-swap invalidated us mid-transfer;
                # the current batch still uses the snapshot it paid for
                self._placed_state_cache = state
            return state

    def _dispatch_fused(self, step, imgs, *args, rows_per_image: int = 1):
        """Run one fused caption program and return host token ids.

        Single-device: `step(state, imgs, *args)` directly. With a serving
        mesh (`place_on_mesh`): pad the batch up to a multiple of the dp
        size, device_put inputs with a batch-sharded NamedSharding (GSPMD
        partitions the whole program from the input shardings — the same
        placement `__graft_entry__.dryrun_multichip` validates at flagship
        geometry), and slice the padding rows back off.
        """
        # read the mesh tuple ONCE (a concurrent place_on_mesh between a
        # None-check and an unpack would otherwise TypeError this batch),
        # and re-check it AFTER fetching the placed state: a mesh swap in
        # between would shard the inputs on the old mesh against state
        # placed on the new one — incompatible-devices error. A swap always
        # replaces _serve_mesh and clears the placed cache, so an unchanged
        # tuple across the fetch means state and mesh agree.
        placed = None
        for _ in range(3):
            sm = self._serve_mesh
            if sm is None:
                break
            placed = self._placed_fused_state()
            if placed is None:  # mesh was torn down while we replicated
                sm = None
                break
            if self._serve_mesh is sm:
                break  # stable snapshot
            placed = None
        else:
            sm = None  # mesh kept moving; this batch runs single-device
        if sm is None:
            return np.asarray(step(self._fused_state(), imgs, *args))
        mesh, axis = sm
        ndp = mesh.shape[axis]
        b = int(imgs.shape[0])
        pad = (-b) % ndp
        if pad:
            def _pad(x):
                return jnp.concatenate(
                    [x, jnp.broadcast_to(x[:1], (pad,) + x.shape[1:])]
                )
            imgs = _pad(imgs)
            args = tuple(_pad(a) for a in args)
        sh = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(axis)
        )
        imgs = jax.device_put(imgs, sh)
        args = tuple(jax.device_put(a, sh) for a in args)
        tokens = np.asarray(step(placed, imgs, *args))
        return tokens[: b * rows_per_image]

    def _fused_trace_step(self, use_attention: bool):
        # key includes bank geometry/type so swapping the bank on a live
        # model (demo hot-swap) can't serve a stale closed-over num_real
        key = ("fused_trace", bool(use_attention), self.bank.num_real,
               type(self.bank).__name__, self.embed_inversion)
        g = self.vit_cfg.grid_size

        def pool(outs, extract_attn, pts, valid):
            grid = rp.traces_to_grid(pts, valid, g)
            attn = extract_attn() if use_attention else None
            # padded variant: on the fusedqkv TPU path the token axis stays
            # lane-padded (wants_padded_tokens below) and the zero-extended
            # pooling weights absorb the (B, N, D) unpad slice — measured
            # +3.1 ms/batch at flagship geometry, token-identical
            # (PERF.md round 5). Identical math when nothing is padded.
            return rp.trace_pool_padded(
                outs["x_norm_patchtokens"], grid, attn
            )

        # ask the encoder to skip the final unpad slice for this pool
        pool.wants_padded_tokens = True
        return self._make_fused_step(key, pool)

    def caption_traces_fused(self, imgs, pts, valid, *,
                             use_attention_tracing: bool = False):
        """Single-dispatch trace captioning (see `_make_fused_step`);
        `pts` (B, P, 2) in [0, 1] + `valid` (B, P) pre-padded arrays.
        Caller must check `supports_fused_trace_path()`."""
        step = self._fused_trace_step(use_attention_tracing)
        tokens = self._dispatch_fused(
            step, _as_nhwc(imgs), jnp.asarray(pts), jnp.asarray(valid)
        )
        return [self.tokenizer.decode_caption(row) for row in tokens]

    def _fused_bbox_step(self, gaussian_avg: bool,
                         gaussian_bbox_variance: float, use_attn_map: bool):
        """`forward(bboxes=...)`'s dense-captioning math (src/model.py:
        980-1047 semantics) as one program — per-box weighted patch means
        feed one (B*NB)-row projection+decode."""
        # normalize parameters the selected weight mode makes DEAD
        # (rp mode priority: attention > gaussian > uniform) — otherwise an
        # eval sweep over variance values with gaussian_avg=False pays a
        # fresh multi-minute flagship compile per value for identical HLO
        if use_attn_map:
            gaussian_avg, gaussian_bbox_variance = False, 0.0
        elif not gaussian_avg:
            gaussian_bbox_variance = 0.0
        key = ("fused_bbox", bool(gaussian_avg),
               float(gaussian_bbox_variance), bool(use_attn_map),
               self.bank.num_real, type(self.bank).__name__,
               self.embed_inversion)
        patch_size = self.patch_size

        def pool(outs, extract_attn, bboxes):
            feats = rp.extract_bbox_features(
                outs["x_norm_patchtokens"], bboxes,
                patch_size=patch_size,
                gaussian_avg=gaussian_avg,
                gaussian_bbox_variance=gaussian_bbox_variance,
                attention_map=extract_attn() if use_attn_map else None,
            )
            return feats.reshape(-1, feats.shape[-1])

        return self._make_fused_step(key, pool)

    def caption_bboxes_fused(self, imgs, bboxes, *,
                             gaussian_avg: bool = False,
                             gaussian_bbox_variance: float = 0.5,
                             use_attn_map_for_bboxes: bool = False):
        """Single-dispatch bbox captioning: `bboxes` (B, NB, 4) pixel
        ``[x1, y1, w, h]`` in the transformed image — the same convention
        `forward(bboxes=...)` and the pooling op consume
        (ops/region_pooling.extract_bbox_features; the reference dense
        eval converts its stored xyxy to this before the model call,
        eval_densecap.py:303-310) — pre-padded with dummy boxes to a
        fixed NB. Returns B lists of NB captions — identical strings to
        `forward(bboxes=...)["bbox_capts"]` (tests pin equality). Caller
        must check `supports_fused_trace_path()`."""
        bboxes = jnp.asarray(bboxes, jnp.float32)
        n_boxes = int(bboxes.shape[1])
        step = self._fused_bbox_step(
            bool(gaussian_avg), float(gaussian_bbox_variance),
            bool(use_attn_map_for_bboxes),
        )
        tokens = self._dispatch_fused(
            step, _as_nhwc(imgs), bboxes, rows_per_image=n_boxes
        )
        capts = [self.tokenizer.decode_caption(row) for row in tokens]
        return [capts[i * n_boxes : (i + 1) * n_boxes]
                for i in range(len(capts) // n_boxes)]

    def _fused_global_step(self, mode: str,
                           gaussian_img_variance: float = 1.0):
        """Whole-image captioning (`forward(get_cls_capt=True)` /
        `get_avg_self_attn_capt=True` / `get_avg_patch_capt=True`
        semantics, src/model.py:863-877,927,938-943) as one program."""
        # variance only shapes the 'patches' program — keying cls/
        # avg_self_attn on it would recompile byte-identical programs
        # (a multi-minute flagship compile) per distinct value passed
        var_key = float(gaussian_img_variance) if mode == "patches" else None
        key = ("fused_global", mode, var_key,
               self.bank.num_real, type(self.bank).__name__,
               self.embed_inversion)

        def pool(outs, extract_attn):
            if mode == "cls":
                return outs["x_norm_clstoken"]
            if mode == "patches":
                # whole-image gaussian/uniform patch mean (reference
                # compute_region_means, src/model.py:45-94)
                return rp.compute_region_means(
                    outs["x_norm_patchtokens"],
                    float(gaussian_img_variance),
                )
            # softmax CLS->patch attention row weights the patch tokens
            # (reference :869: mean over patches of attn-weighted tokens)
            attn = extract_attn()
            return jnp.mean(
                attn[..., None] * outs["x_norm_patchtokens"], axis=1
            )

        return self._make_fused_step(key, pool)

    def caption_images_fused(self, imgs, *, caption_from: str = "cls",
                             gaussian_img_variance: float = 1.0):
        """Single-dispatch whole-image captioning (`caption_from` 'cls',
        'avg_self_attn' or 'patches' — the latter uses
        `gaussian_img_variance` like `forward(get_avg_patch_capt=True)`)
        — identical strings to the matching `forward` output (tests pin
        equality). Caller must check `supports_fused_trace_path()`."""
        if caption_from not in ("cls", "avg_self_attn", "patches"):
            raise ValueError(f"caption_from={caption_from!r}")
        step = self._fused_global_step(caption_from, gaussian_img_variance)
        tokens = self._dispatch_fused(step, _as_nhwc(imgs))
        return [self.tokenizer.decode_caption(row) for row in tokens]

    def _fused_controllable_step(self, gaussian_avg: bool,
                                 gaussian_bbox_variance: float,
                                 use_attn_map: bool):
        """Region-set captioning (`forward(get_controllable_capts=True)`
        semantics, src/model.py:1042-1047: one merged weight map over all
        boxes -> ONE caption per image) as one program."""
        # same dead-parameter normalization as _fused_bbox_step
        if use_attn_map:
            gaussian_avg, gaussian_bbox_variance = False, 0.0
        elif not gaussian_avg:
            gaussian_bbox_variance = 0.0
        key = ("fused_controllable", bool(gaussian_avg),
               float(gaussian_bbox_variance), bool(use_attn_map),
               self.bank.num_real, type(self.bank).__name__,
               self.embed_inversion)
        patch_size = self.patch_size

        def pool(outs, extract_attn, bboxes):
            return rp.extract_bbox_features_single(
                outs["x_norm_patchtokens"], bboxes,
                patch_size=patch_size,
                gaussian_avg=gaussian_avg,
                gaussian_bbox_variance=gaussian_bbox_variance,
                attention_map=extract_attn() if use_attn_map else None,
            )

        return self._make_fused_step(key, pool)

    def caption_region_sets_fused(self, imgs, bboxes, *,
                                  gaussian_avg: bool = False,
                                  gaussian_bbox_variance: float = 0.5,
                                  use_attn_map_for_bboxes: bool = False):
        """Single-dispatch region-set (controllable) captioning: one merged
        caption per image for its box set — identical strings to
        `forward(get_controllable_capts=True)["set_controllable_capts"]`
        (tests pin equality). Caller must check
        `supports_fused_trace_path()`."""
        step = self._fused_controllable_step(
            bool(gaussian_avg), float(gaussian_bbox_variance),
            bool(use_attn_map_for_bboxes),
        )
        tokens = self._dispatch_fused(
            step, _as_nhwc(imgs), jnp.asarray(bboxes, jnp.float32)
        )
        return [self.tokenizer.decode_caption(row) for row in tokens]

    def forward(
        self,
        imgs,
        get_cls_capt: bool = True,
        get_avg_self_attn_capt: bool = False,
        get_attn_heads_capt: bool = False,
        get_patch_capts: bool = False,
        get_register_capts: bool = False,
        bboxes=None,
        traces=None,
        get_controllable_capts: bool = False,
        bs_factor: int = 4,
        gaussian_avg: bool = False,
        gaussian_bbox_variance: float = 0.5,
        get_avg_patch_capt: bool = False,
        gaussian_img_variance: float = 1,
        use_attn_map_for_bboxes: bool = False,
        use_attention_tracing: bool = False,
        double_DINO_for_bboxes: bool = False,
        double_DINO_for_bboxes_return_type: str = "avg",
        double_DINO_use_cls: bool = False,
        cleaning_type: Optional[str] = None,
        clean_after_projection: bool = True,
        alpha: float = 1.0,
        clean_from: str = "cls",
        caption_bboxes_type: Optional[str] = None,
        return_n_best_sims: Optional[int] = None,
        compute_scores: bool = False,
    ) -> dict:
        assert clean_from in ("cls", "avg_self_attn")
        assert cleaning_type in (None, "orthogonal_projection", "contrastive_mask")
        if double_DINO_for_bboxes and self.backbone_type != "DINO":
            raise ValueError(
                "double_DINO_for_bboxes requires a DINO backbone"
            )
        if caption_bboxes_type is not None:
            return self.caption_bboxes(
                imgs, bboxes, capt_type=caption_bboxes_type,
                compute_scores=compute_scores,
            )
        if self.backbone_type == "AlphaClip" and (
            bboxes is not None or traces is not None
        ):
            return self._forward_alphaclip_regions(
                imgs, bboxes, traces,
                get_controllable_capts=get_controllable_capts,
                compute_scores=compute_scores,
                return_n_best_sims=return_n_best_sims,
            )

        outs: dict[str, Any] = {}
        enc = self.encode_images(imgs)
        patch_tokens = enc["x_norm_patchtokens"]
        bs, n_patches, embed_dim = patch_tokens.shape
        # Reference :863-866 gates on the BACKBONE TYPE as well as the
        # extracted tensor: the CLIP family (timm CLIP / OpenCLIP / INViTE)
        # exposes self_attn in our encode_images, but the reference never
        # consumes attention on those towers — bbox/trace pooling stays
        # uniform and cleaning falls back to CLS there.
        has_attention = (
            "DINO" in self.backbone_type or self.backbone_type == "DenseClip"
        ) and "self_attn" in enc
        self_attn = enc.get("self_attn")
        nh = self.extract_heads

        need_avg_attn = get_avg_self_attn_capt or (
            cleaning_type is not None and clean_from == "avg_self_attn"
        )
        avg_self_attn_token = None
        disentangled = None
        if has_attention:
            # Computed lazily — the disentangled (B, H, N, D) product is 16x
            # the patch tensor and only needed for attn-heads captions.
            if need_avg_attn:
                avg_self_attn_token = jnp.mean(
                    self_attn[..., None] * patch_tokens, axis=1
                )  # (B, D) — reference :869
            if get_attn_heads_capt:
                maps = enc["self_attn_maps"]
                disentangled = jnp.mean(
                    patch_tokens[:, None, :, :] * maps[..., None], axis=2
                )  # (B, H, D) — reference :872-873
        elif get_avg_self_attn_capt or get_attn_heads_capt:
            raise ValueError(
                f"backbone {self.backbone_type} exposes no self-attention"
            )

        if cleaning_type is not None:
            # Cleaning path projects with normalize=True unconditionally
            # (src/model.py:899-905,908-915) — no inversion here.
            def proj_norm(x):
                if self.bank is None:
                    return x
                return memproj.memory_project(
                    x, self.bank, normalize=True, use_pallas=self._use_pallas
                )

            # clean_from='avg_self_attn' falls back to the CLS token when
            # the backbone has no extractable attention (reference :883-888)
            clean_src = (
                avg_self_attn_token
                if clean_from != "cls" and avg_self_attn_token is not None
                else enc["x_norm_clstoken"]
            )
            if clean_after_projection:
                proj_patch = proj_norm(patch_tokens.reshape(-1, embed_dim)).reshape(
                    bs, n_patches, -1
                )
                proj_src = proj_norm(clean_src)
                patch_tokens = rp.ctx_cleaner(
                    proj_patch, proj_src, cleaning_type, alpha
                )
            else:
                pt_n = patch_tokens / jnp.linalg.norm(
                    patch_tokens, axis=-1, keepdims=True
                )
                src_n = clean_src / jnp.linalg.norm(clean_src, axis=-1, keepdims=True)
                cleaned_tokens = rp.ctx_cleaner(pt_n, src_n, cleaning_type, alpha)
                patch_tokens = proj_norm(
                    cleaned_tokens.reshape(-1, cleaned_tokens.shape[-1])
                ).reshape(bs, n_patches, -1)
            embed_dim = patch_tokens.shape[-1]

        def emit(key_name, ret):
            if compute_scores:
                outs[key_name], outs[f"{key_name}_scores"] = ret
            else:
                outs[key_name] = ret

        if get_cls_capt:
            if "x_norm_clstoken" not in enc:
                raise ValueError(
                    f"backbone {self.backbone_type} emits patch tokens only"
                )
            emit("cls_capt", self.caption_tokens(
                enc["x_norm_clstoken"], compute_scores=compute_scores))
        if get_avg_self_attn_capt:
            emit("avg_self_attn_capt", self.caption_tokens(
                avg_self_attn_token, compute_scores=compute_scores))
        if get_avg_patch_capt:
            emit("avg_patch_capt", self.caption_tokens(
                rp.compute_region_means(patch_tokens, gaussian_img_variance),
                compute_scores=compute_scores))
        if get_attn_heads_capt:
            ret = self.caption_tokens(
                disentangled.reshape(-1, embed_dim), compute_scores=compute_scores
            )
            capts, scores = ret if compute_scores else (ret, None)
            outs["attn_heads_capts"] = [
                capts[i * nh : (i + 1) * nh] for i in range(bs)
            ]
            if compute_scores:
                outs["attn_heads_scores"] = [
                    scores[i * nh : (i + 1) * nh] for i in range(bs)
                ]
        if get_patch_capts:
            ret = self.caption_tokens(
                patch_tokens.reshape(-1, embed_dim),
                project=cleaning_type is None,
                compute_scores=compute_scores,
            )
            capts, scores = ret if compute_scores else (ret, None)
            outs["patch_tokens_capts"] = [
                capts[i * n_patches : (i + 1) * n_patches] for i in range(bs)
            ]
            if compute_scores:
                outs["patch_tokens_scores"] = [
                    scores[i * n_patches : (i + 1) * n_patches] for i in range(bs)
                ]
        if get_register_capts:
            regs = enc["x_norm_regtokens"]
            r = regs.shape[1]
            ret = self.caption_tokens(
                regs.reshape(-1, embed_dim), compute_scores=compute_scores
            )
            capts, scores = ret if compute_scores else (ret, None)
            outs["register_capts"] = [capts[i * r : (i + 1) * r] for i in range(bs)]
            if compute_scores:
                outs["register_scores"] = [
                    scores[i * r : (i + 1) * r] for i in range(bs)
                ]

        if bboxes is not None and not get_controllable_capts:
            bboxes = jnp.asarray(bboxes, jnp.float32)
            n_boxes = bboxes.shape[1]
            if double_DINO_for_bboxes:
                bbox_feats = self._double_dino_features(
                    enc,
                    bboxes,
                    return_type=double_DINO_for_bboxes_return_type,
                    use_cls=double_DINO_use_cls,
                    gaussian_bbox_variance=float(gaussian_bbox_variance),
                ).reshape(-1, embed_dim)
            else:
                attn_map = (
                self_attn if (use_attn_map_for_bboxes and has_attention) else None
            )
                bbox_feats = rp.extract_bbox_features(
                    patch_tokens,
                    bboxes,
                    patch_size=self.patch_size,
                    gaussian_avg=gaussian_avg,
                    gaussian_bbox_variance=float(gaussian_bbox_variance),
                    attention_map=attn_map,
                ).reshape(-1, embed_dim)
            ret = self.caption_tokens(
                bbox_feats,
                project=cleaning_type is None,
                return_n_best_sims=return_n_best_sims,
                compute_scores=compute_scores,
            )
            if compute_scores:
                body, scores = ret
            else:
                body, scores = ret, None
            if return_n_best_sims is not None:
                capts, sims = body
                outs["bbox_sims"] = [
                    sims[i * n_boxes : (i + 1) * n_boxes] for i in range(bs)
                ]
            else:
                capts = body
            outs["bbox_capts"] = [
                capts[i * n_boxes : (i + 1) * n_boxes] for i in range(bs)
            ]
            if compute_scores:
                outs["bbox_scores"] = [
                    scores[i * n_boxes : (i + 1) * n_boxes] for i in range(bs)
                ]
        elif bboxes is not None and get_controllable_capts:
            bboxes = jnp.asarray(bboxes, jnp.float32)
            attn_map = (
                self_attn if (use_attn_map_for_bboxes and has_attention) else None
            )
            merged = rp.extract_bbox_features_single(
                patch_tokens,
                bboxes,
                patch_size=self.patch_size,
                gaussian_avg=gaussian_avg,
                gaussian_bbox_variance=float(gaussian_bbox_variance),
                attention_map=attn_map,
            )
            outs["set_controllable_capts"] = self.caption_tokens(merged)

        if traces is not None:
            g = int(round(n_patches**0.5))
            if isinstance(traces, (list, tuple)):
                pts, valid = _traces_to_arrays(traces)
            else:
                pts, valid = traces  # pre-padded (B, P, 2) + (B, P)
            grid = rp.traces_to_grid(pts, valid, g)
            attn = (
                self_attn if (use_attention_tracing and has_attention) else None
            )
            trace_embeds = rp.trace_pool(patch_tokens, grid, attn)
            outs["trace_capts"] = self.caption_tokens(trace_embeds)

        return outs

    def _double_dino_features(
        self,
        enc: dict,
        bboxes: jnp.ndarray,
        *,
        return_type: str = "avg",
        use_cls: bool = False,
        gaussian_bbox_variance: float = 0.5,
    ) -> jnp.ndarray:
        """Double-DINO bbox features: re-run the LAST encoder block on only
        the region's tokens (reference src/bbox_utils.py:300-403), batched
        over every (image, box) pair via key-masked attention
        (models/vit.py:last_block_rerun).

        Reference quirks preserved: the re-run consumes the final *normalized*
        tokens (model.py:983-992 via transform_to_standard_dino_out of the
        last block's output); box grid indices are read as
        [x1, y1, x2, y2]//patch (NOT xywh — bbox_utils.py:352); and
        'gaussian_avg' weights the INPUT region patches, ignoring the re-run
        output (bbox_utils.py:380-393).
        """
        patches = enc["x_norm_patchtokens"]
        bs, n_patches, d = patches.shape
        g = int(round(n_patches**0.5))
        nb = bboxes.shape[1]
        ng = self.num_global_tokens

        gb = jnp.floor(bboxes / self.patch_size).astype(jnp.int32)
        x1, y1, x2, y2 = gb[..., 0], gb[..., 1], gb[..., 2], gb[..., 3]
        rows = jnp.arange(g)
        inside = (
            (rows[None, None, :, None] >= y1[..., None, None])
            & (rows[None, None, :, None] <= y2[..., None, None])
            & (rows[None, None, None, :] >= x1[..., None, None])
            & (rows[None, None, None, :] <= x2[..., None, None])
        )  # (B, NB, G, G)
        inside_flat = inside.reshape(bs, nb, n_patches)

        tokens = jnp.concatenate(
            [
                enc["x_norm_clstoken"][:, None],
                enc["x_norm_regtokens"],
                patches,
            ],
            axis=1,
        )  # (B, T, D)
        tokens = jnp.repeat(tokens, nb, axis=0)  # (B*NB, T, D)
        globals_mask = jnp.full((bs * nb, ng), bool(use_cls))
        key_mask = jnp.concatenate(
            [globals_mask, inside_flat.reshape(bs * nb, n_patches)], axis=1
        )
        out = vit_mod.last_block_rerun(
            self.vit_params, tokens, key_mask, self.vit_cfg
        )

        if return_type == "cls":
            feats = out[:, 0]
        elif return_type == "avg":
            w = inside_flat.reshape(bs * nb, n_patches, 1).astype(out.dtype)
            feats = jnp.sum(out[:, ng:] * w, axis=1) / jnp.maximum(
                jnp.sum(w, axis=1), 1.0
            )
        elif return_type == "gaussian_avg":
            # Grid-unit pseudo boxes [x1, y1, w, h] with inclusive-end spans
            # matching the reference slices; patch_size=1 (already grid units)
            pseudo = jnp.stack([x1, y1, x2 - x1, y2 - y1], axis=-1).astype(
                jnp.float32
            )
            w = rp.bbox_weight_maps(
                pseudo, g, 1, gaussian_avg=True,
                gaussian_bbox_variance=gaussian_bbox_variance,
            )  # (B, NB, G, G)
            feats = jnp.einsum(
                "bkyx,byxd->bkd", w, patches.reshape(bs, g, g, d)
            ).reshape(bs * nb, d)
        else:
            raise ValueError(f"unknown double-DINO return type: {return_type}")
        return feats.reshape(bs, nb, d)

    def _forward_alphaclip_regions(
        self,
        imgs,
        bboxes=None,
        traces=None,
        *,
        get_controllable_capts: bool = False,
        compute_scores: bool = False,
        return_n_best_sims: Optional[int] = None,
    ) -> dict:
        """AlphaCLIP region captioning (reference src/model.py:1060-1354).

        The reference loops one encoder forward PER (image, region) —
        quadratic wall time. Here all (image, region) pairs batch into one
        forward: the alpha mask is just another conv input. Dummy boxes
        (negative coordinate sum) yield "" captions / 0.0 scores / [] sims,
        matching the reference (:1193-1199).

        Mask resolutions match the reference exactly: the ENCODER mask is
        pixel-resolution (grid_size = crop_dim, patch_size = 1 —
        :1084-1086; trace points mark single pixels, NOT patch-sized
        blocks), while `use_cls_for_localized_captions: false` aggregates
        patch tokens weighted by a PATCH-grid mask (alpha_mask_patches at
        the effective grid, extract_alphaclip_features :1092-1125).
        """
        from patchioner_tpu.models import clip as clip_mod

        pixels = _as_nhwc(imgs)
        if pixels.dtype == jnp.uint8:
            # Same uint8 device-side normalization contract as
            # encode_images — the eval loaders ship un-normalized uint8
            # (transforms.preprocess_pil_uint8) for 4x less link traffic,
            # and this path bypasses encode_images entirely.
            pixels = _normalize_uint8(pixels, self._image_mean,
                                      self._image_std)
        bs = pixels.shape[0]
        hw = pixels.shape[1]
        grid = self.vit_cfg.grid_size
        use_cls = (self.config.get("alphaclip_config") or {}).get(
            "use_cls_for_localized_captions", True
        )
        outs: dict[str, Any] = {}

        def encode_with_masks(px, masks, patch_masks=None):
            out = clip_mod.clip_visual_forward(
                self.vit_params, px, self.vit_cfg, alpha=masks[..., None]
            )
            if use_cls or patch_masks is None:
                return out["x_norm_clstoken"]
            # masked-patch aggregation (reference :1103-1122): weight patch
            # tokens by the flattened patch-grid alpha, mean by mask sum
            pt = out["x_norm_patchtokens"]
            af = patch_masks.reshape(patch_masks.shape[0], -1)
            return (pt * af[..., None]).sum(axis=1) / (
                af.sum(axis=1, keepdims=True) + 1e-8
            )

        trace_arrays = None
        if traces is not None:
            # parse the Python point dicts ONCE; both resolutions (pixel
            # mask + patch mask) rasterize from the same arrays
            trace_arrays = (
                _traces_to_arrays(traces)
                if isinstance(traces, (list, tuple))
                else traces
            )

        def trace_masks(size):
            pts, valid = trace_arrays
            return (rp.traces_to_grid(pts, valid, size) > 0).astype(
                jnp.float32
            )

        if get_controllable_capts:
            # OR of all valid region masks per image -> one caption per image
            mask = jnp.zeros((bs, hw, hw), jnp.float32)
            pmask = jnp.zeros((bs, grid, grid), jnp.float32)
            if bboxes is not None:
                bb = jnp.asarray(bboxes, jnp.float32)
                bm = rp.boxes_to_pixel_masks(bb, hw)
                mask = jnp.maximum(mask, jnp.max(bm, axis=1))
                pmask = jnp.maximum(
                    pmask,
                    jnp.max(
                        rp.boxes_to_pixel_masks(bb / self.patch_size, grid),
                        axis=1,
                    ),
                )
            if traces is not None:
                mask = jnp.maximum(mask, trace_masks(hw))
                pmask = jnp.maximum(pmask, trace_masks(grid))
            feats = encode_with_masks(pixels, mask, pmask)
            ret = self.caption_tokens(feats, compute_scores=compute_scores)
            outs["set_controllable_capts"] = ret[0] if compute_scores else ret
            return outs

        if bboxes is not None:
            bboxes = jnp.asarray(bboxes, jnp.float32)
            n_boxes = bboxes.shape[1]
            masks = rp.boxes_to_pixel_masks(bboxes, hw)  # (B, NB, H, W)
            pmasks = rp.boxes_to_pixel_masks(bboxes / self.patch_size, grid)
            px = jnp.repeat(pixels, n_boxes, axis=0)
            feats = encode_with_masks(
                px, masks.reshape(-1, hw, hw), pmasks.reshape(-1, grid, grid)
            )
            ret = self.caption_tokens(
                feats,
                compute_scores=compute_scores,
                return_n_best_sims=return_n_best_sims,
            )
            if compute_scores:
                body, scores = ret
            else:
                body, scores = ret, None
            if return_n_best_sims is not None:
                capts, sims = body
            else:
                capts, sims = body, None
            dummy = np.asarray(jnp.sum(bboxes, axis=-1) < 0)  # (B, NB)
            outs["bbox_capts"] = []
            if compute_scores:
                outs["bbox_scores"] = []
            if sims is not None:
                outs["bbox_sims"] = []
            for i in range(bs):
                row = []
                srow, simrow = [], []
                for j in range(n_boxes):
                    flat = i * n_boxes + j
                    row.append("" if dummy[i, j] else capts[flat])
                    if compute_scores:
                        srow.append(0.0 if dummy[i, j] else scores[flat])
                    if sims is not None:
                        simrow.append([] if dummy[i, j] else sims[flat])
                outs["bbox_capts"].append(row)
                if compute_scores:
                    outs["bbox_scores"].append(srow)
                if sims is not None:
                    outs["bbox_sims"].append(simrow)

        if traces is not None:
            feats = encode_with_masks(
                pixels, trace_masks(hw), trace_masks(grid)
            )
            ret = self.caption_tokens(feats, compute_scores=compute_scores)
            if compute_scores:
                # reference emits trace_scores alongside (:1270-1282)
                outs["trace_capts"], outs["trace_scores"] = ret
            else:
                outs["trace_capts"] = ret
        return outs

    def caption_bboxes(
        self,
        imgs,
        bboxes,
        capt_type: str = "cls_capt",
        crop_boxes: bool = False,
        compute_scores: bool = False,
    ) -> dict:
        """Crop-then-caption baseline (reference src/model.py:1356-1390 +
        src/bbox_utils.py:406-421): PIL-crop every box, resize each crop to
        the model resolution (stretch — the `no_crop` transform), caption the
        crops with cls/avg-self-attn, and nest BS x N_BOXES.

        `imgs` must be a list of PIL images here (crops need raw pixels).
        """
        from PIL import Image  # noqa: F401  (PIL required for this path)

        from patchioner_tpu.utils import transforms as T

        bboxes = np.asarray(bboxes)
        bs, n_boxes = bboxes.shape[0], bboxes.shape[1]
        crops = []
        for img, img_boxes in zip(imgs, bboxes):
            for x1, y1, w, h in img_boxes.tolist():
                region = img.crop((x1, y1, x1 + w, y1 + h))
                crops.append(
                    # uint8: forward() normalizes on device (4x less
                    # host->device traffic than f32 crops)
                    T.preprocess_pil_uint8(
                        region, self.resize_dim, self.crop_dim, crop=crop_boxes
                    )
                )
        crops = np.stack(crops)
        capts, scores = [], []
        # Batch the crop forwards by the original batch size (:1370-1380).
        for i in range(0, len(crops), bs):
            outs = self.forward(
                crops[i : i + bs],
                get_cls_capt=capt_type == "cls_capt",
                get_avg_self_attn_capt=capt_type == "avg_self_attn_capt",
                compute_scores=compute_scores,
            )
            capts.extend(outs[capt_type])
            if compute_scores:
                scores.extend(outs[f"{capt_type}_scores"])
        ret = {
            "bbox_capts": [
                capts[i * n_boxes : (i + 1) * n_boxes] for i in range(bs)
            ]
        }
        if compute_scores:
            ret["bbox_scores"] = [
                scores[i * n_boxes : (i + 1) * n_boxes] for i in range(bs)
            ]
        return ret

    # -------------------------------------------- torch-API compat shims
    # The reference eval scripts call `model.eval()` / `model.to(device)`
    # (nn.Module API). No-ops here: params are immutable jax arrays and
    # placement is jit-managed — kept so ported scripts run unchanged.
    def eval(self):
        return self

    def to(self, device=None):
        return self

    __call__ = forward
