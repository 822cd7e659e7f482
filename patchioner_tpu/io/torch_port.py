"""Torch checkpoint → JAX param-tree porting.

The reference loads weights from torch.hub / HF Hub torch checkpoints
(src/model.py:343, src/decap/decap.py:188-222, src/talk2dino/talk2dino.py:68).
These functions map those state_dict layouts onto patchioner_tpu's plain
nested-dict params. All outputs are numpy (host) arrays; device placement and
sharding happen at model build.

Conventions: torch nn.Linear stores (out, in) — we store (in, out) so the
forward is `x @ w + b`. Conv patch-embeds are flattened to a single matmul
weight (TPU MXU-friendly) with matching patch-pixel ordering.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

__all__ = [
    "port_dinov2",
    "port_hf_dinov2",
    "port_hf_gpt2_lmhead",
    "port_decap",
    "port_talk2dino",
]


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _linear(sd: Mapping, prefix: str) -> dict:
    return {"w": _np(sd[f"{prefix}.weight"]).T, "b": _np(sd[f"{prefix}.bias"])}


def _ln(sd: Mapping, prefix: str) -> dict:
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _patch_conv_to_dense(w_conv: np.ndarray) -> np.ndarray:
    """(D, 3, P, P) conv kernel -> (P*P*3, D) dense weight matching the
    reshape order used in vit_forward (patch pixels row-major, channel last)."""
    d, c, p, _ = w_conv.shape
    # vit_forward flattens (P, P, 3) per patch; conv kernel is (D, 3, P, P).
    w = w_conv.transpose(2, 3, 1, 0).reshape(p * p * c, d)
    return np.ascontiguousarray(w)


# ------------------------------------------------------------------ DINOv2


def port_dinov2(sd: Mapping, depth: int, num_registers: int) -> dict:
    """Port a facebookresearch/dinov2 torch.hub state_dict
    (keys: cls_token, pos_embed, register_tokens, patch_embed.proj.*,
    blocks.N.{norm1,attn.qkv,attn.proj,ls1.gamma,norm2,ls2.gamma}, norm.*,
    plus per-block FFN keys: mlp.fc1/mlp.fc2 for the GELU towers (S/B/L)
    or mlp.w12/mlp.w3 for giant's fused SwiGLU)."""
    params = {
        "cls_token": _np(sd["cls_token"]),
        "pos_embed": _np(sd["pos_embed"]),
        "patch_embed": {
            "w": _patch_conv_to_dense(_np(sd["patch_embed.proj.weight"])),
            "b": _np(sd["patch_embed.proj.bias"]),
        },
        "norm": _ln(sd, "norm"),
        "blocks": [],
    }
    if num_registers:
        params["register_tokens"] = _np(sd["register_tokens"])
    for i in range(depth):
        p = f"blocks.{i}"
        blk = {
            "norm1": _ln(sd, f"{p}.norm1"),
            "qkv": _linear(sd, f"{p}.attn.qkv"),
            "proj": _linear(sd, f"{p}.attn.proj"),
            "norm2": _ln(sd, f"{p}.norm2"),
        }
        if f"{p}.mlp.w12.weight" in sd:
            # giant's SwiGLUFFNFused stores w12 (d -> 2h) and w3 (h -> d)
            blk["w12"] = _linear(sd, f"{p}.mlp.w12")
            blk["w3"] = _linear(sd, f"{p}.mlp.w3")
        else:
            blk["fc1"] = _linear(sd, f"{p}.mlp.fc1")
            blk["fc2"] = _linear(sd, f"{p}.mlp.fc2")
        if f"{p}.ls1.gamma" in sd:
            blk["ls1"] = _np(sd[f"{p}.ls1.gamma"])
            blk["ls2"] = _np(sd[f"{p}.ls2.gamma"])
        params["blocks"].append(blk)
    return params


def port_hf_dinov2(sd: Mapping, depth: int, num_registers: int) -> dict:
    """Port a transformers Dinov2Model / Dinov2WithRegistersModel state_dict
    (separate q/k/v linears — fused here into the qkv layout)."""
    emb = "embeddings"
    params = {
        "cls_token": _np(sd[f"{emb}.cls_token"]),
        "pos_embed": _np(sd[f"{emb}.position_embeddings"]),
        "patch_embed": {
            "w": _patch_conv_to_dense(
                _np(sd[f"{emb}.patch_embeddings.projection.weight"])
            ),
            "b": _np(sd[f"{emb}.patch_embeddings.projection.bias"]),
        },
        "norm": _ln(sd, "layernorm"),
        "blocks": [],
    }
    if num_registers:
        params["register_tokens"] = _np(sd[f"{emb}.register_tokens"])
    for i in range(depth):
        p = f"encoder.layer.{i}"
        qw = _np(sd[f"{p}.attention.attention.query.weight"])
        kw = _np(sd[f"{p}.attention.attention.key.weight"])
        vw = _np(sd[f"{p}.attention.attention.value.weight"])
        qb = _np(sd[f"{p}.attention.attention.query.bias"])
        kb = _np(sd[f"{p}.attention.attention.key.bias"])
        vb = _np(sd[f"{p}.attention.attention.value.bias"])
        blk = {
            "norm1": _ln(sd, f"{p}.norm1"),
            "qkv": {
                "w": np.concatenate([qw, kw, vw], axis=0).T,
                "b": np.concatenate([qb, kb, vb]),
            },
            "proj": _linear(sd, f"{p}.attention.output.dense"),
            "norm2": _ln(sd, f"{p}.norm2"),
            "ls1": _np(sd[f"{p}.layer_scale1.lambda1"]),
            "ls2": _np(sd[f"{p}.layer_scale2.lambda1"]),
        }
        if f"{p}.mlp.weights_in.weight" in sd:
            # use_swiglu_ffn=True (giant): Dinov2SwiGLUFFN weights_in/out
            blk["w12"] = _linear(sd, f"{p}.mlp.weights_in")
            blk["w3"] = _linear(sd, f"{p}.mlp.weights_out")
        else:
            blk["fc1"] = _linear(sd, f"{p}.mlp.fc1")
            blk["fc2"] = _linear(sd, f"{p}.mlp.fc2")
        params["blocks"].append(blk)
    return params


# ------------------------------------------------------------------- GPT-2


def port_hf_gpt2_lmhead(sd: Mapping, n_layer: int, prefix: str = "") -> dict:
    """Port a transformers GPT2LMHeadModel state_dict.

    GPT-2 Conv1D already stores (in, out) — no transpose. The LM head is tied
    to wte in HF; we keep a single `wte` and reuse it for logits.
    """

    def g(key):
        return _np(sd[prefix + key])

    params = {
        "wte": g("transformer.wte.weight"),
        "wpe": g("transformer.wpe.weight"),
        "ln_f": {
            "scale": g("transformer.ln_f.weight"),
            "bias": g("transformer.ln_f.bias"),
        },
        "blocks": [],
    }
    for i in range(n_layer):
        p = f"transformer.h.{i}"
        params["blocks"].append(
            {
                "ln_1": {"scale": g(f"{p}.ln_1.weight"), "bias": g(f"{p}.ln_1.bias")},
                "attn": {
                    "c_attn": {
                        "w": g(f"{p}.attn.c_attn.weight"),
                        "b": g(f"{p}.attn.c_attn.bias"),
                    },
                    "c_proj": {
                        "w": g(f"{p}.attn.c_proj.weight"),
                        "b": g(f"{p}.attn.c_proj.bias"),
                    },
                },
                "ln_2": {"scale": g(f"{p}.ln_2.weight"), "bias": g(f"{p}.ln_2.bias")},
                "mlp": {
                    "c_fc": {
                        "w": g(f"{p}.mlp.c_fc.weight"),
                        "b": g(f"{p}.mlp.c_fc.bias"),
                    },
                    "c_proj": {
                        "w": g(f"{p}.mlp.c_proj.weight"),
                        "b": g(f"{p}.mlp.c_proj.bias"),
                    },
                },
            }
        )
    return params


def port_decap(sd: Mapping, n_layer: int = 4) -> dict:
    """Port a DeCap checkpoint (decoder.* = GPT-2 LM head model,
    clip_project.model.0.* = the single-linear prefix mapper —
    reference: src/decap/decap.py:61-79)."""
    return {
        "gpt2": port_hf_gpt2_lmhead(sd, n_layer, prefix="decoder."),
        "clip_project": _linear(sd, "clip_project.model.0"),
    }


def port_talk2dino(sd: Mapping) -> dict:
    """Port Talk2DINO ProjectionLayer weights
    (reference: src/talk2dino/talk2dino.py:6-97; legacy `linear_layer2`
    alias for hidden layer 0 is honored)."""
    sd = dict(sd)
    if "linear_layer2.weight" in sd:
        sd["hidden_layers.0.weight"] = sd.pop("linear_layer2.weight")
        sd["hidden_layers.0.bias"] = sd.pop("linear_layer2.bias")
    params = {"linear": _linear(sd, "linear_layer"), "hidden": []}
    i = 0
    while f"hidden_layers.{i}.weight" in sd:
        params["hidden"].append(_linear(sd, f"hidden_layers.{i}"))
        i += 1
    return params
