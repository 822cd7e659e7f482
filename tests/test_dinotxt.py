"""DINO.txt porter + text tower tests on synthetic dinotxt-layout state
dicts (the hub release itself needs network access; the layout under test is
the `visual_model.backbone.model` unwrap of src/model.py:345-346 plus the
OpenAI-CLIP text resblock naming)."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from patchioner_tpu.io import torch_port
from patchioner_tpu.models import clip as clip_mod
from patchioner_tpu.models import dinotxt, vit


def _synthetic_dinov2_sd(depth=2, d=16, patch=4, grid=3, reg=4, seed=0):
    g = torch.Generator().manual_seed(seed)

    def t(*shape):
        return torch.randn(*shape, generator=g) * 0.1

    sd = {
        "cls_token": t(1, 1, d),
        "pos_embed": t(1, 1 + grid * grid, d),
        "register_tokens": t(1, reg, d),
        "patch_embed.proj.weight": t(d, 3, patch, patch),
        "patch_embed.proj.bias": t(d),
        "norm.weight": t(d),
        "norm.bias": t(d),
    }
    for i in range(depth):
        p = f"blocks.{i}"
        sd.update(
            {
                f"{p}.norm1.weight": t(d),
                f"{p}.norm1.bias": t(d),
                f"{p}.attn.qkv.weight": t(3 * d, d),
                f"{p}.attn.qkv.bias": t(3 * d),
                f"{p}.attn.proj.weight": t(d, d),
                f"{p}.attn.proj.bias": t(d),
                f"{p}.ls1.gamma": t(d),
                f"{p}.norm2.weight": t(d),
                f"{p}.norm2.bias": t(d),
                f"{p}.mlp.fc1.weight": t(4 * d, d),
                f"{p}.mlp.fc1.bias": t(4 * d),
                f"{p}.mlp.fc2.weight": t(d, 4 * d),
                f"{p}.mlp.fc2.bias": t(d),
                f"{p}.ls2.gamma": t(d),
            }
        )
    return sd


def _synthetic_text_sd(depth=2, d=16, ctx=8, vocab=50, proj=12, seed=1):
    g = torch.Generator().manual_seed(seed)

    def t(*shape):
        return torch.randn(*shape, generator=g) * 0.1

    sd = {
        "text_model.token_embedding.weight": t(vocab, d),
        "text_model.positional_embedding": t(ctx, d),
        "text_model.ln_final.weight": 1 + 0.1 * t(d),
        "text_model.ln_final.bias": t(d),
        "text_model.text_projection": t(d, proj),
    }
    for i in range(depth):
        p = f"text_model.transformer.resblocks.{i}"
        sd.update(
            {
                f"{p}.ln_1.weight": 1 + 0.1 * t(d),
                f"{p}.ln_1.bias": t(d),
                f"{p}.attn.in_proj_weight": t(3 * d, d),
                f"{p}.attn.in_proj_bias": t(3 * d),
                f"{p}.attn.out_proj.weight": t(d, d),
                f"{p}.attn.out_proj.bias": t(d),
                f"{p}.ln_2.weight": 1 + 0.1 * t(d),
                f"{p}.ln_2.bias": t(d),
                f"{p}.mlp.c_fc.weight": t(4 * d, d),
                f"{p}.mlp.c_fc.bias": t(4 * d),
                f"{p}.mlp.c_proj.weight": t(d, 4 * d),
                f"{p}.mlp.c_proj.bias": t(d),
            }
        )
    return sd


def test_dinotxt_visual_port_unwraps_prefix():
    bare = _synthetic_dinov2_sd()
    wrapped = {"visual_model.backbone.model." + k: v for k, v in bare.items()}
    # dinotxt checkpoints also carry non-backbone keys the port must ignore
    wrapped["visual_model.head.weight"] = torch.zeros(4, 4)
    wrapped["text_model.token_embedding.weight"] = torch.zeros(5, 4)
    got = dinotxt.port_dinotxt_visual(wrapped, depth=2, num_registers=4)
    want = torch_port.port_dinov2(bare, depth=2, num_registers=4)
    flat_g, _ = jax.tree_util.tree_flatten(got)
    flat_w, _ = jax.tree_util.tree_flatten(want)
    assert len(flat_g) == len(flat_w)
    for a, b in zip(flat_g, flat_w):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the ported params actually run through the encoder
    cfg = vit.ViTConfig(img_size=12, patch_size=4, embed_dim=16, depth=2,
                        num_heads=2, num_registers=4, extract_heads=2,
                        pos_grid=3)
    out = vit.vit_forward(got, jnp.zeros((1, 12, 12, 3)), cfg)
    assert np.isfinite(np.asarray(out["x_norm_patchtokens"])).all()


def _torch_text_oracle(sd, tokens, heads, eot):
    """Literal CLIP text-tower semantics (causal attention, QuickGELU,
    EOT-argmax pooling) over the OpenAI-layout state dict."""
    x = sd["text_model.token_embedding.weight"][tokens]
    t = tokens.shape[1]
    x = x + sd["text_model.positional_embedding"][:t]
    mask = torch.triu(torch.full((t, t), float("-inf")), diagonal=1)
    d = x.shape[-1]
    hd = d // heads
    depth = max(
        int(k.split(".")[3]) + 1
        for k in sd
        if k.startswith("text_model.transformer.resblocks.")
    )
    for i in range(depth):
        p = f"text_model.transformer.resblocks.{i}"

        def ln(y, name):
            w, b = sd[f"{p}.{name}.weight"], sd[f"{p}.{name}.bias"]
            return torch.nn.functional.layer_norm(y, (d,), w, b, eps=1e-5)

        h = ln(x, "ln_1")
        qkv = h @ sd[f"{p}.attn.in_proj_weight"].T + sd[f"{p}.attn.in_proj_bias"]
        q, k, v = qkv.chunk(3, dim=-1)

        def heads_split(y):
            b_, t_, _ = y.shape
            return y.view(b_, t_, heads, hd).transpose(1, 2)

        q, k, v = heads_split(q), heads_split(k), heads_split(v)
        att = (q @ k.transpose(-2, -1)) * hd**-0.5 + mask
        att = att.softmax(-1)
        a = (att @ v).transpose(1, 2).reshape(x.shape)
        x = x + a @ sd[f"{p}.attn.out_proj.weight"].T + sd[f"{p}.attn.out_proj.bias"]
        h = ln(x, "ln_2")
        h = h @ sd[f"{p}.mlp.c_fc.weight"].T + sd[f"{p}.mlp.c_fc.bias"]
        h = h * torch.sigmoid(1.702 * h)  # QuickGELU
        x = x + h @ sd[f"{p}.mlp.c_proj.weight"].T + sd[f"{p}.mlp.c_proj.bias"]
    x = torch.nn.functional.layer_norm(
        x, (d,), sd["text_model.ln_final.weight"],
        sd["text_model.ln_final.bias"], eps=1e-5,
    )
    pooled = x[torch.arange(x.shape[0]), (tokens == eot).int().argmax(-1)]
    return pooled @ sd["text_model.text_projection"]


def test_dinotxt_text_port_forward_parity():
    sd = _synthetic_text_sd()
    cfg = clip_mod.ClipTextConfig(
        vocab_size=50, context_length=8, width=16, depth=2, heads=2,
        proj_dim=12, eot_token=49,
    )
    params = dinotxt.port_dinotxt_text(sd, depth=2)
    tokens = torch.tensor([[1, 5, 7, 49, 0, 0, 0, 0],
                           [1, 9, 12, 30, 2, 49, 0, 0]])
    with torch.no_grad():
        want = _torch_text_oracle(sd, tokens, heads=2, eot=49).numpy()
    got = np.asarray(dinotxt.encode_text(params, tokens.numpy(), cfg))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_dinotxt_full_port_and_optional_text():
    visual = {
        "visual_model.backbone.model." + k: v
        for k, v in _synthetic_dinov2_sd().items()
    }
    both = dict(visual)
    both.update(_synthetic_text_sd())
    out = dinotxt.port_dinotxt(both, visual_depth=2, num_registers=4,
                               text_depth=2)
    assert out["text"] is not None and len(out["text"]["blocks"]) == 2
    out2 = dinotxt.port_dinotxt(visual, visual_depth=2, num_registers=4)
    assert out2["text"] is None and "cls_token" in out2["visual"]


def test_dinotxt_tokenize():
    from patchioner_tpu.text.clip_bpe import EOT_TOKEN as eot
    from patchioner_tpu.text.clip_bpe import SOT_TOKEN as sot
    out = dinotxt.tokenize(["a dog", "a very long caption " * 20],
                           context_length=16)
    assert out.shape == (2, 16)
    assert out[0, 0] == sot and eot in out[0]
    # truncation forces eot at the cut (dinotxt_utils.py:38-40)
    assert out[1, -1] == eot
    # padding is zeros after eot
    e0 = list(out[0]).index(eot)
    assert (out[0, e0 + 1 :] == 0).all()


def test_dinotxt_text_encoder_surface():
    cfg = clip_mod.ClipTextConfig(
        vocab_size=49408, context_length=77, width=16, depth=1, heads=2,
        proj_dim=8,
    )
    params = dinotxt.init_dinotxt_text(jax.random.PRNGKey(0), cfg)
    enc = dinotxt.DinotxtTextEncoder(params, cfg)
    out = enc.encode_texts(["a dog", "a cat", "a house"], batch_size=2)
    assert out.shape == (3, 8) and np.isfinite(out).all()
