"""Standalone CLIP BPE tokenizer tests (goldens verified against the
reference SimpleTokenizer, src/clip/simple_tokenizer.py)."""

from patchioner_tpu.text.clip_bpe import (
    EOT_TOKEN,
    SOT_TOKEN,
    VOCAB_SIZE,
    get_tokenizer,
)


def test_golden_encode():
    tok = get_tokenizer()
    assert tok.encode("A man riding a horse on the beach.") == [
        320, 786, 6765, 320, 4558, 525, 518, 2117, 269,
    ]


def test_roundtrip_and_cleanup():
    tok = get_tokenizer()
    ids = tok.encode("two dogs playing; it's 42 degrees!!")
    assert tok.decode(ids) == "two dogs playing ; it 's 4 2 degrees !! "
    # whitespace/html cleanup + lowercasing
    assert tok.encode("Weird   SPACING\tand &amp; entities") == tok.encode(
        "weird spacing and & entities"
    )


def test_multibyte_spans_tokens():
    tok = get_tokenizer()
    text = "emoji 🐕 and cjk 犬が走る mixed"
    assert tok.decode(tok.encode(text)).strip() == text


def test_caption_postprocessing():
    tok = get_tokenizer()
    ids = [SOT_TOKEN] + tok.encode("a cat sits") + [EOT_TOKEN] + tok.encode("junk")
    assert tok.decode_caption(ids) == "a cat sits "


def test_batch_tokenize_shape():
    tok = get_tokenizer()
    out = tok.tokenize(["hello world", "a longer caption about dogs"], 16)
    assert out.shape == (2, 16)
    assert out[0, 0] == SOT_TOKEN
    assert EOT_TOKEN in out[0]
    assert VOCAB_SIZE == 49408


def test_tokenize_parallel_matches_serial(monkeypatch):
    """The pooled corpus tokenizer is bitwise-identical to in-process
    tokenize (chunks partition the input in order), including multi-byte
    text and truncation. Under pytest the JAX backend is live, so the pool
    takes the spawn path (fork would be unsafe) — the spawn-startup
    break-even is lowered so the pool actually engages here."""
    from patchioner_tpu.text import clip_bpe

    monkeypatch.setattr(clip_bpe, "_SPAWN_MIN_TEXTS", 0)
    texts = (["a photo of a dog", "straße 街道 café", "x " * 200]
             * 70)  # > chunk so the pool path engages
    serial = clip_bpe.get_tokenizer().tokenize(texts, 77)
    pooled = clip_bpe.tokenize_parallel(texts, 77, workers=2, chunk=64)
    assert (serial == pooled).all()
    # small inputs take the in-process shortcut and still match
    small = clip_bpe.tokenize_parallel(texts[:3], 77, workers=2, chunk=64)
    assert (serial[:3] == small).all()


def test_tokenize_parallel_fork_unsafe_detection():
    """With a live JAX backend the pool must never fork (inherited device
    client threads can deadlock children)."""
    import jax.numpy as jnp

    from patchioner_tpu.text import clip_bpe

    jnp.zeros(1) + 1  # ensure a backend is initialized
    assert clip_bpe._fork_safe() is False
