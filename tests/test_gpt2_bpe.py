"""GPT-2 byte-level BPE algorithm parity vs the `tokenizers` library.

The real 50,257-token vocab is absent in zero-egress images, so the oracle
is a ByteLevelBPETokenizer TRAINED on a synthetic corpus: identical
vocab/merges files driven through both implementations must produce
identical ids and round-trip text. This pins the algorithm (byte table,
GPT-2 pre-tokenization regex, lowest-rank merge loop, byte-join decode); the
real files drop into $GPT2_BPE_DIR with no code change."""

import json
import os

import pytest

from patchioner_tpu.text import gpt2_bpe

SAMPLES = [
    "Hello world!",
    "The quick brown fox jumps over 1234 lazy dogs.",
    "it's they're we'll I'd you've can't",
    "  leading spaces and   multiple   gaps ",
    "naïve café — emoji 🙂 and CJK 汉字 mix",
    "newline\nand\ttab",
    "ALLCAPS lowercase MiXeD 42x7",
    "",
    "a",
    "supercalifragilisticexpialidocious antidisestablishmentarianism",
]


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    from tokenizers import ByteLevelBPETokenizer

    corpus = [
        "the quick brown fox jumps over the lazy dog",
        "hello world it's a caption about dogs and cats",
        "they're running over 1234 fields with naïve café charm",
        "supercalifragilisticexpialidocious words can't stop",
        "a photo of a dog sitting on a wooden table 🙂 汉字",
        "newlines and tabs and ALLCAPS and MiXeD case",
    ] * 50
    oracle = ByteLevelBPETokenizer()
    oracle.train_from_iterator(corpus, vocab_size=600, min_frequency=1,
                               special_tokens=["<|endoftext|>"])
    d = tmp_path_factory.mktemp("gpt2bpe")
    oracle.save_model(str(d))
    ours = gpt2_bpe.Gpt2Tokenizer.from_files(
        os.path.join(d, "vocab.json"), os.path.join(d, "merges.txt")
    )
    return oracle, ours


def test_encode_parity(trained):
    oracle, ours = trained
    for s in SAMPLES:
        assert ours.encode(s) == oracle.encode(s).ids, s


def test_decode_roundtrip(trained):
    oracle, ours = trained
    for s in SAMPLES:
        ids = ours.encode(s)
        assert ours.decode(ids) == oracle.decode(ids), s


def test_eos_token(trained):
    _, ours = trained
    assert ours.eos_token_id == ours.encoder["<|endoftext|>"]


def test_loader_env_dir(trained, tmp_path, monkeypatch):
    oracle, ours = trained
    d = tmp_path / "vocabdir"
    d.mkdir()
    with open(d / "vocab.json", "w") as f:
        json.dump(ours.encoder, f)
    merges = sorted(ours._ranks.items(), key=lambda kv: kv[1])
    with open(d / "merges.txt", "w") as f:
        f.write("#version: 0.2\n")
        for (a, b), _ in merges:
            f.write(f"{a} {b}\n")
    monkeypatch.setenv("GPT2_BPE_DIR", str(d))
    tok = gpt2_bpe.load_gpt2_tokenizer()
    assert tok is not None
    for s in SAMPLES:
        assert tok.encode(s) == ours.encode(s)


def test_loader_returns_none_without_files(monkeypatch, tmp_path):
    monkeypatch.delenv("GPT2_BPE_DIR", raising=False)
    monkeypatch.setenv("HF_HOME", str(tmp_path))
    monkeypatch.setattr(os.path, "expanduser", lambda p: str(tmp_path))
    assert gpt2_bpe.load_gpt2_tokenizer() is None
