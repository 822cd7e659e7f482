"""MeaCap — memory-augmented entity captioning (ViECap subclass family).

Reference: src/meacap/entrypoint.py. Identical decode path to ViECap
(mapping network soft prompt + hard prompt + GPT-2 greedy/beam), but the hard
prompt comes from *memory retrieval* instead of an entity vocabulary:
cosine similarity of the image feature against a caption memory
(models/clip_utils.py:129-143) selects the top `memory_caption_num` (5)
captions; a flan-T5 scene-graph parser + SentenceBERT merge distills them
into at most 4 key concepts (utils/detect_utils.py:20-43).

Host/device split: retrieval runs on-device (one matmul + top-k); concept
extraction is host-side behind the pluggable `concept_extractor` callable.
The merge machinery itself (scene-graph strings -> merged/ordered concepts)
is the model-free faithful port in `models/meacap_concepts.py`;
`hf_concept_extractor` wires the real flan-T5 parser + SentenceBERT in
front of it when those checkpoints are available locally,
`build_concept_extractor` accepts arbitrary parse/encode callables (tests
use stubs), and `frequency_concept_extractor` is a dependency-free
fallback (NOT parity, clearly marked) so the pipeline stays runnable
offline with zero extra models.
"""

from __future__ import annotations

import json
import re
from collections import Counter
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from patchioner_tpu.models import meacap_concepts
from patchioner_tpu.models import viecap as viecap_mod

__all__ = [
    "retrieve_memory_captions",
    "frequency_concept_extractor",
    "build_concept_extractor",
    "hf_concept_extractor",
    "MeaCap",
]

_STOPWORDS = frozenset(
    """a an the of in on at to with and or is are was were be been being it its
    this that these those there here his her their our your my some any each
    for from by as into over under above below between during before after""".split()
)


def retrieve_memory_captions(
    image_features: jax.Array,
    memory_clip_embeddings: jax.Array,
    k: int,
) -> np.ndarray:
    """Top-k memory caption indices by cosine similarity
    (entrypoint.py:151-163 + clip_utils.py:129-143 — the logit scale doesn't
    change the top-k order)."""
    f = image_features / jnp.linalg.norm(image_features, axis=-1, keepdims=True)
    m = memory_clip_embeddings / jnp.linalg.norm(
        memory_clip_embeddings, axis=-1, keepdims=True
    )
    sim = f @ m.T
    return np.asarray(jax.lax.top_k(sim, k)[1])


def frequency_concept_extractor(captions: Sequence[str], image_embeds=None,
                                max_concepts: int = 4) -> List[str]:
    """Offline fallback concept extractor: most frequent non-stopword tokens
    across the retrieved captions. NOT parity with the reference's
    flan-T5 scene-graph parse + SentenceBERT merge — use
    `hf_concept_extractor` with real checkpoints for that."""
    counts: Counter = Counter()
    order: dict = {}
    for cap in captions:
        for w in re.findall(r"[a-z]+", cap.lower()):
            if w in _STOPWORDS or len(w) < 3:
                continue
            counts[w] += 1
            order.setdefault(w, len(order))
    ranked = sorted(counts, key=lambda w: (-counts[w], order[w]))
    return ranked[:max_concepts]


def build_concept_extractor(
    parse_fn: Callable[[Sequence[str]], List[str]],
    encode_fn: Callable[[Sequence[str]], "np.ndarray"],
    max_concepts: int = 4,
) -> Callable:
    """Wrap the faithful merge pipeline (models/meacap_concepts.py — a port
    of src/meacap/utils/parse_tool.py:114-430 + detect_utils.py:20-43) as a
    per-sample concept_extractor. `parse_fn(captions)` returns one
    scene-graph string per caption; `encode_fn(texts)` returns (N, D)
    sentence embeddings. Model-free, so tests drive it with stubs."""

    def extract(captions: Sequence[str], image_embeds=None) -> List[str]:
        return meacap_concepts.retrieve_concepts(
            captions, parse_fn, encode_fn, max_concepts
        )

    return extract


def hf_concept_extractor(
    parser_checkpoint: str,
    wte_model_path: str,
    device: str = "cpu",
    max_concepts: int = 4,
) -> Callable:
    """The reference concept pipeline (flan-T5 scene-graph parser +
    SentenceBERT + the parse_tool merge machinery,
    src/meacap/utils/detect_utils.py:20-43) as a host callable. Requires
    local HF checkpoints; the merge logic itself is the checkpoint-free
    `models/meacap_concepts.py` port, which is what tests cover."""
    from transformers import AutoModelForSeq2SeqLM, AutoTokenizer

    tok = AutoTokenizer.from_pretrained(parser_checkpoint, local_files_only=True)
    # model follows the inputs onto `device` (the reference's
    # parser_model.to(device), src/meacap/viecap_inference.py:49) — without
    # this, generate() crashes on any non-CPU device
    parser = AutoModelForSeq2SeqLM.from_pretrained(
        parser_checkpoint, local_files_only=True
    ).eval().to(device)

    from sentence_transformers import SentenceTransformer  # optional dep

    wte = SentenceTransformer(wte_model_path, device=device)

    def parse_fn(captions: Sequence[str]) -> List[str]:
        # parse_tool.py:255-292: prompt prefix, batch generate, prefix strip,
        # paren/comma re-spacing via format_scene_graph.
        import torch

        prompts = ["Generate Scene Graph: " + c for c in captions]
        enc = tok(prompts, max_length=128, truncation=True, padding=True,
                  return_tensors="pt")
        with torch.no_grad():
            out = parser.generate(
                enc["input_ids"].to(device),
                attention_mask=enc["attention_mask"].to(device),
                use_cache=True,
                decoder_start_token_id=tok.pad_token_id,
                num_beams=1,
                max_length=128,
                early_stopping=True,
            )
        texts = tok.batch_decode(
            out, skip_special_tokens=True, clean_up_tokenization_spaces=True
        )
        return [
            " ".join(
                t.replace("Generate Scene Graph:", "").strip()
                .replace("(", " ( ").replace(")", " ) ").replace(",", " , ")
                .split()
            )
            for t in texts
        ]

    def encode_fn(texts: Sequence[str]) -> "np.ndarray":
        e = wte.encode(texts, convert_to_numpy=True)
        return e / np.linalg.norm(e, axis=-1, keepdims=True)

    return build_concept_extractor(parse_fn, encode_fn, max_concepts)


class MeaCap(viecap_mod.VieCap):
    """ViECap with memory-retrieved hard prompts (entrypoint.py:24-218)."""

    def __init__(
        self,
        cfg: viecap_mod.ViecapConfig,
        gpt2_cfg,
        gpt2_params: dict,
        mapping_params: dict,
        memory_captions: Sequence[str],
        memory_clip_embeddings,
        tokenizer,
        *,
        memory_caption_num: int = 5,
        concept_extractor: Optional[Callable] = None,
    ):
        super().__init__(
            cfg, gpt2_cfg, gpt2_params, mapping_params,
            entities=[], texts_embeddings=np.zeros((1, 1), np.float32),
            tokenizer=tokenizer,
        )
        self.memory_captions = list(memory_captions)
        self.memory_clip_embeddings = jnp.asarray(memory_clip_embeddings)
        self.memory_caption_num = memory_caption_num
        self.concept_extractor = concept_extractor or frequency_concept_extractor

    @staticmethod
    def build_memory(
        captions: Sequence[str],
        clip_encode_fn,
        out_dir: str,
        *,
        project_fn=None,
        wte_encode_fn=None,
        batch_size: int = 128,
    ):
        """Build the memory artifacts `load_memory` reads
        (reference: src/meacap/prepare_embeddings.py:60-133): batch-encode
        the caption corpus with the CLIP text tower (`clip_encode_fn(texts)
        -> (B, D)`), optionally project to DINO space (`project_fn`,
        the reference's --use_t2d), and write
        memory_captions.json + memory_clip_embeddings.pt (+
        memory_wte_embeddings.pt when a SentenceBERT-style `wte_encode_fn`
        is supplied — normalized, as the reference's
        `normalize_embeddings=True`)."""
        import os

        import torch

        captions = list(captions)
        clip_chunks, wte_chunks = [], []
        for lo in range(0, len(captions), batch_size):
            texts = captions[lo : lo + batch_size]
            emb = np.asarray(clip_encode_fn(texts), np.float32)
            if project_fn is not None:
                emb = np.asarray(project_fn(emb), np.float32)
            clip_chunks.append(emb)
            if wte_encode_fn is not None:
                w = np.asarray(wte_encode_fn(texts), np.float32)
                w = w / np.linalg.norm(w, axis=-1, keepdims=True)
                wte_chunks.append(w)
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "memory_captions.json"), "w") as f:
            json.dump(captions, f)
        clip_emb = np.concatenate(clip_chunks, axis=0)
        torch.save(
            torch.from_numpy(clip_emb),
            os.path.join(out_dir, "memory_clip_embeddings.pt"),
        )
        if wte_chunks:
            torch.save(
                torch.from_numpy(np.concatenate(wte_chunks, axis=0)),
                os.path.join(out_dir, "memory_wte_embeddings.pt"),
            )
        return clip_emb

    @classmethod
    def load_memory(cls, memory_base_path: str, memory_id: str):
        """Load the reference memory bank artifacts
        (memory/{id}/memory_captions.json + memory_clip_embeddings.pt)."""
        import os

        import torch

        base = f"{memory_base_path}/memory/{memory_id}"
        with open(os.path.join(base, "memory_captions.json")) as f:
            captions = json.load(f)
        clip_emb = torch.load(
            os.path.join(base, "memory_clip_embeddings.pt"), map_location="cpu"
        ).float().numpy()
        return captions, clip_emb

    def _hard_prompt_token_rows(self, f):
        """MeaCap's hard prompt: retrieve memory captions, extract concepts
        per sample, compose the discrete prompt (entrypoint.py:120-180).
        Prompt assembly / search / scoring are inherited from VieCap."""
        idx = retrieve_memory_captions(
            f, self.memory_clip_embeddings, self.memory_caption_num
        )
        token_rows = []
        for i in range(idx.shape[0]):
            caps = [self.memory_captions[j] for j in idx[i]]
            # per-sample call gets THIS sample's embedding (an extractor
            # that ranks concepts by image similarity would otherwise
            # see the whole batch for every row)
            concepts = self.concept_extractor(caps, image_embeds=f[i])
            token_rows.append(
                self.tokenizer.encode(
                    viecap_mod.compose_discrete_prompt(concepts)
                )
            )
        return token_rows
