"""MeaCap concept extraction — faithful port of the reference's scene-graph
merge pipeline (host Python; no device work).

The reference distills the top-k retrieved memory captions into <=4 "key
concepts" through a deterministic merge machine over flan-T5 scene-graph
strings (src/meacap/utils/detect_utils.py:20-43 `retrieve_concepts`):

1. parse each caption to a scene-graph string ``( s , r , o ) , ( s , a )``
   (parse_tool.py:255-292 — the only model-bound stage; pluggable here),
2. build one graph per caption and merge them into a global graph with
   per-entity counts (parse_tool.py:345-430 `get_graph_dict`),
3. merge near-duplicate entities at cosine > 0.55 over SentenceBERT
   embeddings, accumulating counts into the kept representative and
   recording a removed->representative map; drop entities with merged
   count <= 2 (parse_tool.py:114-176 `merge_graph_dict`),
4. re-wire surviving relations through the representative map, rate nodes,
   order them by mean relative position of the entity string inside the
   memory captions, and attach an attribute when its merged count reaches
   the threshold (parse_tool.py:18-76 `filter_relation`),
5. return the first 4 ordered concepts (detect_utils.py:43).

Stages 2-5 are pure functions of (scene-graph strings, entity embeddings,
caption strings) and are ported exactly — including the reference's quirks,
each flagged with a ``quirk:`` comment and a file:line citation. The two
model-bound inputs (parser, sentence encoder) enter only through callables,
so the whole pipeline is executable and parity-testable offline with
stubbed graphs/embeddings (tests/test_meacap_concepts.py transcribes the
reference functions literally as the oracle).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "split_graph_segments",
    "build_graph_dict",
    "merge_graph_entities",
    "order_and_attach",
    "concepts_from_graphs",
    "retrieve_concepts",
]

# parse_tool.py:7 — digit objects of (s, is, digit) triples are spelled out.
_SPELLED_DIGITS = {
    "2": "two", "3": "three", "4": "four", "5": "five",
    "6": "six", "7": "seven", "8": "eight", "9": "nine",
}

_MERGE_THRESHOLD = 0.55  # parse_tool.py:120
_MIN_COUNT = 2           # parse_tool.py:159 (kept iff count > 2)
_ATTRIBUTE_THRESHOLD = 3  # parse_tool.py:18 default


def split_graph_segments(graphs) -> List[List[str]]:
    """One list of ``s , r , o`` / ``s , a`` segment strings per graph
    (parse_tool.py:226-252 `format_scene_graph` + `get_seg_list_seperate`):
    normalize token spacing, split on the ``) , (`` joints, strip the
    outer parens. Accepts a single graph string or a sequence of them
    (the reference's str/list branches, parse_tool.py:241-252; anything
    else is a ValueError there and here — iterating a bare string would
    silently shred it into per-character garbage)."""
    if isinstance(graphs, str):
        graphs = [graphs]
    elif not isinstance(graphs, (list, tuple)):
        raise ValueError(f"graphs must be str or list, got {type(graphs)}")
    out = []
    for g in graphs:
        spaced = g.replace("(", " ( ").replace(")", " ) ").replace(",", " , ")
        normal = " ".join(tok for tok in spaced.split() if tok)
        out.append(
            [
                seg.replace("(", "").replace(")", "").strip()
                for seg in normal.split(") , (")
            ]
        )
    return out


def _graph_add(graph: dict, subject: str, edge: list) -> None:
    """Insert subject with one optional edge (parse_tool.py:178-208
    `add_node_graph`): edge = [obj, rel] | [attr] | [].

    quirk (parse_tool.py:203): re-adding an attribute to an existing node
    RESETS its count to 1 instead of incrementing — within one caption's
    graph a repeated attribute still counts once.
    quirk (parse_tool.py:184): an existing node's count is never bumped —
    per-graph counts are always 1; cross-caption counting happens in the
    merge step.
    """
    node = graph.get(subject)
    if node is None:
        node = {"Relation": {}, "Attribute": {}, "count": 1}
        graph[subject] = node
        if len(edge) == 2:
            node["Relation"][edge[0]] = [edge[1]]
        elif len(edge) == 1:
            node["Attribute"][edge[0]] = 1
        elif edge:
            raise KeyError(f"{edge} is wrong")
        return
    if len(edge) == 2:
        if edge[0] not in node["Relation"]:
            node["Relation"][edge[0]] = [edge[1]]
        else:
            node["Relation"][edge[0]] += [edge[1]]  # in-place, as reference
    elif len(edge) == 1:
        node["Attribute"][edge[0]] = 1  # quirk: reset, not +=
    elif edge:
        raise KeyError(f"{edge} is wrong")


def _merge_into(global_graph: dict, graph: dict) -> None:
    """Fold one caption's graph into the global graph (parse_tool.py:210-222
    `merge_seperate_graph`).

    quirk (parse_tool.py:213): ``Relation.update`` OVERWRITES the relation
    list for an object seen in both graphs (the later caption wins) instead
    of concatenating; attributes, by contrast, are summed.
    """
    for key, node in graph.items():
        tgt = global_graph.get(key)
        if tgt is None:
            global_graph[key] = node
            continue
        tgt["Relation"].update(node["Relation"])
        tgt["count"] += node["count"]
        for attr, n in node["Attribute"].items():
            tgt["Attribute"][attr] = tgt["Attribute"].get(attr, 0) + n


def build_graph_dict(
    graphs: Sequence[str],
    type_dict: Optional[dict] = None,
    attribute_dict: Optional[dict] = None,
) -> Tuple[List[str], "OrderedDict[str, int]", dict]:
    """Per-caption graphs -> (entities sorted by count desc, count dict,
    merged global graph). Port of parse_tool.py:345-430 `get_graph_dict`
    (the `model` parameter there is unused and dropped here).

    Segment rules (parse_tool.py:355-411):
      * 1 field, and it is the graph's only segment -> bare object node;
      * 2 fields (s, a)                             -> attribute;
      * 3 fields (s, is, o)                         -> attribute o on s
        (digits spelled out via the NUMBER_DICT first);
      * 3 fields (s, r, o), r != 'is'               -> relation + both
        entities;
      * >3 fields                                   -> relation with the
        middle fields as one list-valued relation label; first and last
        fields become entities.
    quirk (parse_tool.py:358): a 1-field segment in a multi-segment graph
    is silently dropped.
    quirk (parse_tool.py:415): per-graph entity dedup goes through
    ``list(set(...))`` — tie order under the count sort is therefore
    hash-order dependent, exactly as in the reference.
    """
    if type_dict is None:
        type_dict = {}
    if attribute_dict is None:
        attribute_dict = {}
    counts: "OrderedDict[str, int]" = OrderedDict()
    global_graph: dict = {}
    for seg_list in split_graph_segments(graphs):
        entities: List[str] = []
        graph: dict = {}
        for seg in seg_list:
            fields = [f.strip() for f in seg.split(",")]
            if len(fields) == 1 and len(seg_list) == 1:
                entities.append(fields[0])
                type_dict[fields[0]] = "object"
                _graph_add(graph, fields[0], [])
            elif len(fields) == 2:
                subj, attr = fields
                type_dict[attr + " " + subj] = "attribute"
                entities.append(subj)
                type_dict[subj] = "object"
                attribute_dict.setdefault(subj, []).append(attr)
                _graph_add(graph, subj, [attr])
            elif len(fields) == 3:
                subj, rel, obj = fields
                obj = _SPELLED_DIGITS.get(obj, obj)
                if rel == "is":
                    type_dict[obj + " " + subj] = "attribute"
                    entities.append(subj)
                    type_dict[subj] = "object"
                    attribute_dict.setdefault(subj, []).append(obj)
                    _graph_add(graph, subj, [obj])
                else:
                    type_dict[subj + " " + rel + " " + obj] = "fact"
                    entities.append(subj)
                    type_dict[subj] = "object"
                    entities.append(obj)
                    type_dict[obj] = "object"
                    _graph_add(graph, subj, [obj, rel])
                    _graph_add(graph, obj, [])
            elif len(fields) > 3:
                # quirk (parse_tool.py:405): the fact key concatenates
                # subject + joined middle + object WITHOUT separators.
                type_dict[fields[0] + " ".join(fields[1:-1]) + fields[-1]] = "fact"
                entities.append(fields[0])
                type_dict[fields[0]] = "object"
                entities.append(fields[-1])
                type_dict[fields[-1]] = "object"
                _graph_add(graph, fields[0], [fields[-1], fields[1:-1]])
                _graph_add(graph, fields[-1], [])
        for ent in list(set(entities)):  # quirk: set order (see docstring)
            counts[ent] = counts.get(ent, 0) + 1
        _merge_into(global_graph, graph)
    ranked = OrderedDict(
        sorted(counts.items(), key=lambda kv: kv[1], reverse=True)
    )
    return list(ranked.keys()), ranked, global_graph


def _absorb_node(global_graph: dict, keep: str, gone: str) -> None:
    """Accumulate `gone`'s edges/counts into `keep` (parse_tool.py:9-16
    `merge_sim_node`). Relation.update overwrites shared objects; the
    reference calls this once per similar ORDERED pair, so a symmetric
    (a,b)/(b,a) hit merges both directions — reproduced by the caller."""
    a, b = global_graph[keep], global_graph[gone]
    a["Relation"].update(b["Relation"])
    a["count"] += b["count"]
    for attr, n in b["Attribute"].items():
        a["Attribute"][attr] = a["Attribute"].get(attr, 0) + n


def merge_graph_entities(
    embeddings: np.ndarray,
    entities: List[str],
    counts: "OrderedDict[str, int]",
    global_graph: dict,
) -> Tuple["OrderedDict[str, int]", dict, dict, Dict[str, str]]:
    """Cosine-merge near-duplicate entities and drop rare ones
    (parse_tool.py:114-163 `merge_graph_dict`, up to the ordering stage).

    `embeddings` is (len(entities), D), rows aligned with `entities`
    (the reference's ``model.encode(..., normalize_embeddings=True)``);
    normalized here again so callers may pass raw vectors.

    Scans ordered index pairs (x, y) with sim > 0.55, diagonal excluded,
    row-major (torch.where order):
      * the FIRST entity to appear as some x collects: counts[x] +=
        counts[y] (at y's CURRENT, possibly already-inflated value) and
        records y under x in `kept_to_absorbed`;
      * an x that was already absorbed by an earlier row instead records
        its neighbors in a side map used to pick its representative;
      * every pair additionally merges y's node into x's
        (quirk, parse_tool.py:144: ALSO for absorbed x's — node merging is
        unconditional and symmetric pairs merge both ways).
    Then entities appearing in any kept entity's absorbed list are removed,
    each mapped to its first still-alive neighbor (representative map;
    quirk, parse_tool.py:152-156: a removed entity whose neighbor list is
    missing/exhausted just prints "remove wrong!" and gets no mapping),
    and entities with merged count <= 2 are dropped.

    Returns (surviving counts desc-sorted, surviving subgraph,
    kept_to_absorbed, removed->representative map).
    """
    counts = OrderedDict(counts)
    n = len(entities)
    if n:
        e = np.asarray(embeddings, dtype=np.float32)
        e = e / np.maximum(np.linalg.norm(e, axis=-1, keepdims=True), 1e-12)
        sim = e @ e.T
        np.fill_diagonal(sim, 0.0)
        pairs = np.argwhere(sim > _MERGE_THRESHOLD)  # row-major, as torch.where
    else:
        pairs = np.zeros((0, 2), dtype=np.int64)

    kept_to_absorbed: Dict[str, List[str]] = {}
    absorbed_neighbors: Dict[str, List[str]] = {}
    absorbed_seen: List[str] = []
    for x, y in pairs:
        ex, ey = entities[int(x)], entities[int(y)]
        if ex in absorbed_seen:
            absorbed_neighbors.setdefault(ex, []).append(ey)
        else:
            kept_to_absorbed.setdefault(ex, []).append(ey)
            counts[ex] = counts[ex] + counts[ey]
        if ey not in kept_to_absorbed:
            absorbed_seen.append(ey)
        _absorb_node(global_graph, ex, ey)

    removed: List[str] = []
    for absorbed in kept_to_absorbed.values():
        removed += absorbed
    representative: Dict[str, str] = {}
    for gone in removed:
        try:
            representative[gone] = [
                w for w in absorbed_neighbors[gone] if w not in removed
            ][0]
        except (KeyError, IndexError):
            print("remove wrong!")  # parse_tool.py:156 (kept verbatim)

    surviving: "OrderedDict[str, int]" = OrderedDict()
    subgraph: dict = {}
    for ent, cnt in counts.items():
        if ent in removed or cnt <= _MIN_COUNT:
            continue
        surviving[ent] = cnt
        subgraph[ent] = global_graph[ent]
    surviving = OrderedDict(
        sorted(surviving.items(), key=lambda kv: kv[1], reverse=True)
    )
    return surviving, subgraph, kept_to_absorbed, representative


def order_and_attach(
    subgraph: dict,
    representative: Dict[str, str],
    sentences: Sequence[str],
    attribute_thresh: int = _ATTRIBUTE_THRESHOLD,
) -> Tuple["OrderedDict[str, dict]", List[str]]:
    """Re-wire relations through the representative map, order nodes by
    mean relative position in the memory captions, attach one attribute
    when its merged count reaches `attribute_thresh` (parse_tool.py:18-76
    `filter_relation`).

    quirk (parse_tool.py:24-26): an entity found at position 0 of a
    caption contributes NOTHING (the > 0 test excludes both "absent"
    find()== -1 and "at the start"); entities never found mid-caption get
    relative_pos 1 and sort last.
    """
    nodes = list(subgraph.keys())
    rated: Dict[str, dict] = {}
    for node in nodes:
        positions = []
        for s in sentences:
            p = s.find(node) / len(s)
            if p > 0:
                positions.append(p)
        entry = rated.setdefault(node, {"rating": 0})
        entry["relative_pos"] = float(np.mean(positions)) if positions else 1
        entry["Attribute"] = subgraph[node]["Attribute"]
        entry["count"] = subgraph[node]["count"]
        entry["Relation"] = {}
        for obj, rels in subgraph[node]["Relation"].items():
            if obj in nodes:
                tgt = obj
            elif obj in representative and representative[obj] in nodes:
                tgt = representative[obj]
            else:
                continue
            # quirk (parse_tool.py:37-51): first hit ALIASES the subgraph's
            # relation list; a second hit (direct + remapped onto the same
            # target) extends it IN PLACE, mutating the shared list.
            if tgt in entry["Relation"]:
                entry["Relation"][tgt] += rels
            else:
                entry["Relation"][tgt] = rels
            if tgt not in rated:
                rated[tgt] = {"rating": 1}
            else:
                rated[tgt]["rating"] += 1
            entry["rating"] += 2
    ordered = OrderedDict(
        sorted(rated.items(), key=lambda kv: kv[1]["relative_pos"])
    )
    concepts: List[str] = []
    for ent, info in ordered.items():
        for attr, cnt in info["Attribute"].items():
            if cnt >= attribute_thresh:
                concepts.append(attr + " " + ent)
                break
        else:
            concepts.append(ent)
    return ordered, concepts


def concepts_from_graphs(
    graphs: Sequence[str],
    encode_fn: Callable[[Sequence[str]], np.ndarray],
    sentences: Sequence[str],
    max_concepts: int = 4,
) -> List[str]:
    """Scene-graph strings -> ordered key concepts (stages 2-5; the
    composition in detect_utils.py:27-43). `encode_fn(texts) -> (N, D)` is
    the SentenceBERT stand-in; `sentences` are the retrieved memory
    captions used for relative-position ordering."""
    entities, counts, global_graph = build_graph_dict(graphs)
    if not entities:
        return []
    surviving, subgraph, _, representative = merge_graph_entities(
        np.asarray(encode_fn(entities)), entities, counts, global_graph
    )
    if not subgraph:  # parse_tool.py:163-168: no survivor -> no concepts
        return []
    _, concepts = order_and_attach(subgraph, representative, sentences)
    return concepts[:max_concepts]


def retrieve_concepts(
    captions: Sequence[str],
    parse_fn: Callable[[Sequence[str]], List[str]],
    encode_fn: Callable[[Sequence[str]], np.ndarray],
    max_concepts: int = 4,
) -> List[str]:
    """Full pipeline for one sample's retrieved memory captions
    (detect_utils.py:20-43): parse -> graph-merge -> concepts[:4].
    `parse_fn(captions) -> scene-graph strings` wraps the flan-T5 parser
    (parse_tool.py:255-292)."""
    return concepts_from_graphs(
        parse_fn(captions), encode_fn, captions, max_concepts
    )
