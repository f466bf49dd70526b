"""ProcTag: document-instruction data-efficacy assessment.

Behavioral parity target (reference DocumentUnderstanding/ProcTag):
- DocSpaceLayout.space_layout (space_layout.py:61): render OCR results as
  an ASCII "spatial layout" prompt — boxes on the same line merged in
  x-order, horizontal gaps rendered as proportional runs of spaces.
- DocumentProcessor (document_processor.py:11): generate_DocLayPrompt :22
  (layout-aware prompt), generate_proctags :59 (LLM tags the execution
  process of an instruction), cluster_and_tag_procedures :81 (embed tags,
  density cluster), complexity_first_diverse_sampling :130 (prefer samples
  with many distinct tag clusters, maximize coverage).

The LLM and the embedder are injected callables (`llm_fn(prompt) -> str`,
`embed_fn(texts) -> [N, D]`) — the reference hardcodes OpenAI GPT-3.5
(openai_integration.py:4), which has no place inside a TPU framework."""

from __future__ import annotations

import json
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np


def box4_to_box2(box4: Sequence[float]) -> List[float]:
    xs = box4[0::2]
    ys = box4[1::2]
    return [min(xs), min(ys), max(xs), max(ys)]


def is_same_line(b1: Sequence[float], b2: Sequence[float]) -> bool:
    """Mid-y of each box inside the other's y-range (space_layout.py:20)."""
    m1 = (b1[1] + b1[3]) / 2
    m2 = (b2[1] + b2[3]) / 2
    return b2[1] < m1 < b2[3] and b1[1] < m2 < b1[3]


def space_layout(texts: Sequence[str], boxes: Sequence[Sequence[float]],
                 char_width: float = 8.0) -> str:
    """OCR lines → ASCII layout prompt (space_layout.py:61)."""
    items = sorted(zip(texts, [box4_to_box2(b) if len(b) == 8 else list(b)
                               for b in boxes]),
                   key=lambda it: (it[1][1], it[1][0]))
    lines: List[List[Tuple[str, List[float]]]] = []
    for text, box in items:
        placed = False
        for line in lines:
            if is_same_line(box, line[0][1]):
                line.append((text, box))
                placed = True
                break
        if not placed:
            lines.append([(text, box)])
    lines.sort(key=lambda line: min(b[1] for _, b in line))

    out_lines = []
    for line in lines:
        line.sort(key=lambda it: it[1][0])
        buf = ""
        cursor = 0.0
        for text, box in line:
            gap = max(0, int((box[0] - cursor) / char_width))
            buf += " " * gap + text
            cursor = box[0] + len(text) * char_width
        out_lines.append(buf)
    return "\n".join(out_lines)


PROCTAG_PROMPT = """Given the document layout and a question, describe the \
step-by-step execution process required to answer it. Output a JSON list of \
short operation tags (e.g. ["locate field", "compare values", "sum numbers"]).

Document layout:
{layout}

Question: {question}
Tags:"""


def parse_tags(text: str) -> List[str]:
    """Robustly parse the LLM's tag list."""
    try:
        tags = json.loads(text[text.index("["):text.rindex("]") + 1])
        return [str(t).strip().lower() for t in tags if str(t).strip()]
    except (ValueError, json.JSONDecodeError):
        return [t.strip().lower() for t in text.replace("\n", ",").split(",")
                if t.strip()]


def threshold_cluster(embeddings: np.ndarray, threshold: float = 0.85
                      ) -> np.ndarray:
    """Greedy cosine-similarity clustering (density-style like the
    reference's DBSCAN use, document_processor.py:81). → cluster ids [N]."""
    emb = embeddings / (np.linalg.norm(embeddings, axis=-1, keepdims=True) + 1e-8)
    ids = -np.ones(len(emb), np.int64)
    centers: List[np.ndarray] = []
    for i, e in enumerate(emb):
        best, best_sim = -1, threshold
        for ci, c in enumerate(centers):
            sim = float(e @ c)
            if sim >= best_sim:
                best, best_sim = ci, sim
        if best < 0:
            centers.append(e.copy())
            ids[i] = len(centers) - 1
        else:
            ids[i] = best
            centers[best] = (centers[best] + e) / 2
    return ids


class ProcTagProcessor:
    def __init__(self, llm_fn: Callable[[str], str],
                 embed_fn: Callable[[Sequence[str]], np.ndarray],
                 cluster_threshold: float = 0.85):
        self.llm_fn = llm_fn
        self.embed_fn = embed_fn
        self.cluster_threshold = cluster_threshold

    def generate_doclay_prompt(self, texts, boxes, question: str) -> str:
        return PROCTAG_PROMPT.format(layout=space_layout(texts, boxes),
                                     question=question)

    def generate_proctags(self, texts, boxes, question: str) -> List[str]:
        return parse_tags(self.llm_fn(
            self.generate_doclay_prompt(texts, boxes, question)))

    def cluster_tags(self, all_tags: Sequence[List[str]]
                     ) -> Tuple[Dict[str, int], int]:
        """→ (tag → cluster id, num clusters)."""
        uniq = sorted({t for tags in all_tags for t in tags})
        if not uniq:
            return {}, 0
        ids = threshold_cluster(np.asarray(self.embed_fn(uniq)),
                                self.cluster_threshold)
        return dict(zip(uniq, ids.tolist())), int(ids.max()) + 1

    def complexity_first_diverse_sampling(self, all_tags: Sequence[List[str]],
                                          budget: int) -> List[int]:
        """Select sample indices: most distinct tag-clusters first, then
        greedy coverage of unseen clusters (document_processor.py:130)."""
        tag2cluster, _ = self.cluster_tags(all_tags)
        clusters = [set(tag2cluster[t] for t in tags) for tags in all_tags]
        order = sorted(range(len(all_tags)), key=lambda i: -len(clusters[i]))
        chosen: List[int] = []
        covered: set = set()
        for i in order:
            if len(chosen) >= budget:
                break
            if clusters[i] - covered or not covered:
                chosen.append(i)
                covered |= clusters[i]
        for i in order:  # fill remaining budget by complexity
            if len(chosen) >= budget:
                break
            if i not in chosen:
                chosen.append(i)
        return chosen
