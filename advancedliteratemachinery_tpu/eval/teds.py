"""TEDS — Tree-Edit-Distance-based Similarity for table recognition.

Parity target: the IBM TEDS metric as vendored by CC-OCR
(reference Benchmarks/CC-OCR/evaluation/evaluator/doc_parsing_evaluator.py:
51 TableTree, :80 CustomConfig [rename cost = tag/span mismatch → 1, td
content → normalized edit distance], :101 TEDS [tokenize cells, similarity
= 1 - TED / max(n_nodes)], extract_and_clean_tables :25) and OmniParser's
table metrics (S-TEDS = structure_only).
"""

from __future__ import annotations

import re
from typing import List, Optional

from advancedliteratemachinery_tpu.eval.tree_edit import Node, tree_edit_distance, tree_size


def extract_and_clean_tables(text: str) -> str:
    """Pull <table>...</table> blocks out of an LMM response and flatten
    whitespace (doc_parsing_evaluator.py:25)."""
    tables = re.findall(r"<table.*?>.*?</table>", text, flags=re.DOTALL | re.IGNORECASE)
    clean = []
    for t in tables:
        t = re.sub(r">(.*?)<",
                   lambda m: ">" + m.group(1).replace("\n", "").replace(" ", "") + "<",
                   t, flags=re.DOTALL)
        clean.append(t.replace("\n", "").strip())
    return "".join(clean)


def _parse_html_table(html: str) -> Optional[Node]:
    """HTML → TableTree using lxml (tags kept: table/thead/tbody/tr/td/th;
    td carries colspan/rowspan + tokenized content)."""
    from lxml import html as lhtml

    try:
        root = lhtml.fromstring(html)
    except Exception:
        return None
    tables = root.xpath("//table")
    if not tables:
        return None
    table = tables[0]

    def convert(el) -> Node:
        tag = el.tag if isinstance(el.tag, str) else "unk"
        if tag == "th":
            tag = "td"
        node = Node(tag)
        if tag == "td":
            node.colspan = int(el.get("colspan", 1) or 1)
            node.rowspan = int(el.get("rowspan", 1) or 1)
            node.content = list(el.text_content() or "")
        else:
            node.children = [convert(c) for c in el
                             if isinstance(c.tag, str)]
        return node

    return convert(table)


class TEDS:
    def __init__(self, structure_only: bool = False):
        self.structure_only = structure_only

    def _rename(self, a: Node, b: Node) -> float:
        if a.label != b.label or a.colspan != b.colspan or a.rowspan != b.rowspan:
            return 1.0
        if a.label == "td" and not self.structure_only:
            ca = a.content or []
            cb = b.content or []
            if ca or cb:
                import Levenshtein

                return Levenshtein.distance("".join(ca), "".join(cb)) / max(
                    len(ca), len(cb))
        return 0.0

    def evaluate(self, pred_html: str, gt_html: str) -> float:
        """→ similarity in [0, 1] (doc_parsing_evaluator.py TEDS.evaluate)."""
        pred = _parse_html_table(pred_html)
        gt = _parse_html_table(gt_html)
        if gt is None:
            return 0.0
        if pred is None:
            return 0.0
        if self.structure_only:
            _strip_content(pred)
            _strip_content(gt)
        dist = tree_edit_distance(pred, gt, rename=self._rename)
        n = max(tree_size(pred), tree_size(gt))
        return 1.0 - dist / max(n, 1)


def _strip_content(node: Node) -> None:
    node.content = []
    for c in node.children:
        _strip_content(c)
