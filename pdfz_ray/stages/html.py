"""HTML main-content extraction — boilerplate strip via DOM heuristics.

The north-star pipeline extracts main content from interleaved web
documents: strip chrome (nav/header/footer/aside/script/style), then keep
content blocks by text-density heuristics — the Readability / jusText /
trafilatura family of rules (public heuristics; see Kohlschütter et al.,
"Boilerplate Detection using Shallow Text Features", WSDM 2010). The
reference engine's per-document parse loop (extractor/src/engine/mod.rs:
58-135) maps to a stateless per-batch transform here; HTML parsing is
inherently per-document (a recursive grammar — no Arrow kernel exists),
so the batch function is a tight stdlib-``html.parser`` loop per row and
the SCALE lever is Ray Data's task parallelism over batches, exactly like
the extract stage.

Block model (the executable spec — the pure-Python reference
implementation in ``pdfz_ray.oracle.main_content_ref`` re-implements it
independently via a regex token stack, and the two are differentially
checked through the golden-fixture oracle):

- DROP_TAGS subtrees (script/style/nav/header/footer/aside/form/noscript/
  template/svg) are removed entirely, comments too;
- a BLOCK is a <p>, <h1>..<h6>, <li>, <td>, <blockquote> or <pre>
  element; each text node belongs to its NEAREST block ancestor (a nested
  block starts a new block — its text never leaks into the parent);
- block text is whitespace-normalized (runs of \\s+ collapse to one
  space, ends trimmed); anchor chars = normalized length of text inside
  <a> descendants, counted before trimming joins;
- keep a block iff normalized length >= MIN_BLOCK_CHARS and
  anchor_chars * 3 < total_chars (link density < 1/3 — link-list
  boilerplate is dense with anchors, prose is not);
- main_text = kept block texts joined with "\\n" in document order.
"""

from __future__ import annotations

import hashlib
import re
from html.parser import HTMLParser

import numpy as np
import pyarrow as pa

DROP_TAGS = frozenset(
    "script style nav header footer aside form noscript template svg".split()
)
BLOCK_TAGS = frozenset(
    "p h1 h2 h3 h4 h5 h6 li td blockquote pre".split()
)
# tags html.parser treats as void (never closed) — <br> acts as a space
VOID_SPACE_TAGS = frozenset("br hr img".split())
MIN_BLOCK_CHARS = 30
_WS = re.compile(r"\s+")


def _norm(s: str) -> str:
    return _WS.sub(" ", s).strip()


class _MainContent(HTMLParser):
    """Single-pass extractor: maintains a drop-depth, a block stack, and
    an anchor-depth; emits (text, anchor_chars) per finished block."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.drop = 0
        self.anchor = 0
        # stack of [text_parts, anchor_parts] for nested blocks
        self.blocks: list[tuple[list[str], list[str]]] = []
        self.out: list[tuple[str, str]] = []

    def handle_starttag(self, tag, attrs):
        if tag in DROP_TAGS:
            self.drop += 1
            return
        if self.drop:
            return
        if tag in VOID_SPACE_TAGS:
            self.handle_data(" ")
            return
        if tag == "a":
            self.anchor += 1
        if tag in BLOCK_TAGS:
            self.blocks.append(([], []))

    def handle_endtag(self, tag):
        if tag in DROP_TAGS:
            self.drop = max(0, self.drop - 1)
            return
        if self.drop:
            return
        if tag == "a":
            self.anchor = max(0, self.anchor - 1)
        if tag in BLOCK_TAGS and self.blocks:
            texts, anchors = self.blocks.pop()
            self.out.append(("".join(texts), "".join(anchors)))

    def handle_data(self, data):
        if self.drop or not self.blocks:
            return
        texts, anchors = self.blocks[-1]
        texts.append(data)
        if self.anchor:
            anchors.append(data)

    def close(self):
        super().close()
        # unclosed blocks at EOF still emit (lenient, like browsers)
        while self.blocks:
            texts, anchors = self.blocks.pop()
            self.out.append(("".join(texts), "".join(anchors)))


def extract_main_content(html: str) -> dict:
    """Run the block model over one document. Returns n_blocks (all blocks
    seen), n_kept, main_chars and main_text."""
    p = _MainContent()
    p.feed(html or "")
    p.close()
    kept: list[str] = []
    for raw_text, raw_anchor in p.out:
        text = _norm(raw_text)
        a_chars = len(_norm(raw_anchor))
        if len(text) >= MIN_BLOCK_CHARS and a_chars * 3 < len(text):
            kept.append(text)
    main_text = "\n".join(kept)
    return {
        "n_blocks": len(p.out),
        "n_kept": len(kept),
        "main_chars": len(main_text),
        "main_text": main_text,
    }


def main_content_batch(batch: pa.Table) -> pa.Table:
    """Per-batch map: (doc_id, html) → block/content stats plus the md5 of
    the extracted main text (the compact equality witness the golden
    oracle compares; the full text column is emitted too for downstream
    curation stages)."""
    htmls = batch.column("html").to_pylist()
    rows = [extract_main_content(h) for h in htmls]
    return pa.Table.from_arrays(
        [
            batch.column("doc_id"),
            pa.array([r["n_blocks"] for r in rows], pa.int64()),
            pa.array([r["n_kept"] for r in rows], pa.int64()),
            pa.array([r["main_chars"] for r in rows], pa.int64()),
            pa.array(
                [hashlib.md5(r["main_text"].encode()).hexdigest() for r in rows],
                pa.string(),
            ),
            pa.array([r["main_text"] for r in rows], pa.string()),
        ],
        names=["doc_id", "n_blocks", "n_kept", "main_chars", "main_md5", "main_text"],
    )


def make_html_corpus(docs: pa.Table, seed: int = 42) -> pa.Table:
    """Deterministic synthetic HTML pages over the driver documents table:
    each doc's text becomes main-content paragraphs wrapped in realistic
    chrome — a nav link bar, link-dense related-posts blocks (boilerplate
    that survives tag-stripping but fails the density rule), short teaser
    blocks (fail the length rule), and a footer. Seeded per doc_id, so
    pages are identical across runs and scale factors."""
    import html as _html

    ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()
    pages = []
    for i, (did, text) in enumerate(zip(ids, texts)):
        rng = np.random.default_rng(np.random.SeedSequence([seed, int(did)]))
        # escape HTML-special characters so doc text containing <, > or &
        # cannot produce malformed markup that the stdlib parser and the
        # regex-stack reference would disagree on
        toks = _html.escape(text or "").split()
        paras = [
            " ".join(toks[j : j + 40]) for j in range(0, max(len(toks), 1), 40)
        ]
        nav = "".join(
            f'<a href="/{w}">{w}</a> ' for w in ["home", "blog", "about", "contact"]
        )
        related = "".join(
            f'<li><a href="/p/{rng.integers(999)}">related post '
            f"{rng.integers(99)}</a> tag</li>"
            for _ in range(int(rng.integers(2, 5)))
        )
        teaser = f"<p>read more {rng.integers(99)}</p>"
        body = "".join(
            f"<p>{p} <b>{rng.integers(9)}</b></p>" for p in paras if p
        )
        pages.append(
            "<html><head><title>t</title><style>p{color:red}</style></head>"
            f"<body><header><nav>{nav}</nav></header>"
            f"<ul>{related}</ul>{teaser}"
            f"<div id=main>{body}</div>"
            "<footer><p>copyright forever and ever</p></footer></body></html>"
        )
    return pa.Table.from_arrays(
        [docs.column("doc_id"), pa.array(pages, pa.string())],
        names=["doc_id", "html"],
    )
