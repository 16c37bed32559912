"""Deterministic synthetic corpus generator (seed-stable, FIXTURES.md §5).

Generates the interleaved-documents table at any size with every fixture
family represented. Fully deterministic: row ``i`` of an ``n_docs`` corpus
with seed ``s`` is identical across processes and across ``n_docs`` (per-doc
RNG keyed on ``(s, i)``), so tests, the DuckDB oracle, and the bench all see
byte-identical input without shipping data around.

Duplicate-doc_id rows (family "duplicate") repeat the *same* span payload so
first-wins dedup (reference api/src/server.ts:90-103) is observable as a
row-count change while remaining SQL-checkable without relying on file row
order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .schema import DOCUMENTS_SCHEMA, MEDIA_SCHEMA

_VOCAB = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt ut labore et dolore magna aliqua enim minim veniam "
    "quis nostrud exercitation ullamco laboris nisi aliquip ex ea commodo"
).split()

_UNICODE_SNIPPETS = [
    "héllo wörld",
    "naïve café\nnew line",
    "日本語のテキスト",
    "пример текста",
    "emoji ✨ and\ttab",
    "  leading and trailing  ",
]

FAMILIES = [
    "text-only",
    "multi-text-per-page",
    "media-only",
    "interleaved",
    "empty-page",
    "decode-failure",
    "windowed",
    "corrupt",
    "duplicate",
    "monster",
    "unicode",
]


def _doc_rng(seed: int, i: int) -> np.random.Generator:
    return np.random.default_rng(np.random.SeedSequence([seed, i]))


def _words(rng: np.random.Generator, n: int) -> str:
    return " ".join(_VOCAB[j] for j in rng.integers(0, len(_VOCAB), size=n))


def make_document(i: int, seed: int = 42, monster_spans: int = 1000) -> dict:
    """Build one synthetic document (family = ``FAMILIES[i % 11]``).

    Returns ``{"doc_id": str, "spans": list[dict]}``.
    """
    rng = _doc_rng(seed, i)
    family = FAMILIES[i % len(FAMILIES)]
    doc_id = f"doc-{i:06d}"
    spans: list[dict] = []

    def text_span(page: int, txt: str) -> dict:
        return {"kind": "text", "text": txt, "media_ref": "", "offset": page}

    def media_span(page: int, j: int, bad: bool = False) -> dict:
        payload = f"!bad-{i}-{page}-{j}" if bad else f"img-{i}-{page}-{j}"
        return {
            "kind": "media",
            "text": payload,
            "media_ref": f"in-{i}-{page}-{j}",
            "offset": page,
        }

    if family == "text-only":
        for p in range(1, int(rng.integers(1, 6)) + 1):
            spans.append(text_span(p, _words(rng, int(rng.integers(3, 12)))))
    elif family == "multi-text-per-page":
        n_pages = int(rng.integers(1, 4))
        for p in range(1, n_pages + 1):
            for _ in range(int(rng.integers(2, 5))):
                spans.append(text_span(p, _words(rng, int(rng.integers(2, 6)))))
    elif family == "media-only":
        for p in range(1, int(rng.integers(1, 4)) + 1):
            for j in range(int(rng.integers(1, 4))):
                spans.append(media_span(p, j))
    elif family == "interleaved":
        for p in range(1, int(rng.integers(2, 5)) + 1):
            n_text = int(rng.integers(1, 3))
            n_media = int(rng.integers(1, 3))
            parts = [text_span(p, _words(rng, 4)) for _ in range(n_text)] + [
                media_span(p, j) for j in range(n_media)
            ]
            order = rng.permutation(len(parts))
            # intra-page array order is arbitrary interleaving; media index
            # order must still be preserved, so permute text positions only
            # relative to media while keeping media order stable.
            media_parts = [q for q in parts if q["kind"] == "media"]
            text_parts = [q for q in parts if q["kind"] == "text"]
            merged: list[dict] = []
            ti = mi = 0
            for o in order:
                if (o % 2 == 0 and ti < len(text_parts)) or mi >= len(media_parts):
                    merged.append(text_parts[ti])
                    ti += 1
                else:
                    merged.append(media_parts[mi])
                    mi += 1
            spans.extend(merged)
    elif family == "empty-page":
        # gap in offsets: pages {1, 3, 7} present, others absent
        spans.append(text_span(1, _words(rng, 5)))
        spans.append(text_span(3, _words(rng, 5)))
        spans.append(media_span(7, 0))
    elif family == "decode-failure":
        spans.append(text_span(1, _words(rng, 4)))
        spans.append(media_span(1, 0))
        spans.append(media_span(1, 1, bad=True))  # consumes index 1, emits nothing
        spans.append(media_span(1, 2))
        spans.append(media_span(2, 0, bad=True))
    elif family == "windowed":
        # enough pages for start_page/page_count windows to bite
        for p in range(1, 9):
            spans.append(text_span(p, f"page-{p} " + _words(rng, 3)))
    elif family == "corrupt":
        doc_id = f"{doc_id}-corrupt"
        spans.append(text_span(1, _words(rng, 4)))  # content never extracted
    elif family == "duplicate":
        spans.append(text_span(1, _words(rng, 6)))
        spans.append(media_span(1, 0))
    elif family == "monster":
        n = monster_spans
        for k in range(n):
            p = k // 8 + 1
            if k % 8 == 7:
                spans.append(media_span(p, k % 8 // 8))
            else:
                spans.append(text_span(p, _words(rng, 3)))
    elif family == "unicode":
        for p in range(1, 4):
            snippet = _UNICODE_SNIPPETS[int(rng.integers(0, len(_UNICODE_SNIPPETS)))]
            spans.append(text_span(p, snippet))
            spans.append(text_span(p, _words(rng, 2)))
    return {"doc_id": doc_id, "spans": spans}


def make_documents(
    n_docs: int, seed: int = 42, monster_spans: int = 1000
) -> pa.Table:
    """Synthetic interleaved-documents table with duplicate rows appended.

    Every 11th doc (family "duplicate") is emitted twice with identical
    spans, so the table has ``n_docs + n_docs//11 (±1)`` rows.
    """
    rows = [make_document(i, seed, monster_spans) for i in range(n_docs)]
    dupes = [r for i, r in enumerate(rows) if FAMILIES[i % len(FAMILIES)] == "duplicate"]
    rows = rows + dupes
    return pa.Table.from_pylist(rows, schema=DOCUMENTS_SCHEMA)


def make_jobs(n_docs: int, seed: int = 42) -> pa.Table:
    """Window jobs for the "windowed" family (FIXTURES.md §2).

    Docs not listed here get the default job (whole doc, tesseract —
    reference api/src/server.ts:83).
    """
    from .schema import JOBS_SCHEMA

    starts = [1, 2, 3, 7]
    counts = [0, 1, 2, 99]
    rows = []
    k = 0
    for i in range(n_docs):
        if FAMILIES[i % len(FAMILIES)] == "windowed":
            rows.append(
                {
                    "doc_id": f"doc-{i:06d}",
                    "start_page": starts[k % 4],
                    "page_count": counts[(k // 4 + k) % 4],
                    "engine": "tesseract",
                    "model": "",
                }
            )
            k += 1
    return pa.Table.from_pylist(rows, schema=JOBS_SCHEMA)


def make_media(n_items: int, seed: int = 42) -> pa.Table:
    """Synthetic opaque media payload table (multimodal plumbing fixtures)."""
    rng = np.random.default_rng(np.random.SeedSequence([seed, 7_777]))
    codecs = ["dct", "flate", "raw-rgb", "raw-gray"]
    rows = []
    for i in range(n_items):
        w = int(rng.integers(4, 48))
        h = int(rng.integers(4, 48))
        codec = codecs[i % 4]
        if i % 11 == 10:
            codec = "jbig2"  # unsupported filter → decode failure
        nbytes = w * h * (3 if codec == "raw-rgb" else 1)
        if i % 7 == 6:
            nbytes = max(1, nbytes // 2)  # truncated buffer → size-check failure
        payload = rng.integers(0, 256, size=nbytes, dtype=np.uint8).tobytes()
        rows.append(
            {
                "media_ref": f"media-{i:06d}.bin",
                "payload": payload,
                "width": w,
                "height": h,
                "codec": codec,
            }
        )
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)
