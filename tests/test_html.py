"""HTML main-content extraction: block model semantics + differential
check of the html.parser operator vs the independent regex-stack
reference (pdfz_ray.oracle.main_content_ref)."""

import numpy as np
import pyarrow as pa

from pdfz_ray.oracle import main_content_ref
from pdfz_ray.stages.html import (
    MIN_BLOCK_CHARS,
    extract_main_content,
    main_content_batch,
    make_html_corpus,
)

LONG = "this paragraph carries plenty of honest prose to clear the bar"


def test_drop_subtrees_removed_entirely():
    html = (
        f"<body><nav><p>{LONG}</p></nav>"
        f"<header><p>{LONG}</p></header>"
        f"<p>{LONG}</p>"
        f"<footer><p>{LONG}</p></footer></body>"
    )
    r = extract_main_content(html)
    # blocks inside dropped subtrees are never even counted
    assert r["n_blocks"] == 1 and r["n_kept"] == 1
    assert r["main_text"] == LONG


def test_link_density_and_length_gates():
    dense = f'<p><a href="x">{LONG}</a> y</p>'  # anchors dominate → dropped
    short = "<p>too short</p>"
    sparse = f'<p>{LONG} <a href="x">ok</a></p>'  # low density → kept
    r = extract_main_content(f"<body>{dense}{short}{sparse}</body>")
    assert r["n_blocks"] == 3 and r["n_kept"] == 1
    assert r["main_text"].startswith(LONG)


def test_nested_block_owns_its_text():
    html = f"<body><li>outer intro {LONG}<p>{LONG} inner</p></li></body>"
    r = extract_main_content(html)
    # inner <p> closes first and owns its text; both blocks clear the gates
    assert r["n_blocks"] == 2 and r["n_kept"] == 2
    assert r["main_text"].split("\n")[0].endswith("inner")


def test_entities_comments_void_tags():
    html = (
        f"<body><!-- <p>ghost</p> --><p>a &amp; b<br>{LONG}</p>"
        "<style>p{color:red}</style></body>"
    )
    r = extract_main_content(html)
    assert r["n_blocks"] == 1 and r["n_kept"] == 1
    assert r["main_text"].startswith("a & b ")


def test_unclosed_blocks_emit_at_eof():
    html = f"<body><p>{LONG}"
    r = extract_main_content(html)
    assert r["n_blocks"] == 1 and r["n_kept"] == 1


def test_min_chars_boundary():
    exactly = "x" * MIN_BLOCK_CHARS
    under = "x" * (MIN_BLOCK_CHARS - 1)
    r = extract_main_content(f"<body><p>{exactly}</p><p>{under}</p></body>")
    assert r["n_kept"] == 1


def test_operator_matches_reference_on_crafted_pages():
    pages = [
        f"<body><nav><a>h</a></nav><p>{LONG}</p></body>",
        f"<body><ul><li><a href='/'>related {LONG}</a></li></ul></body>",
        f"<body><div><p>{LONG}</p><p>{LONG} two</p></div><footer><p>{LONG}</p></footer></body>",
        "<body></body>",
        "",
        f"<body><td>{LONG}</td><blockquote>{LONG}</blockquote><pre>{LONG}</pre></body>",
        f"<body><p>{LONG} &lt;tag&gt; &quot;q&quot;</p></body>",
    ]
    for h in pages:
        assert extract_main_content(h) == main_content_ref(h), h


def test_operator_matches_reference_on_synthetic_corpus():
    rng = np.random.default_rng(3)
    texts = [
        " ".join(f"w{rng.integers(200)}" for _ in range(int(rng.integers(0, 150))))
        for _ in range(80)
    ]
    docs = pa.Table.from_arrays(
        [pa.array(range(80), pa.int64()), pa.array(texts)], names=["doc_id", "text"]
    )
    pages = make_html_corpus(docs)
    out = main_content_batch(pages)
    for i, h in enumerate(pages.column("html").to_pylist()):
        ref = main_content_ref(h)
        assert out.column("n_blocks")[i].as_py() == ref["n_blocks"]
        assert out.column("n_kept")[i].as_py() == ref["n_kept"]
        assert out.column("main_text")[i].as_py() == ref["main_text"]


def test_corpus_generator_is_deterministic():
    docs = pa.Table.from_arrays(
        [pa.array([5, 9], pa.int64()), pa.array(["alpha beta", "gamma"])],
        names=["doc_id", "text"],
    )
    a = make_html_corpus(docs)
    b = make_html_corpus(docs)
    assert a.equals(b)


def test_corpus_generator_escapes_special_chars():
    """Advisor r3: doc text containing <, & or > must be escaped into the
    page so the stdlib parser and the regex-stack reference agree; both
    sides unescape, so the extracted text round-trips the original."""
    specials = (
        "tom & jerry <b>not-a-tag</b> 1<2 and 3>2 café naïve "
        + " ".join(f"w{i}" for i in range(30))
    )
    docs = pa.Table.from_arrays(
        [pa.array([7], pa.int64()), pa.array([specials])],
        names=["doc_id", "text"],
    )
    pages = make_html_corpus(docs)
    h = pages.column("html")[0].as_py()
    # the raw markup must not contain the unescaped '<b>' from doc text
    assert "<b>not-a-tag</b>" not in h
    out = main_content_batch(pages)
    ref = main_content_ref(h)
    assert out.column("main_text")[0].as_py() == ref["main_text"]
    # the original special characters survive extraction un-mangled
    assert "tom & jerry" in ref["main_text"]
    assert "<b>not-a-tag</b>" in ref["main_text"]
    assert "café" in ref["main_text"]
