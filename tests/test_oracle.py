"""Unit tests for the pure-Python oracle (the executable spec).

Pins the reference quirks from SURVEY.md §2 before any distributed code:
window off-by-one (M2), join-with-space (M4/G6), media name gaps (M5),
OCR-text drop (M3), corrupt-doc failure, first-wins dedup (J1).
"""

from pdfz_ray.oracle import Job, extract_corpus, extract_doc


def _doc(pages: dict[int, list[tuple[str, str]]]) -> list[dict]:
    """pages: page -> [(kind, payload)] in intra-page order."""
    spans = []
    for p, items in pages.items():
        for kind, payload in items:
            spans.append(
                {
                    "kind": kind,
                    "text": payload,
                    "media_ref": f"in-{p}" if kind == "media" else "",
                    "offset": p,
                }
            )
    return spans


def test_basic_text_pages_ordered():
    spans = _doc({2: [("text", "b")], 1: [("text", "a")]})
    r = extract_doc("d", spans)
    assert r.status == "done"
    assert [(s["kind"], s["text"], s["offset"]) for s in r.spans] == [
        ("text", "a", 1),
        ("text", "b", 2),
    ]
    assert r.pages == 2


def test_multi_text_join_space():
    spans = _doc({1: [("text", "a"), ("text", "b"), ("text", "c")]})
    r = extract_doc("d", spans)
    assert r.spans[0]["text"] == "a b c"


def test_empty_page_text():
    spans = _doc({1: [("media", "")]})
    r = extract_doc("d", spans)
    assert r.spans[0] == {"kind": "text", "text": "", "media_ref": "", "offset": 1}
    assert r.empty_pages == 1


def test_media_name_gap_on_decode_failure():
    spans = _doc({1: [("media", ""), ("media", "!bad"), ("media", "")]})
    r = extract_doc("d", spans)
    refs = [s["media_ref"] for s in r.spans if s["kind"] == "media"]
    assert refs == ["d_1_0.png", "d_1_2.png"]  # index 1 consumed by the failure
    assert r.decode_failures == 1


def test_ocr_text_dropped():
    spans = _doc({1: [("media", "payload-seed")]})
    r = extract_doc("d", spans)
    media = [s for s in r.spans if s["kind"] == "media"]
    assert media[0]["text"] == ""


# --- window off-by-one (engine/mod.rs:70-77): keep page_num >= start_page-1


def test_window_start_2_still_includes_page_1():
    spans = _doc({1: [("text", "p1")], 2: [("text", "p2")], 3: [("text", "p3")]})
    r = extract_doc("d", spans, Job(start_page=2))
    assert [s["offset"] for s in r.spans] == [1, 2, 3]


def test_window_start_3_skips_page_1():
    spans = _doc({1: [("text", "p1")], 2: [("text", "p2")], 3: [("text", "p3")]})
    r = extract_doc("d", spans, Job(start_page=3))
    assert [s["offset"] for s in r.spans] == [2, 3]


def test_window_page_count_limits_collected_pages():
    spans = _doc({p: [("text", f"p{p}")] for p in range(1, 6)})
    r = extract_doc("d", spans, Job(start_page=3, page_count=2))
    assert [s["offset"] for s in r.spans] == [2, 3]
    assert r.pages == 2


def test_window_page_count_zero_means_all():
    spans = _doc({p: [("text", f"p{p}")] for p in range(1, 4)})
    r = extract_doc("d", spans, Job(page_count=0))
    assert r.pages == 3


def test_window_page_count_exceeds_pages():
    spans = _doc({1: [("text", "a")]})
    r = extract_doc("d", spans, Job(page_count=99))
    assert r.pages == 1


def test_pages_defined_by_present_offsets_only():
    spans = _doc({1: [("text", "a")], 7: [("text", "g")]})
    r = extract_doc("d", spans, Job(page_count=2))
    assert [s["offset"] for s in r.spans] == [1, 7]


def test_corrupt_doc_fails_without_output():
    r = extract_doc("d-corrupt", _doc({1: [("text", "a")]}))
    assert r.status == "failed" and r.spans == []


def test_invalid_engine_fails_row():
    r = extract_doc("d", _doc({1: [("text", "a")]}), Job(engine="nope"))
    assert r.status == "failed"


def test_duplicate_doc_id_first_wins():
    rows = [
        {"doc_id": "d", "spans": _doc({1: [("text", "first")]})},
        {"doc_id": "d", "spans": _doc({1: [("text", "second")]})},
    ]
    res = extract_corpus(rows)
    assert len(res) == 1
    assert res[0].spans[0]["text"] == "first"


def test_model_tag_normalization():
    assert Job(model="llava").normalized_model() == "llava:latest"
    assert Job(model="llava:13b").normalized_model() == "llava:13b"
    assert Job(model=None).normalized_model() is None
