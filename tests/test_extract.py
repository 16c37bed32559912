"""Golden + property tests: vectorized extract_batch ≡ pure-Python oracle."""

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pdfz_ray.corpus import make_documents, make_jobs
from pdfz_ray.jobs import jobs_table_to_lookup
from pdfz_ray.oracle import Job, extract_corpus, extract_doc, flatten_results
from pdfz_ray.schema import DOCUMENTS_SCHEMA
from pdfz_ray.stages.extract import extract_batch, flatten_output


def _first_wins(tbl: pa.Table) -> pa.Table:
    seen, keep = set(), []
    for i, d in enumerate(tbl.column("doc_id").to_pylist()):
        if d not in seen:
            seen.add(d)
            keep.append(i)
    return tbl.take(pa.array(keep))


def _assert_matches_oracle(tbl: pa.Table, jobs=None):
    oracle = {r.doc_id: r for r in extract_corpus(tbl.to_pylist(), jobs)}
    out = extract_batch(_first_wins(tbl), jobs)
    assert out.num_rows == len(oracle)
    for row in out.to_pylist():
        o = oracle[row["doc_id"]]
        assert row["status"] == o.status, row["doc_id"]
        assert row["spans"] == o.spans, row["doc_id"]
        assert row["pages"] == o.pages
        assert row["decode_failures"] == o.decode_failures
        assert row["empty_pages"] == o.empty_pages


def test_golden_corpus_default_jobs():
    _assert_matches_oracle(make_documents(120, monster_spans=300))


def test_golden_corpus_with_window_jobs():
    tbl = make_documents(120, monster_spans=300)
    jobs = jobs_table_to_lookup(make_jobs(120))
    assert jobs  # windowed family present
    _assert_matches_oracle(tbl, jobs)


def test_flatten_matches_oracle_flat():
    tbl = make_documents(60, monster_spans=100)
    out = extract_batch(_first_wins(tbl))
    got = flatten_output(out).to_pylist()
    want = flatten_results(extract_corpus(tbl.to_pylist()))
    assert got == want


def test_empty_batch():
    tbl = pa.Table.from_pylist([], schema=DOCUMENTS_SCHEMA)
    out = extract_batch(tbl)
    assert out.num_rows == 0
    assert flatten_output(out).num_rows == 0


def test_all_corrupt_batch():
    tbl = pa.Table.from_pylist(
        [
            {"doc_id": "a-corrupt", "spans": [
                {"kind": "text", "text": "x", "media_ref": "", "offset": 1}]},
            {"doc_id": "b-corrupt", "spans": []},
        ],
        schema=DOCUMENTS_SCHEMA,
    )
    out = extract_batch(tbl)
    assert out.column("status").to_pylist() == ["failed", "failed"]
    assert flatten_output(out).num_rows == 0


span_st = st.fixed_dictionaries(
    {
        "kind": st.sampled_from(["text", "media"]),
        "text": st.one_of(
            st.text(max_size=8),
            st.just("!bad"),
            st.just("!badder"),
        ),
        "media_ref": st.just(""),
        "offset": st.integers(min_value=1, max_value=6),
    }
)
doc_st = st.lists(span_st, max_size=25)


@settings(max_examples=60, deadline=None)
@given(
    docs=st.lists(doc_st, min_size=1, max_size=8),
    start=st.integers(0, 8),
    count=st.integers(0, 8),
)
def test_property_random_docs_match_oracle(docs, start, count):
    rows = [{"doc_id": f"h-{i:03d}", "spans": s} for i, s in enumerate(docs)]
    tbl = pa.Table.from_pylist(rows, schema=DOCUMENTS_SCHEMA)
    job = Job(start_page=start, page_count=count)
    jobs = {r["doc_id"]: job for r in rows}
    out = extract_batch(tbl, jobs)
    for row in out.to_pylist():
        o = extract_doc(row["doc_id"], rows[int(row["doc_id"][2:])]["spans"], job)
        assert row["spans"] == o.spans
        assert row["status"] == o.status
        assert (row["pages"], row["decode_failures"], row["empty_pages"]) == (
            o.pages,
            o.decode_failures,
            o.empty_pages,
        )


def test_batch_split_invariance():
    """Result is identical however the corpus is batched (blocks are an
    execution detail, SURVEY.md §7.3)."""
    tbl = make_documents(44, monster_spans=64)
    tbl = _first_wins(tbl)
    whole = extract_batch(tbl).to_pylist()
    parts = []
    for lo in range(0, tbl.num_rows, 7):
        parts.extend(extract_batch(tbl.slice(lo, 7)).to_pylist())
    assert whole == parts


def test_wide_row_skew_guard(monkeypatch):
    """A span-heavy batch is chunked internally (identical output), and a
    single monster row still processes alone."""
    import pdfz_ray.stages.extract as ex

    tbl = make_documents(33, monster_spans=500)
    tbl = _first_wins(tbl)
    whole = extract_batch(tbl).to_pylist()
    monkeypatch.setattr(ex, "MAX_SPANS_PER_KERNEL", 700)
    chunked = ex.extract_batch(tbl).to_pylist()
    assert whole == chunked

    monster = pa.Table.from_pylist(
        [
            {
                "doc_id": "huge",
                "spans": [
                    {"kind": "text", "text": f"s{i}", "media_ref": "",
                     "offset": i // 9 + 1}
                    for i in range(5000)
                ],
            }
        ],
        schema=DOCUMENTS_SCHEMA,
    )
    out = ex.extract_batch(monster)
    assert out.num_rows == 1
    assert out.column("pages").to_pylist()[0] == 5000 // 9 + 1
