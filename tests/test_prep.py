"""Round-4 prep operators: RAG chunking, bigram collocations, per-doc
TF-IDF, and SemDeDup-style semantic dedup — each differentially tested
against DuckDB (or, where SQL can't express it, against the exact
brute-force rule computed independently in numpy)."""
import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _docs_view(con):
    con.execute(
        f"CREATE OR REPLACE VIEW documents AS "
        f"SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )


def test_chunk_documents_batch_matches_duckdb_edge_cases():
    from pdfz_ray.functions.prep import chunk_documents_batch

    texts = [
        "a b c d e f g h i j",   # multiple chunks + short tail
        "  one   two  ",          # irregular whitespace
        "",                       # empty → no chunks
        "   ",                    # all-whitespace → no chunks
        "x",                      # single token
        "α β γ δ ε ζ η θ",        # non-ASCII: char (not byte) slicing
    ]
    batch = pa.table(
        {
            "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
            "text": pa.array(texts),
        }
    )
    got = (
        chunk_documents_batch(batch, chunk_tokens=4, stride=3)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", batch)
    exp = con.execute(
        r"""
        WITH toks AS (
          SELECT doc_id, regexp_extract_all(text, '\S+') AS tk FROM documents),
        base AS (SELECT doc_id, tk, len(tk) AS n FROM toks WHERE len(tk) > 0),
        starts AS (
          SELECT doc_id, tk, n, unnest(generate_series(0, n - 1, 3)) AS s
          FROM base)
        SELECT doc_id, CAST(s / 3 AS BIGINT) AS chunk_id,
               array_to_string(tk[s + 1 : least(s + 4, n)], ' ') AS chunk_text,
               CAST(least(s + 4, n) - s AS BIGINT) AS n_tokens
        FROM starts ORDER BY doc_id, chunk_id
        """
    ).df()
    pd.testing.assert_frame_equal(got, exp)
    # empty/whitespace docs contributed nothing
    assert set(got["doc_id"]) == {1, 2, 5, 6}


def test_chunk_documents_overlap_contract():
    from pdfz_ray.functions.prep import chunk_documents_batch

    batch = pa.table(
        {"doc_id": pa.array([7], pa.int64()), "text": pa.array(["t" + " t".join(str(i) for i in range(100))])}
    )
    out = chunk_documents_batch(batch, chunk_tokens=64, stride=48).to_pandas()
    # starts at 0, 48, 96 for 100 tokens
    assert list(out["chunk_id"]) == [0, 1, 2]
    assert list(out["n_tokens"]) == [64, 52, 4]
    # consecutive chunks overlap by chunk_tokens - stride tokens
    t0 = out["chunk_text"][0].split()
    t1 = out["chunk_text"][1].split()
    assert t0[48:] == t1[:16]
    with pytest.raises(ValueError):
        chunk_documents_batch(batch, chunk_tokens=0, stride=4)


def test_chunk_documents_dataset_roundtrip(ray_session):
    import ray.data as rd

    from pdfz_ray.functions.prep import chunk_documents

    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    out = chunk_documents(ds, chunk_tokens=64, stride=48).to_pandas()
    con = duckdb.connect()
    _docs_view(con)
    n_exp = con.execute(
        r"""
        SELECT sum(CAST(ceil(len(regexp_extract_all(text, '\S+')) / 48.0) AS BIGINT))
        FROM documents WHERE len(regexp_extract_all(text, '\S+')) > 0
        """
    ).fetchone()[0]
    assert len(out) == n_exp
    # chunk token counts always in (0, chunk_tokens]
    assert out["n_tokens"].between(1, 64).all()


def test_bigram_top_matches_duckdb(ray_session):
    from pdfz_ray.functions.prep import bigram_top

    got = bigram_top(SF, k=20).reset_index(drop=True)
    con = duckdb.connect()
    _docs_view(con)
    exp = con.execute(
        r"""
        WITH toks AS (
          SELECT regexp_extract_all(lower(coalesce(text, '')), '\S+') AS tk
          FROM documents),
        g AS (SELECT array_to_string(tk[s : s + 1], ' ') AS bigram
              FROM (SELECT tk, unnest(generate_series(1, len(tk) - 1)) AS s
                    FROM toks))
        SELECT bigram, count(*) AS n FROM g
        GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20
        """
    ).df()
    pd.testing.assert_frame_equal(got, exp)


def test_tfidf_topk_matches_duckdb(ray_session):
    from pdfz_ray.functions.prep import tfidf_topk

    got = tfidf_topk(SF, k=3).reset_index(drop=True)
    con = duckdb.connect()
    _docs_view(con)
    exp = con.execute(
        r"""
        WITH t AS (
          SELECT doc_id,
                 unnest(regexp_extract_all(lower(coalesce(text, '')), '\S+')) AS term
          FROM documents),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY doc_id, term),
        df AS (SELECT term, count(DISTINCT doc_id) AS df FROM t GROUP BY term),
        s AS (SELECT tf.doc_id, tf.term, tf.tf AS tf, df.df AS df,
                     row_number() OVER (
                       PARTITION BY tf.doc_id
                       ORDER BY CAST(tf.tf AS DOUBLE) / df.df DESC, tf.term
                     ) AS rn
              FROM tf JOIN df USING (term))
        SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df
        FROM s WHERE rn <= 3 ORDER BY doc_id, term
        """
    ).df()
    pd.testing.assert_frame_equal(got, exp)
    # exactly k rows per doc with >= k distinct terms (all docs here)
    assert (got.groupby("doc_id").size() == 3).all()


def _brute_dropped(threshold: float) -> dict:
    t = pq.read_table(f"{SF}/embeddings.parquet")
    ids = t.column("vec_id").to_numpy()
    x = np.stack([np.asarray(v, np.float64) for v in t.column("embedding").to_pylist()])
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)
    order = np.argsort(ids)
    ids_s, xs = ids[order], x[order]
    sims = np.tril(xs @ xs.T, k=-1)
    return dict(zip(ids_s.tolist(), (sims >= threshold).any(axis=1).tolist()))


def test_semantic_dedup_single_cluster_is_exact(ray_session):
    import ray.data as rd

    from pdfz_ray.functions.dedup import semantic_dedup

    ds = rd.read_parquet(f"{SF}/embeddings.parquet")
    got = semantic_dedup(ds, n_clusters=1, threshold=0.45).to_pandas()
    exp = _brute_dropped(0.45)
    assert len(got) == len(exp)
    for r in got.itertuples():
        assert bool(r.dropped) == exp[r.vec_id], r.vec_id
    # a real near-dup population exists at this threshold on this corpus
    assert 0 < got["dropped"].sum() < len(got)


def test_semantic_dedup_clustered_invariants(ray_session):
    import ray.data as rd

    from pdfz_ray.functions.dedup import semantic_dedup

    ds = rd.read_parquet(f"{SF}/embeddings.parquet")
    a = semantic_dedup(ds, n_clusters=8, threshold=0.45).to_pandas()
    b = semantic_dedup(ds, n_clusters=8, threshold=0.45).to_pandas()
    pd.testing.assert_frame_equal(a, b)  # deterministic across runs
    exp = _brute_dropped(0.45)
    assert len(a) == len(exp)  # full coverage, one row per vector
    assert sorted(a["vec_id"]) == sorted(exp)
    # cluster restriction only REMOVES candidate pairs: every clustered
    # drop is also an exact-rule drop
    for r in a.itertuples():
        if r.dropped:
            assert exp[r.vec_id]
    assert a["cluster"].between(0, 7).all()


def test_semantic_dedup_cluster_cap(ray_session, tmp_path):
    """VERDICT r4 next-round #5: a crafted one-giant-cluster corpus must
    ENGAGE the cluster-size cap (LSH sub-shard), PRESERVE planted
    exact-duplicate drops, and stay sound (every capped drop is also an
    exact-rule drop) and deterministic."""
    import ray.data as rd

    from pdfz_ray.functions.dedup import (
        _capped_cluster_mark,
        _earlier_neighbor_mask,
        semantic_dedup,
    )

    rng = np.random.default_rng(7)
    n, d, cap = 3000, 16, 256
    x = rng.standard_normal((n, d))
    # plant exact duplicates: rows 2000..2199 copy rows 0..199
    dup_dst = np.arange(2000, 2200)
    x[dup_dst] = x[np.arange(200)]
    xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)

    # unit level: the cap engages (sub-shards into >1 LSH bucket) and the
    # capped mark is a sound subset of the exact mark with dups caught
    capped, nb = _capped_cluster_mark(xn, 0.95, cap, seed=42)
    assert nb > 1, "cap did not engage on a giant cluster"
    exact = _earlier_neighbor_mask(xn, 0.95)
    assert not (capped & ~exact).any()  # no false drops
    assert capped[dup_dst].all()  # planted exact dups always drop
    uncapped, nb1 = _capped_cluster_mark(xn, 0.95, None, seed=42)
    assert nb1 == 1 and (uncapped == exact).all()

    # end to end through semantic_dedup with the cap engaged
    p = str(tmp_path / "emb.parquet")
    pq.write_table(
        pa.Table.from_arrays(
            [
                pa.array(np.arange(n, dtype=np.int64)),
                pa.array(list(x), pa.list_(pa.float64())),
            ],
            names=["vec_id", "embedding"],
        ),
        p,
    )
    ds = rd.read_parquet(p)
    a = semantic_dedup(
        ds, n_clusters=1, threshold=0.95, cluster_cap=cap
    ).to_pandas()
    b = semantic_dedup(
        ds, n_clusters=1, threshold=0.95, cluster_cap=cap
    ).to_pandas()
    pd.testing.assert_frame_equal(a, b)  # deterministic
    assert len(a) == n
    got = a.set_index("vec_id")["dropped"]
    assert got.loc[dup_dst].all()  # planted dups preserved through the cap
    # soundness end to end: capped drops are a subset of the exact rule's
    for vid in a.loc[a["dropped"], "vec_id"]:
        assert exact[vid]


def test_lm_coverage_matches_duckdb(ray_session):
    from pdfz_ray.functions.prep import lm_coverage

    got = lm_coverage(SF, min_count=2).reset_index(drop=True)
    con = duckdb.connect()
    _docs_view(con)
    exp = con.execute(
        r"""
        WITH toks AS (
          SELECT doc_id,
                 regexp_extract_all(lower(coalesce(text, '')), '\S+') AS tk
          FROM documents),
        bg AS (SELECT doc_id, tk[s] || ' ' || tk[s + 1] AS bigram
               FROM (SELECT doc_id, tk,
                            unnest(generate_series(1, len(tk) - 1)) AS s
                     FROM toks)),
        cnt AS (SELECT bigram, count(*) AS n FROM bg GROUP BY bigram),
        rare AS (SELECT bg.doc_id,
                        count(*) AS n_transitions,
                        count(*) FILTER (WHERE cnt.n < 2) AS n_rare
                 FROM bg JOIN cnt USING (bigram) GROUP BY bg.doc_id)
        SELECT d.doc_id,
               CAST(coalesce(r.n_transitions, 0) AS BIGINT) AS n_transitions,
               CAST(coalesce(r.n_rare, 0) AS BIGINT) AS n_rare
        FROM documents d LEFT JOIN rare r USING (doc_id)
        ORDER BY d.doc_id
        """
    ).df()
    pd.testing.assert_frame_equal(got, exp)
    # the signal separates: some docs have rare transitions, none exceed
    # their transition count, and every doc appears exactly once
    assert (got["n_rare"] <= got["n_transitions"]).all()
    assert got["doc_id"].is_unique and len(got) == 500


def test_prep_production_variants_stream(ray_session):
    """tfidf_topk_ds / lm_coverage_ds return Datasets consumable without
    a driver collect (the windows-family production-variant contract)."""
    import ray.data

    from pdfz_ray.functions.prep import lm_coverage_ds, tfidf_topk_ds

    for fn, cols in (
        (tfidf_topk_ds, {"doc_id", "term", "tf", "df"}),
        (lm_coverage_ds, {"doc_id", "n_transitions", "n_rare"}),
    ):
        ds = fn(SF)
        assert isinstance(ds, ray.data.Dataset), fn.__name__
        names = None
        for b in ds.iter_batches(batch_format="pyarrow", batch_size=4096):
            names = set(b.column_names)
            break
        assert names == cols, (fn.__name__, names)


def test_lm_coverage_threshold_semantics(ray_session, tmp_path):
    """min_count=1 marks nothing rare (every bigram occurs >= 1 time);
    a huge min_count marks every transition rare."""
    import pyarrow.parquet as pq_mod

    from pdfz_ray.functions.prep import lm_coverage

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["a b a b", "a b c", "solo"]),
        }
    )
    p = str(tmp_path / "documents.parquet")
    pq_mod.write_table(t, p)
    none_rare = lm_coverage("unused", min_count=1, docs_path=p)
    assert none_rare["n_rare"].sum() == 0
    assert list(none_rare["n_transitions"]) == [3, 2, 0]
    all_rare = lm_coverage("unused", min_count=10**9, docs_path=p)
    assert list(all_rare["n_rare"]) == [3, 2, 0]


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab α\t\n"), min_size=0, max_size=60
        ),
        min_size=1,
        max_size=6,
    ),
    chunk=st.integers(1, 9),
    stride_delta=st.integers(0, 8),
)
def test_chunk_documents_reconstruction_property(texts, chunk, stride_delta):
    """Every doc reconstructs exactly from its chunks: chunk 0 plus each
    later chunk's tail beyond the overlap re-joins to the normalized
    (single-space) document; token counts and coverage are exact."""
    from pdfz_ray.functions.prep import chunk_documents_batch

    stride = max(1, chunk - stride_delta)  # stride <= chunk: full coverage
    batch = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )
    out = chunk_documents_batch(batch, chunk_tokens=chunk, stride=stride).to_pandas()
    for i, text in enumerate(texts):
        toks = text.split()
        mine = out[out["doc_id"] == i].sort_values("chunk_id")
        if not toks:
            assert len(mine) == 0
            continue
        # chunk c covers tokens [c*stride, min(c*stride+chunk, n))
        assert list(mine["chunk_id"]) == list(range(len(mine)))
        rebuilt: list[str] = []
        for r in mine.itertuples():
            ctoks = r.chunk_text.split(" ") if r.chunk_text else []
            assert len(ctoks) == r.n_tokens
            start = r.chunk_id * stride
            assert ctoks == toks[start : start + chunk]
            rebuilt.extend(ctoks[max(len(rebuilt) - start, 0) :])
        assert rebuilt == toks


def test_semantic_dedup_far_centroid_rule(ray_session, tmp_path):
    """keep="far_centroid" (the SemDeDup paper's §3 rule) must equal an
    independent numpy replication: rank ascending by centroid cosine
    (vec_id tie-break), drop any vector with an earlier-ranked neighbor
    at cosine >= threshold — the farthest member of each dup set wins."""
    import pyarrow.parquet as pq_mod
    import ray.data as rd

    from pdfz_ray.functions.dedup import semantic_dedup
    from pdfz_ray.functions.similarity import _kmeans_fit, _normalize

    rng = np.random.default_rng(7)
    base = rng.normal(size=(6, 16))
    rows = []
    vid = 0
    for b in base:
        for _ in range(rng.integers(1, 4)):  # 1-3 near-copies each
            rows.append((vid, (b + rng.normal(scale=0.01, size=16)).astype(np.float32)))
            vid += 1
    t = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array([r[1].tolist() for r in rows], pa.list_(pa.float32())),
            "label": pa.array([0] * len(rows), pa.int32()),
        }
    )
    p = str(tmp_path / "embeddings.parquet")
    pq_mod.write_table(t, p)

    thr = 0.98
    got = semantic_dedup(
        rd.read_parquet(p), n_clusters=1, threshold=thr, keep="far_centroid"
    ).to_pandas()

    # independent replication of the documented rule
    ids = t.column("vec_id").to_numpy()
    x = _normalize(
        np.stack([np.asarray(v, np.float64) for v in t.column("embedding").to_pylist()])
    )
    cen = _kmeans_fit(x, 1)[0]
    order = np.lexsort((ids, x @ cen))
    dropped_exp: dict[int, bool] = {}
    seen: list[int] = []
    for i in order:
        # dropped iff ANY earlier-RANKED vector (kept or not) is >= thr
        dropped_exp[int(ids[i])] = any((x[i] @ x[j]) >= thr for j in seen)
        seen.append(i)
    for r in got.itertuples():
        assert bool(r.dropped) == dropped_exp[r.vec_id], r.vec_id
    # sanity: the dup population exists and survivors differ from min_id
    assert 0 < got["dropped"].sum() < len(got)
    with pytest.raises(ValueError):
        semantic_dedup(rd.read_parquet(p), keep="nope")
