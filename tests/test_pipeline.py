"""End-to-end flagship pipeline tests on Ray: golden equality, dedup,
actor-pool OCR, checkpoint/resume, partition metrics."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pdfz_ray.corpus import make_documents, make_jobs
from pdfz_ray.jobs import jobs_table_to_lookup
from pdfz_ray.oracle import extract_corpus, flatten_results


@pytest.fixture(scope="module")
def corpus_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    tbl = make_documents(120, monster_spans=200)
    paths = []
    for i in range(4):
        p = str(d / f"docs-{i}.parquet")
        pq.write_table(tbl.slice(i * 33, 33), p)
        paths.append(p)
    return tbl, paths


def _oracle_flat(tbl, jobs=None):
    return flatten_results(extract_corpus(tbl.to_pylist(), jobs))


def test_pipeline_matches_oracle(ray_session, corpus_files):
    import ray.data as rd

    from pdfz_ray.pipelines.extract_pipeline import build_extract_pipeline
    from pdfz_ray.stages.extract import flatten_output

    tbl, paths = corpus_files
    jobs = jobs_table_to_lookup(make_jobs(120))
    ds = rd.read_parquet(paths)
    out = build_extract_pipeline(ds, jobs, ocr_concurrency=2)
    flat = out.map_batches(flatten_output, batch_format="pyarrow")
    got = sorted(
        (tuple(r.values()) for r in flat.take_all()),
        key=lambda t: (t[0], t[1]),
    )
    want = sorted(
        (tuple(r.values()) for r in _oracle_flat(tbl, jobs)),
        key=lambda t: (t[0], t[1]),
    )
    assert got == want


def test_pipeline_dedup_exact(ray_session, corpus_files):
    import ray.data as rd

    from pdfz_ray.pipelines.extract_pipeline import build_extract_pipeline

    tbl, paths = corpus_files
    n_unique = len(set(tbl.column("doc_id").to_pylist()))
    ds = rd.read_parquet(paths)
    out = build_extract_pipeline(ds, ocr=False)
    assert out.count() == n_unique


def test_extract_to_dir_matches_union_topology(ray_session, corpus_files, tmp_path):
    """extract_to_dir (fused map→write + winners side file — the bench /
    at-scale topology) is row-identical to build_extract_pipeline's
    Dataset.union topology."""
    import pyarrow.dataset as pads
    import ray.data as rd

    from pdfz_ray.pipelines.extract_pipeline import (
        build_extract_pipeline,
        extract_to_dir,
    )

    tbl, paths = corpus_files
    jobs = jobs_table_to_lookup(make_jobs(120))

    d_union = str(tmp_path / "out_union")
    build_extract_pipeline(
        rd.read_parquet(paths), jobs, dedup=True, input_files=paths, ocr=True
    ).write_parquet(d_union)
    d_fused = str(tmp_path / "out_fused")
    extract_to_dir(paths, d_fused, jobs, ocr=True)

    def rows(d):
        t = pads.dataset(d, format="parquet").to_table()
        return sorted(
            (r["doc_id"], r["status"], r["pages"], str(r["spans"]))
            for r in t.to_pylist()
        )

    assert rows(d_fused) == rows(d_union)
    # the winners side file exists (the fixture corpus has a dup-id tail)
    assert os.path.exists(os.path.join(d_fused, "winners.parquet"))


def test_run_partitioned_and_resume(ray_session, corpus_files, tmp_path):
    from pdfz_ray.pipelines.extract_pipeline import run_partitioned
    from pdfz_ray.stages.extract import flatten_output

    tbl, paths = corpus_files
    out_dir = str(tmp_path / "out")
    res1 = run_partitioned(paths, out_dir, partition_size=2, ocr_concurrency=2)
    assert res1["partitions_run"] == [0, 1]
    assert res1["partitions_skipped"] == []

    # resume: nothing to do
    res2 = run_partitioned(paths, out_dir, partition_size=2, ocr_concurrency=2)
    assert res2["partitions_run"] == []
    assert res2["partitions_skipped"] == [0, 1]

    # simulate a crash: delete one committed partition's manifest line
    man = res1["manifest"]
    lines = open(man).read().strip().splitlines()
    with open(man, "w") as f:
        f.write(lines[0] + "\n")
    res3 = run_partitioned(paths, out_dir, partition_size=2, ocr_concurrency=2)
    assert res3["partitions_run"] == [1]

    # final output identical to the oracle — including cross-partition
    # duplicate doc_ids (corpus appends dup rows at the table end, so they
    # land in a different partition than their originals)
    import ray.data as rd

    final = rd.read_parquet(res3["output_files"])
    flat = final.map_batches(flatten_output, batch_format="pyarrow")
    got = sorted((tuple(r.values()) for r in flat.take_all()))
    want = sorted((tuple(r.values()) for r in _oracle_flat(tbl)))
    assert got == want

    # manifest lineage metrics are consistent with the oracle's counters
    oracle = extract_corpus(tbl.to_pylist())
    import json

    rows = [json.loads(l) for l in open(man)]
    assert sum(r["docs"] for r in rows) == len(oracle)
    assert sum(r["pages"] for r in rows) == sum(o.pages for o in oracle)
    assert sum(r["decode_failures"] for r in rows) == sum(
        o.decode_failures for o in oracle
    )
    assert sum(r["empty_pages"] for r in rows) == sum(o.empty_pages for o in oracle)
    assert sum(r["docs_failed"] for r in rows) == sum(
        1 for o in oracle if o.status == "failed"
    )


def test_resume_rejects_changed_chunking(ray_session, corpus_files, tmp_path):
    """A manifest 'done' pid is honored only when it still maps to the same
    file chunk — resuming with a different partition_size re-runs instead of
    silently skipping pids that now cover different files (ADVICE r1)."""
    from pdfz_ray.pipelines.extract_pipeline import run_partitioned

    tbl, paths = corpus_files
    out_dir = str(tmp_path / "out_chunk")
    res1 = run_partitioned(paths, out_dir, partition_size=2, ocr=False)
    assert res1["partitions_run"] == [0, 1]

    # same chunking resumes cleanly ...
    res2 = run_partitioned(paths, out_dir, partition_size=2, ocr=False)
    assert res2["partitions_skipped"] == [0, 1]

    # ... but a different partition_size invalidates every committed pid
    res3 = run_partitioned(paths, out_dir, partition_size=1, ocr=False)
    assert res3["partitions_skipped"] == []
    assert res3["partitions_run"] == [0, 1, 2, 3]


def test_live_metrics_mid_run(ray_session, tmp_path):
    """G2 live path: per-batch counter flushes to the named metrics actor
    are pollable WHILE run_partitioned is in flight, increase
    monotonically, and converge to the manifest's exact lineage."""
    import json
    import threading
    import time

    from pdfz_ray.corpus import make_documents
    from pdfz_ray.pipelines.extract_pipeline import run_partitioned
    from pdfz_ray.state.metrics import get_metrics_actor, live_progress

    tbl = make_documents(1600)
    d = tmp_path / "in"
    d.mkdir()
    per = (tbl.num_rows + 7) // 8
    paths = []
    for i in range(8):
        p = str(d / f"f{i}.parquet")
        pq.write_table(tbl.slice(i * per, per), p)
        paths.append(p)

    name = "pdfz_metrics_test"
    # hold the handle for the test's lifetime — a named non-detached actor
    # is collected once its last handle drops
    actor = get_metrics_actor(name)  # noqa: F841
    res: dict = {}

    def go():
        res["r"] = run_partitioned(
            paths, str(tmp_path / "out"), partition_size=1, ocr=False,
            metrics=name,
        )

    th = threading.Thread(target=go)
    th.start()
    seen = []
    while th.is_alive():
        s = live_progress(name)
        if s.get("docs"):
            seen.append(s["docs"])
        time.sleep(0.05)
    th.join()
    # fire-and-forget flushes may still be in flight right after join
    final = live_progress(name)
    for _ in range(100):
        time.sleep(0.05)
        nxt = live_progress(name)
        if nxt == final:
            break
        final = nxt

    assert final["partitions_total"] == 8
    assert final["partitions_done"] == 8
    assert seen == sorted(seen), "mid-run counters must be monotone"
    assert seen and seen[0] < final["docs"], "no mid-run snapshot observed"
    rows = [json.loads(line) for line in open(res["r"]["manifest"])]
    assert final["docs"] == sum(r["docs"] for r in rows)
    assert final["pages"] == sum(r["pages"] for r in rows)


def test_skew_bucketed_pipeline_correct(ray_session):
    """Size-bucket routing (SURVEY §7.1 M4): the split → repartitioned big
    branch → union topology is byte-identical to the oracle, and the
    threshold estimator lands between the median and the monster sizes."""
    import ray.data as rd

    from pdfz_ray.corpus import make_document
    from pdfz_ray.pipelines.extract_pipeline import (
        build_extract_pipeline,
        estimate_span_threshold,
    )
    from pdfz_ray.schema import DOCUMENTS_SCHEMA
    from pdfz_ray.stages.extract import flatten_output

    normal = [make_document(i) for i in range(550) if i % 11 != 9]
    monsters = [
        make_document(i, monster_spans=1500) for i in range(550) if i % 11 == 9
    ][:5]
    skew_tbl = pa.Table.from_pylist(normal + monsters, schema=DOCUMENTS_SCHEMA)

    thr = estimate_span_threshold(rd.from_arrow(skew_tbl), quantile=0.95)
    assert 4 <= thr < 1500  # between median (≈8) and monster (1500) spans

    out = build_extract_pipeline(
        rd.from_arrow(skew_tbl).repartition(4),
        dedup=False, ocr=False,
        skew_threshold=thr, batch_size=256, monster_batch_size=4, big_blocks=8,
    )
    flat = out.map_batches(flatten_output, batch_format="pyarrow")
    got = sorted(tuple(r.values()) for r in flat.take_all())
    want = sorted(tuple(r.values()) for r in _oracle_flat(skew_tbl))
    assert got == want


def test_skew_throughput_holds(ray_session, tmp_path):
    """A parquet corpus where ~1% of docs hold ≥100× the median spans
    (clustered at the end, worst case for row-based blocking) keeps ≥0.8
    of the uniform corpus's spans/sec — Ray's byte-based read blocking
    cost-balances blocks because extract cost is ∝ bytes; the routed
    (skew_threshold) path must hold the same bar."""
    import time

    import pyarrow.compute as pc
    import ray.data as rd

    from pdfz_ray.corpus import make_document
    from pdfz_ray.pipelines.extract_pipeline import build_extract_pipeline
    from pdfz_ray.schema import DOCUMENTS_SCHEMA
    from pdfz_ray.stages.extract import flatten_output

    normal = [make_document(i) for i in range(1100) if i % 11 != 9]
    mspans = [
        {"kind": "text", "text": f"w{k % 17} x y", "media_ref": "", "offset": k // 8 + 1}
        for k in range(100_000)
    ]
    monsters = [{"doc_id": f"doc-m{j:03d}", "spans": mspans} for j in range(10)]
    uni_tbl = pa.Table.from_pylist(normal, schema=DOCUMENTS_SCHEMA)
    skew_tbl = pa.Table.from_pylist(normal + monsters, schema=DOCUMENTS_SCHEMA)

    def write(tbl, name, nfiles=8):
        d = tmp_path / name
        d.mkdir()
        per = (tbl.num_rows + nfiles - 1) // nfiles
        paths = []
        for i in range(nfiles):
            p = str(d / f"f{i}.parquet")
            pq.write_table(tbl.slice(i * per, per), p)
            paths.append(p)
        return paths

    up, sp = write(uni_tbl, "uni"), write(skew_tbl, "skew")
    spans = lambda t: int(pc.sum(pc.list_value_length(t.column("spans"))).as_py())  # noqa: E731
    su, ss = spans(uni_tbl), spans(skew_tbl)

    def run(paths, **kw):
        ds = rd.read_parquet(paths)
        t0 = time.perf_counter()
        out = build_extract_pipeline(ds, dedup=False, ocr=False, **kw)
        out.map_batches(flatten_output, batch_format="pyarrow").count()
        return time.perf_counter() - t0

    run(up)  # warm the worker pool
    tu = run(up)
    ts = run(sp)
    tr = run(sp, skew_threshold=1000, monster_batch_size=2, big_blocks=8)
    plain_ratio = (ss / ts) / (su / tu)
    routed_ratio = (ss / tr) / (su / tu)
    assert plain_ratio >= 0.8, f"plain skew ratio {plain_ratio:.2f}"
    assert routed_ratio >= 0.8, f"routed skew ratio {routed_ratio:.2f}"


def _interleave_row_loop_ref(ids, texts):
    """Row-loop reference for interleave_documents (the round-1 impl) —
    pins the vectorized offset-arithmetic version bit-for-bit."""
    from pdfz_ray.pipelines.extract_pipeline import WORDS_PER_PAGE, WORDS_PER_SPAN
    from pdfz_ray.schema import DOCUMENTS_SCHEMA

    rows = []
    for i, txt in zip(ids, texts):
        words = (txt or "").split()
        spans = []
        page = 0
        for lo in range(0, max(len(words), 1), WORDS_PER_PAGE):
            page += 1
            pw = words[lo : lo + WORDS_PER_PAGE]
            for s in range(0, max(len(pw), 1), WORDS_PER_SPAN):
                spans.append(
                    {"kind": "text", "text": " ".join(pw[s : s + WORDS_PER_SPAN]),
                     "media_ref": "", "offset": page}
                )
            if (int(i) + page) % 3 == 0:
                bad = (int(i) + page) % 9 == 0
                spans.append(
                    {"kind": "media",
                     "text": f"{'!bad-' if bad else ''}img-{int(i)}-{page}",
                     "media_ref": f"in-{int(i)}-{page}", "offset": page}
                )
        rows.append({"doc_id": f"doc-{int(i):08d}", "spans": spans})
    return pa.Table.from_pylist(rows, schema=DOCUMENTS_SCHEMA)


def test_interleave_vectorized_matches_row_loop():
    from pdfz_ray.pipelines.extract_pipeline import interleave_documents

    words = lambda n: " ".join(f"w{j}" for j in range(n))  # noqa: E731
    cases = ["", words(1), words(15), words(40), words(41), words(80),
             words(123), "Ünïcödé " * 30, words(600), ""]
    ids = list(range(len(cases)))
    batch = pa.Table.from_pydict(
        {"doc_id": pa.array(ids, pa.int64()), "text": cases}
    )
    got = interleave_documents(batch)
    want = _interleave_row_loop_ref(ids, cases)
    assert got.schema.equals(want.schema)
    assert got.to_pylist() == want.to_pylist()

    real = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    got = interleave_documents(real)
    want = _interleave_row_loop_ref(
        real.column("doc_id").to_pylist(), real.column("text").to_pylist()
    )
    assert got.to_pylist() == want.to_pylist()


def test_interleave_ingest(ray_session):
    import ray.data as rd

    from pdfz_ray.pipelines.extract_pipeline import (
        build_extract_pipeline,
        interleave_documents,
    )

    ds = rd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    docs = ds.map_batches(interleave_documents, batch_format="pyarrow")
    out = build_extract_pipeline(docs, dedup=False, ocr=False)
    n_in = ds.count()
    assert out.count() == n_in
    sample = out.take(3)
    for row in sample:
        assert row["status"] == "done"
        assert row["spans"][0]["kind"] == "text"


def test_pipeline_survives_transient_task_failures(ray_session, tmp_path):
    """Ray's at-least-once task retries + the manifest's atomic commits =
    exactly-once OUTPUT: a stage that crashes on its first N invocations
    (worker-crash simulation via a shared poison counter) still yields
    byte-identical results."""
    import ray.data as rd

    import ray

    tbl, paths = None, None
    tbl = make_documents(120, monster_spans=200)
    src = tmp_path / "flaky_in"
    src.mkdir()
    paths = []
    for i in range(4):
        p = str(src / f"docs-{i}.parquet")
        pq.write_table(tbl.slice(i * 33, 33), p)
        paths.append(p)

    @ray.remote
    class Poison:
        def __init__(self, n):
            self.left = n

        def take(self) -> bool:
            if self.left > 0:
                self.left -= 1
                return True
            return False

    poison = Poison.remote(3)

    def flaky(batch):
        if ray.get(poison.take.remote()):
            raise RuntimeError("injected transient failure")
        return batch

    from pdfz_ray.pipelines.extract_pipeline import build_extract_pipeline
    from pdfz_ray.stages.extract import flatten_output

    # retry_exceptions opts application errors into Ray's task retries
    # (system/worker failures retry by default)
    ds = rd.read_parquet(paths).map_batches(
        flaky, batch_format="pyarrow", retry_exceptions=True, max_retries=4
    )
    out = build_extract_pipeline(ds, ocr=False)
    flat = out.map_batches(flatten_output, batch_format="pyarrow")
    got = sorted(tuple(r.values()) for r in flat.take_all())
    want = sorted(tuple(r.values()) for r in _oracle_flat(tbl))
    assert got == want


def test_incremental_append_runs_only_new_partitions(ray_session, tmp_path):
    """Incremental ingestion: appending partition-aligned input files to a
    completed run processes ONLY the new partitions (old files_md5 still
    match), and the combined output equals a from-scratch oracle run."""
    from pdfz_ray.pipelines.extract_pipeline import run_partitioned
    from pdfz_ray.stages.extract import flatten_output

    tbl = make_documents(88)  # 8 rows of dup tail → exercises dedup too
    d = tmp_path / "inc"
    d.mkdir()
    paths = []
    for i in range(4):
        p = str(d / f"f{i}.parquet")
        pq.write_table(tbl.slice(i * 24, 24), p)
        paths.append(p)

    out_dir = str(tmp_path / "inc_out")
    res1 = run_partitioned(paths[:2], out_dir, partition_size=1, ocr=False)
    assert res1["partitions_run"] == [0, 1]

    # append two more files; alignment keeps pid 0/1 chunk hashes stable.
    # The dup tail lives in the appended files: cross-partition ownership
    # assigns winners to the (already committed) original partitions, so
    # the new partitions drop the dup rows and first-wins still holds.
    res2 = run_partitioned(paths, out_dir, partition_size=1, ocr=False)
    assert res2["partitions_skipped"] == [0, 1]
    assert res2["partitions_run"] == [2, 3]

    import ray.data as rd

    final = rd.read_parquet(res2["output_files"])
    flat = final.map_batches(flatten_output, batch_format="pyarrow")
    got = sorted(tuple(r.values()) for r in flat.take_all())
    want = sorted(tuple(r.values()) for r in _oracle_flat(tbl))
    assert got == want


def test_write_training_shards_resumable(ray_session, tmp_path):
    """Shard writer: shard union == the curated train split, packing is
    valid per shard, resume skips committed shards, and a parameter
    change invalidates the manifest entries."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.dataset as pds
    import pyarrow.parquet as pq

    import ray.data as rd
    from pdfz_ray.functions.curation import curate_corpus
    from pdfz_ray.pipelines.curation_pipeline import write_training_shards

    rng = np.random.default_rng(11)
    words = [f"w{i}" for i in range(50)]
    rows = []
    for i in range(120):
        toks = rng.choice(words, size=int(rng.integers(3, 30))).tolist()
        rows.append({"doc_id": i, "text": " ".join(toks)})
    rows[30]["text"] = rows[7]["text"]  # exact duplicate → 30 loses to 7
    src = str(tmp_path / "docs.parquet")
    pq.write_table(pa.Table.from_pylist(rows), src)

    out = str(tmp_path / "shards")
    res = write_training_shards(src, out, n_shards=3, budget=64)
    assert sorted(res["ran"]) == [0, 1, 2] and res["skipped"] == []

    shard_tbl = pds.dataset(out, format="parquet").to_table()
    got_ids = sorted(shard_tbl.column("doc_id").to_pylist())
    cur = curate_corpus(
        rd.read_parquet(src, columns=["doc_id", "text"])
    ).to_pandas()
    want_ids = sorted(cur[cur["split"] == "train"]["doc_id"])
    assert got_ids == want_ids
    assert len(got_ids) == len(set(got_ids))  # exactly once across shards
    # packing validity: offsets under budget; per-doc (pack_id, offset)
    # consistent with a doc_id-ordered serial scan within each shard
    df = shard_tbl.to_pandas()
    assert (df["pack_offset"] < 64).all()
    import json

    man = [json.loads(l) for l in open(res["manifest"])]
    assert len(man) == 3
    for m in man:
        sh = df[(df["doc_id"] >= m["doc_lo"]) & (df["doc_id"] < m["doc_hi"])]
        sh = sh.sort_values("doc_id").reset_index(drop=True)
        prev = np.concatenate(([0], np.cumsum(sh["n_tokens"].to_numpy()[:-1])))
        assert (sh["pack_id"].to_numpy() == prev // 64).all()
        assert (sh["pack_offset"].to_numpy() == prev % 64).all()
        assert m["n_docs"] == len(sh)

    # resume: nothing re-runs
    res2 = write_training_shards(src, out, n_shards=3, budget=64)
    assert res2["ran"] == [] and sorted(res2["skipped"]) == [0, 1, 2]

    # changed parameters invalidate the fingerprint → full re-run
    res3 = write_training_shards(src, out, n_shards=3, budget=32)
    assert sorted(res3["ran"]) == [0, 1, 2]

    # an input file rewritten IN PLACE (same path, different content)
    # invalidates the fingerprint too — resume must not keep stale shards
    rows[5]["text"] = "totally new content for doc five"
    pq.write_table(pa.Table.from_pylist(rows), src)
    os.utime(src, (os.path.getatime(src), os.path.getmtime(src) + 2))
    res4 = write_training_shards(src, out, n_shards=3, budget=32)
    assert sorted(res4["ran"]) == [0, 1, 2]


def test_write_training_shards_empty_shard(ray_session, tmp_path):
    """A shard range with zero survivors commits as an empty shard (the
    100k-doc stress surfaced a crash reading the empty dataset's schema)."""
    import json

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdfz_ray.pipelines.curation_pipeline import write_training_shards

    rng = np.random.default_rng(5)
    words = [f"w{i}" for i in range(40)]
    # all docs in [0, 50); ids 1000/1001 park the top of the id space so
    # the upper shard ranges contain no documents at all
    rows = [
        {
            "doc_id": i,
            "text": " ".join(rng.choice(words, size=int(rng.integers(5, 25)))),
        }
        for i in range(50)
    ]
    rows.append({"doc_id": 1000, "text": "lone top doc " + " ".join(words[:9])})
    src = str(tmp_path / "docs.parquet")
    pq.write_table(pa.Table.from_pylist(rows), src)
    out = str(tmp_path / "shards")
    res = write_training_shards(src, out, n_shards=4, budget=64)
    assert sorted(res["ran"]) == [0, 1, 2, 3]
    man = [json.loads(l) for l in open(res["manifest"])]
    assert len(man) == 4
    assert any(m["n_docs"] == 0 for m in man)  # empty shard committed
    res2 = write_training_shards(src, out, n_shards=4, budget=64)
    assert res2["ran"] == [] and len(res2["skipped"]) == 4


def test_write_training_shards_zero_survivor_corpus(ray_session, tmp_path):
    """A corpus where NO document survives curation (here: every doc is
    benchmark-contaminated because all texts share grams with the
    doc_id%23==0 slice) must commit all shards as empty instead of
    crashing on the schema-less empty bucket-totals frame (found by the
    1M-doc stress, whose sequential replica ids swept every text into
    the bench slice)."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdfz_ray.pipelines.curation_pipeline import write_training_shards

    # one shared text → doc 0 is in the bench slice → every doc shares
    # all its grams with the benchmark → all contaminated
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [{"doc_id": i, "text": text} for i in range(30)]
    src = str(tmp_path / "docs.parquet")
    pq.write_table(pa.Table.from_pylist(rows), src)
    out = str(tmp_path / "shards")
    res = write_training_shards(src, out, n_shards=3, budget=64)
    assert sorted(res["ran"]) == [0, 1, 2]
    man = [json.loads(l) for l in open(res["manifest"])]
    assert len(man) == 3 and all(m["n_docs"] == 0 for m in man)
    res2 = write_training_shards(src, out, n_shards=3, budget=64)
    assert res2["ran"] == [] and len(res2["skipped"]) == 3
