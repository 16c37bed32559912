"""Scale-tier stress runs behind the BASELINE.md tables.

Each subcommand replicates the driver sf0.1 tables to a larger tier with
unique ids, runs one operator family, and prints a JSON line of wall
times. Run from /root/repo (workers import pdfz_ray via the driver cwd):

    python scripts/stress.py neardup     # 100k-doc dup-heavy near-dup ops
    python scripts/stress.py curation1m  # 1M-doc curation family + shards
    python scripts/stress.py rarity      # doc_rarity w/ 10^6-term vocab
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
STRESS_ROOT = "/tmp/pdfz_ray_stress"


def replicate_documents(
    replicas: int, out_name: str, n_parts: int = 8, preserve_modulus: int = 0
) -> str:
    """sf0.1 documents × replicas with unique doc_ids (same text → every
    doc is a `replicas`-deep exact-dup group: the adversarial profile).

    ``preserve_modulus=m``: replica offsets are multiples of a
    ceil(n/m)*m stride so doc_id % m is preserved — needed by the
    curation tier, whose benchmark slice is doc_id % 23 == 0: sequential
    offsets would sweep EVERY text into the bench slice and contaminate
    the whole corpus (zero survivors — a real edge, but covered by a
    pytest, not the throughput stress)."""
    d = os.path.join(STRESS_ROOT, out_name)
    marker = os.path.join(d, "_DONE")
    if os.path.exists(marker):
        return d
    os.makedirs(d, exist_ok=True)
    base = pq.read_table(f"{SF_DIR}/documents.parquet")
    n = base.num_rows
    stride = n if preserve_modulus <= 0 else -(-n // preserve_modulus) * preserve_modulus
    # split range(replicas) across parts without dropping the remainder
    # (replicas // n_parts per part silently under-replicated: 20 asked /
    # 8 parts gave 16 — the "100k" corpus was 80k docs)
    splits = np.array_split(np.arange(replicas), min(n_parts, replicas))
    for p, ks in enumerate(splits):
        parts = [
            base.set_column(0, "doc_id", pc.add(base.column("doc_id"), int(k) * stride))
            for k in ks
        ]
        if parts:
            pq.write_table(pa.concat_tables(parts), os.path.join(d, f"part-{p:03d}.parquet"))
    with open(marker, "w") as f:
        f.write("ok\n")
    return d


def timed(timings: dict, name: str, fn):
    t0 = time.perf_counter()
    out = fn()
    timings[name] = round(time.perf_counter() - t0, 2)
    return out


def init_ray():
    import ray

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def neardup():
    """100k-doc adversarial corpus (every text a 20-deep dup group):
    minhash/simhash with the round-3 exact-dedup-first + vectorized
    buckets + distributed pairs (VERDICT r2 next-round #3/#4: simhash
    < 20 s with identical output; minhash not worse than 55.8 s)."""
    ray = init_ray()
    import ray.data as rd

    from pdfz_ray.functions.dedup import (
        exact_dedup_docs,
        minhash_lsh_pairs,
        neardup_dedup_corpus,
        simhash_pairs,
    )

    d = replicate_documents(20, "docs-100k")

    def docs():
        return rd.read_parquet(d, columns=["doc_id", "text"])

    t: dict[str, float] = {}
    out: dict[str, int] = {}
    out["exact_groups"] = timed(t, "exact_dedup", lambda: exact_dedup_docs(docs()).count())
    mh = timed(t, "minhash_lsh", lambda: minhash_lsh_pairs(docs(), threshold=0.2))
    out["minhash_pairs"] = mh.num_rows
    sh = timed(t, "simhash", lambda: simhash_pairs(docs(), max_hamming=3))
    out["simhash_pairs"] = sh.num_rows
    out["neardup_survivors"] = timed(
        t, "neardup_dedup_corpus", lambda: neardup_dedup_corpus(docs(), threshold=0.2).count()
    )
    ray.shutdown()
    print(json.dumps({"stress": "neardup-100k", "timings": t, "outputs": out}))


def curation1m():
    """1M-doc tier for the curation family + training-shard writer
    (VERDICT r2 next-round #8: confirm per-shard startup amortizes)."""
    ray = init_ray()
    import ray.data as rd

    from pdfz_ray.functions.curation import (
        curate_corpus,
        decontaminate,
        pack_sequences,
        pii_redact_batch,
    )
    from pdfz_ray.pipelines.curation_pipeline import write_training_shards

    d = replicate_documents(200, "docs-1m", n_parts=32, preserve_modulus=23)

    def docs():
        return rd.read_parquet(d, columns=["doc_id", "text"])

    t: dict[str, float] = {}
    out: dict[str, int] = {}
    out["decontaminate"] = timed(t, "decontaminate", lambda: decontaminate(docs()).count())
    out["pack_sequences"] = timed(t, "pack_sequences", lambda: pack_sequences(docs()).count())
    out["pii_redact"] = timed(
        t,
        "pii_redact",
        lambda: docs().map_batches(pii_redact_batch, batch_format="pyarrow").count(),
    )
    out["curate_corpus"] = timed(t, "curate_corpus", lambda: curate_corpus(docs(), n=5).count())
    shard_dir = os.path.join(STRESS_ROOT, "shards-1m")
    import shutil

    shutil.rmtree(shard_dir, ignore_errors=True)
    paths = sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
    )
    res = timed(
        t,
        "write_training_shards",
        lambda: write_training_shards(paths, shard_dir, n_shards=32, budget=512),
    )
    out["shards_ran"] = len(res["ran"])
    res2 = timed(
        t,
        "write_training_shards_resume",
        lambda: write_training_shards(paths, shard_dir, n_shards=32, budget=512),
    )
    out["shards_rerun_on_resume"] = len(res2["ran"])
    ray.shutdown()
    print(json.dumps({"stress": "curation-1m", "timings": t, "outputs": out}))


def rarity():
    """doc_rarity with a synthetic 10^6-term vocabulary: df_cap keeps the
    broadcast at the df<=cap tail while output stays identical to the
    uncapped run (VERDICT r2 next-round #6 done-criterion)."""
    ray = init_ray()
    import ray.data as rd

    from pdfz_ray.functions.curation import doc_rarity

    d = os.path.join(STRESS_ROOT, "docs-bigvocab")
    marker = os.path.join(d, "_DONE")
    if not os.path.exists(marker):
        os.makedirs(d, exist_ok=True)
        rng = np.random.default_rng(42)
        n_docs, vocab, toks_per_doc = 50_000, 1_000_000, 40
        for p in range(8):
            lo = p * (n_docs // 8)
            ids = np.arange(lo, lo + n_docs // 8, dtype=np.int64)
            # Zipf-ish mix: half the tokens from a hot head, half uniform
            # over the full vocab → a long df=1 tail plus common terms
            head = rng.integers(0, 5_000, (len(ids), toks_per_doc // 2))
            tail = rng.integers(0, vocab, (len(ids), toks_per_doc // 2))
            words = np.concatenate([head, tail], axis=1)
            texts = [" ".join(f"w{w}" for w in row) for row in words]
            pq.write_table(
                pa.Table.from_arrays(
                    [pa.array(ids), pa.array(texts, pa.string())],
                    names=["doc_id", "text"],
                ),
                os.path.join(d, f"part-{p:03d}.parquet"),
            )
        with open(marker, "w") as f:
            f.write("ok\n")

    def docs():
        return rd.read_parquet(d)

    t: dict[str, float] = {}
    full = timed(t, "uncapped", lambda: doc_rarity(docs()).to_pandas())
    capped = timed(t, "df_cap_4", lambda: doc_rarity(docs(), df_cap=4).to_pandas())
    key = lambda df: df.sort_values("doc_id").reset_index(drop=True)  # noqa: E731
    same = key(full).equals(key(capped))
    # broadcast bound: count terms at df<=4 vs total vocab
    import duckdb

    con = duckdb.connect()
    stats = con.execute(
        f"""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
             FROM read_parquet('{d}/*.parquet')),
           dt AS (SELECT DISTINCT doc_id, term FROM toks),
           df AS (SELECT term, count(*) AS df FROM dt GROUP BY term)
           SELECT count(*) AS vocab,
                  sum(CASE WHEN df <= 4 THEN 1 ELSE 0 END) AS under_cap
           FROM df"""
    ).fetchone()
    ray.shutdown()
    print(
        json.dumps(
            {
                "stress": "rarity-bigvocab",
                "timings": t,
                "identical_output": bool(same),
                "rows": len(full),
                "vocab_terms": int(stats[0]),
                "broadcast_terms_at_cap4": int(stats[1]),
            }
        )
    )


def round3():
    """Round-3 operator tier: the passage family on the 1M-doc 200-deep
    dup corpus (adversarial: EVERY window is common, the broadcast set is
    the full distinct-window inventory of the base corpus and the removal
    pass excises nearly all tokens), the global shuffle rank at 10M rows,
    and the HTML main-content stage over a 200k-page corpus."""
    ray = init_ray()
    import ray.data as rd

    from pdfz_ray.functions.curation import (
        passage_dedup_corpus,
        passage_stats,
        shuffle_rank,
    )
    from pdfz_ray.stages.html import main_content_batch, make_html_corpus

    d = replicate_documents(200, "docs-1m", n_parts=32, preserve_modulus=23)

    def docs():
        return rd.read_parquet(d, columns=["doc_id", "text"])

    t: dict[str, float] = {}
    out: dict[str, int] = {}
    out["passage_stats"] = timed(
        t, "passage_stats_1m", lambda: passage_stats(docs()).count()
    )
    out["passage_dedup_survivors"] = timed(
        t, "passage_dedup_1m", lambda: passage_dedup_corpus(docs()).count()
    )
    out["shuffle_rank"] = timed(
        t,
        "shuffle_rank_10m",
        lambda: shuffle_rank(
            rd.range(10_000_000).map_batches(
                lambda b: pa.Table.from_arrays([b.column("id")], names=["doc_id"]),
                batch_format="pyarrow",
            ),
            bucket_hex_digits=3,
        ).count(),
    )

    # 200k-page HTML corpus: generate once from the sf0.1 documents table,
    # replicate 4x with distinct ids
    hd = os.path.join(STRESS_ROOT, "html-200k")
    marker = os.path.join(hd, "_DONE")
    if not os.path.exists(marker):
        os.makedirs(hd, exist_ok=True)
        base = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
        pages = make_html_corpus(base)
        n = base.num_rows
        for k in range(4):
            pq.write_table(
                pages.set_column(
                    0, "doc_id", pc.add(pages.column("doc_id"), k * n)
                ),
                os.path.join(hd, f"part-{k:02d}.parquet"),
            )
        with open(marker, "w") as f:
            f.write("ok\n")
    out["html_pages"] = timed(
        t,
        "html_main_content_200k",
        lambda: rd.read_parquet(hd)
        .map_batches(main_content_batch, batch_format="pyarrow")
        .count(),
    )
    ray.shutdown()
    print(json.dumps({"stress": "round3", "timings": t, "outputs": out}))


def passage_sharded():
    """Passage family forced onto the sharded common-set path (r3
    next-round #9): the 1M-doc 200-deep dup corpus has a ~240k-hash
    common set; broadcast_limit=10k pushes both operators through the
    hash-partitioned merge instead of the driver broadcast."""
    ray = init_ray()
    import ray.data as rd

    from pdfz_ray.functions.curation import passage_dedup_corpus, passage_stats

    d = replicate_documents(200, "docs-1m", n_parts=32, preserve_modulus=23)

    def docs():
        return rd.read_parquet(d, columns=["doc_id", "text"])

    t: dict[str, float] = {}
    out: dict[str, int] = {}
    out["stats_rows"] = timed(
        t,
        "passage_stats_1m_sharded",
        lambda: passage_stats(docs(), broadcast_limit=10_000).count(),
    )
    out["dedup_rows"] = timed(
        t,
        "passage_dedup_1m_sharded",
        lambda: passage_dedup_corpus(docs(), broadcast_limit=10_000).count(),
    )
    ray.shutdown()
    print(json.dumps({"stress": "passage-sharded-1m", "timings": t, "outputs": out}))


def windows1m():
    """1M-event tier for the bucketed window family (VERDICT r3
    next-round #4): sf0.1 events × 10 with unique event_ids and the SAME
    user population, so every user's history is 10× deeper — the shape
    that killed the per-user map_groups granularity. All three ops run
    through the bounded ``user_id % B`` shuffle key with fully
    vectorized per-bucket kernels."""
    ray = init_ray()

    from pdfz_ray.functions.windows import (
        asof_join_events,
        asof_join_events_ds,
        running_event_counts,
        running_event_counts_ds,
        sessionize_bucketed,
        sessionize_bucketed_ds,
    )

    d = os.path.join(STRESS_ROOT, "events-1m")
    marker = os.path.join(d, "_DONE")
    if not os.path.exists(marker):
        os.makedirs(d, exist_ok=True)
        base = pq.read_table(f"{SF_DIR}/events.parquet")
        n = base.num_rows
        i = base.column_names.index("event_id")
        parts = [
            base.set_column(i, "event_id", pc.add(base.column("event_id"), k * n))
            for k in range(10)
        ]
        pq.write_table(pa.concat_tables(parts), os.path.join(d, "events.parquet"))
        with open(marker, "w") as f:
            f.write("ok\n")

    t: dict[str, float] = {}
    out: dict[str, int] = {}
    # untimed session warmup: the first timed op otherwise pays worker
    # spin-up + module import (~4 s on this host) and gets misattributed
    running_event_counts_ds(d).count()
    # production (non-collecting) variants first: Dataset consumed with
    # count() — the operator cost WITHOUT the driver collect (VERDICT r4
    # next-round #6: the r4 1M running-counts number carried ~7.7 s of
    # driver-side to_pandas that belongs to the query boundary, not the
    # operator)
    out["running_rows"] = timed(
        t, "running_event_counts_1m_ds", lambda: running_event_counts_ds(d).count()
    )
    out["asof_rows"] = timed(
        t, "asof_join_1m_ds", lambda: asof_join_events_ds(d).count()
    )
    out["sessions"] = timed(
        t, "sessionize_bucketed_1m_ds", lambda: sessionize_bucketed_ds(d).count()
    )
    # collecting wrappers, for the operator+collect comparison line
    timed(t, "running_event_counts_1m", lambda: len(running_event_counts(d)))
    timed(t, "asof_join_1m", lambda: len(asof_join_events(d)))
    timed(t, "sessionize_bucketed_1m", lambda: len(sessionize_bucketed(d)))
    ray.shutdown()
    print(json.dumps({"stress": "windows-1m", "timings": t, "outputs": out}))


def prep1m():
    """Round-4 prep-operator tier: 1M-doc chunking / bigram / TF-IDF and
    SemDeDup over 128k vectors (64× replicated sf0.1 embeddings — every
    vector a 64-deep exact-dup group, the adversarial profile; 64 clusters
    keeps Σ|cluster|² matmuls ~2k-row, the paper's n/1e4 shape)."""
    ray = init_ray()
    import ray.data as rd

    from pdfz_ray.functions.dedup import semantic_dedup
    from pdfz_ray.functions.prep import bigram_top, chunk_documents, tfidf_topk

    d = replicate_documents(200, "docs-1m")

    # embeddings × 64 with unique vec_ids (same replicate pattern)
    e_dir = os.path.join(STRESS_ROOT, "emb-128k")
    marker = os.path.join(e_dir, "_DONE")
    if not os.path.exists(marker):
        os.makedirs(e_dir, exist_ok=True)
        base = pq.read_table(f"{SF_DIR}/embeddings.parquet")
        n = base.num_rows
        vid = base.schema.get_field_index("vec_id")
        for p, ks in enumerate(np.array_split(np.arange(64), 8)):
            parts = [
                base.set_column(
                    vid, "vec_id", pc.add(base.column("vec_id"), int(k) * n)
                )
                for k in ks
            ]
            pq.write_table(
                pa.concat_tables(parts), os.path.join(e_dir, f"part-{p:03d}.parquet")
            )
        with open(marker, "w") as f:
            f.write("ok\n")

    t: dict[str, float] = {}
    out: dict[str, int] = {}
    out["chunks"] = timed(
        t,
        "chunk_1m",
        lambda: chunk_documents(rd.read_parquet(d, columns=["doc_id", "text"])).count(),
    )
    out["bigrams"] = timed(
        t, "bigram_1m", lambda: bigram_top(SF_DIR, k=20, docs_path=d)
    ).shape[0]
    out["tfidf_rows"] = timed(
        t, "tfidf_1m", lambda: len(tfidf_topk(SF_DIR, k=3, docs_path=d))
    )
    from pdfz_ray.functions.prep import lm_coverage

    out["lm_rows"] = timed(
        t, "lm_coverage_1m", lambda: len(lm_coverage(SF_DIR, docs_path=d))
    )
    sd = timed(
        t,
        "semantic_128k",
        lambda: semantic_dedup(
            rd.read_parquet(e_dir), n_clusters=64, threshold=0.45
        ),
    )
    out["semantic_rows"] = sd.num_rows
    out["semantic_dropped"] = int(
        pc.sum(pc.cast(sd.column("dropped"), pa.int64())).as_py()
    )
    # round-5 cluster-size cap (VERDICT r4 next-round #5): force the
    # degenerate one-giant-cluster profile (n_clusters=1 over 128k
    # vectors, every one a 64-deep exact-dup) with a small cap so the LSH
    # sub-shard + survivor paths carry the whole tier — the uncapped
    # equivalent is a 128k x 128k matmul
    sd_cap = timed(
        t,
        "semantic_128k_one_cluster_cap8k",
        lambda: semantic_dedup(
            rd.read_parquet(e_dir),
            n_clusters=1,
            threshold=0.45,
            cluster_cap=8192,
        ),
    )
    out["semantic_capped_dropped"] = int(
        pc.sum(pc.cast(sd_cap.column("dropped"), pa.int64())).as_py()
    )
    ray.shutdown()
    print(json.dumps({"stress": "prep-1m", "timings": t, "outputs": out}))


if __name__ == "__main__":
    {
        "neardup": neardup,
        "curation1m": curation1m,
        "rarity": rarity,
        "round3": round3,
        "windows1m": windows1m,
        "passage_sharded": passage_sharded,
        "prep1m": prep1m,
    }[sys.argv[1]]()
