"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "docs_per_sec": ..., "pages_per_sec": ...}

Env:
  GRAFT_SF_DIR     input sf dir (default /root/testdata/sf0.1)
  RAY_GRAFT_CPUS   num_cpus for ray.init (default 32)
  BENCH_DOCS       synthetic interleaved corpus size (default 20000)

--scaling: runs the bench twice in fresh processes (8 and 32 CPUs) on the
same input and reports both throughputs + scaling efficiency (the sandbox
substitute for the N vs 4N node criterion — see BASELINE.md).

--scaling-protocol: the BASELINE.md measurement protocol — repeats the
8→32 and 4→16 pairs until 4 runs per pair are healthy (every kept
extract trial passed the calibration-burn gate on both legs) and prints
every run plus the MEDIAN efficiency over healthy runs.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

BENCH_ROOT = "/tmp/pdfz_ray_bench"  # corpus cache (disk; page-cache warmed)
SHM_ROOT = "/dev/shm/pdfz_ray_bench"  # run output (tmpfs — see hygiene note)


def ensure_bench_corpus(
    n_docs: int, replicas: int, seed: int = 42
) -> list[str]:
    """Deterministic interleaved corpus at benchmark scale.

    A python-generated base corpus (all fixture families) is replicated
    ``replicas``× with vectorized doc_id prefixing — one parquet shard per
    replica. Only replica 0 carries the duplicate-id tail, keeping the dup
    rate ≪ 1% (the design assumption of the dedup path). Cached on disk so
    every parallelism level reads byte-identical input.
    """
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    d = os.path.join(BENCH_ROOT, f"docs-{n_docs}x{replicas}-{seed}")
    marker = os.path.join(d, "_DONE")
    paths = [os.path.join(d, f"part-{k:04d}.parquet") for k in range(replicas)]
    if os.path.exists(marker):
        return paths
    from pdfz_ray.corpus import make_documents

    os.makedirs(d, exist_ok=True)
    base = make_documents(n_docs, seed=seed, monster_spans=800)
    ids = base.column("doc_id").combine_chunks()
    for k, p in enumerate(paths):
        tbl = base if k == 0 else base.slice(0, n_docs)
        rid = ids if k == 0 else ids.slice(0, n_docs)
        new_ids = pc.binary_join_element_wise(f"r{k:03d}-", rid, "")
        pq.write_table(tbl.set_column(0, "doc_id", new_ids), p)
    with open(marker, "w") as f:
        f.write("ok\n")
    return paths


def gated_extract_trials(
    do_extract,
    out_dir: str,
    n_trials: int,
    burn_gate: float,
    max_attempts: int,
    burn,
    sleep=time.sleep,
) -> dict:
    """Burn-gated trial loop (shared-VM measurement hygiene).

    Each trial is bracketed by single-core calibration burns; a burn above
    ``burn_gate`` marks a stolen-host window and the trial is DISCARDED
    and re-run (bounded attempts). Invariant (the round-4 driver-bench
    post-mortem): ``out_dir`` is cleared only AFTER the pre-trial burn
    passes and immediately re-populated by ``do_extract``, so on return
    ``out_dir`` always holds the output of the last extract that ran —
    even when the final attempts were all rejected at the pre-trial gate.
    """
    import shutil

    extract_trials: list[float] = []
    calib: list[float] = []
    discarded_trials: list[float] = []
    discarded_burns: list[float] = []
    attempts = 0
    while len(extract_trials) < n_trials and attempts < max_attempts:
        attempts += 1
        b0 = burn()
        if b0 > burn_gate:
            discarded_burns.append(b0)
            sleep(3)  # let the steal window pass before retrying
            continue
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.perf_counter()
        do_extract()
        dt = round(time.perf_counter() - t0, 3)
        b1 = burn()
        if b1 > burn_gate:
            discarded_trials.append(dt)
            discarded_burns.append(b1)
            continue
        extract_trials.append(dt)
        calib.extend([b0, b1])
    if not extract_trials:
        # every attempt hit a stolen window — report the discarded trials
        # honestly rather than dying (the JSON marks them as unhealthy)
        extract_trials = discarded_trials or [float("nan")]
    if not os.path.exists(out_dir):
        # every attempt was rejected at the pre-trial gate (out_dir holds
        # whatever preceded the loop, normally the warmup output) AND no
        # prior pass left output: re-run one untimed extract so the metric
        # readback never dies on a missing directory
        do_extract()
    return {
        "extract_trials_sec": extract_trials,
        "calibration_burn_sec": calib,
        "discarded_trials_sec": discarded_trials,
        "discarded_burns_sec": discarded_burns,
    }


def run_bench(sf_dir: str, num_cpus: int, n_docs: int, replicas: int) -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
        # keep worker stdout/stderr OFF this process's stdout: a stray
        # forwarded worker log line around the final JSON print would
        # break the driver's (and run_scaling's) last-line JSON parse —
        # one leaked into a round-5 run's stdout ahead of the JSON
        log_to_driver=False,
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import pyarrow as pa
    import pyarrow.dataset as pads
    import ray.data as rd

    # the sandbox exports OMP_NUM_THREADS=1 which caps Arrow's driver-side
    # thread pool; driver-side scans (winner rows, metrics) should parallel
    pa.set_cpu_count(num_cpus)
    pa.set_io_thread_count(max(8, num_cpus))

    corpus = ensure_bench_corpus(n_docs, replicas)
    # warm the page cache so we measure compute + shuffle, not first I/O
    for p in corpus:
        with open(p, "rb") as f:
            while f.read(1 << 22):
                pass
    # spin up the worker pool untimed (cluster startup isn't steady-state
    # throughput; a real N-node cluster is already running when jobs land)
    rd.range(num_cpus * 4).map_batches(
        lambda b: b, batch_format="pyarrow", batch_size=1
    ).materialize()
    os.sync()  # flush dirty pages from corpus generation / previous runs

    timings: dict[str, float] = {}

    def timed(name: str, fn):
        t0 = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        return out

    # 1) flagship extraction: read → dedup → extract → OCR → write.
    # Measurement hygiene (the round-2 regression post-mortem):
    # - output goes to tmpfs (/dev/shm): the disk-backed /tmp writeback of
    #   ~4 GB used to bleed into the timed run AND into every op after it
    #   (a real cluster writes to distributed storage with its own
    #   bandwidth; the number targets compute+shuffle throughput);
    # - best-of-2 in-process trials with the per-trial spread recorded:
    #   this host is a shared VM — /proc/stat shows 1–8% steal that comes
    #   and goes in minutes-long windows, swinging wall time up to 2×;
    # - a single-core calibration burn brackets the run so a slow-host
    #   window is visible in the recorded JSON;
    # - extract_to_dir writes the dedup winners as a side file instead of
    #   a Dataset.union: the UnionOperator un-fused map→write and cost
    #   ~25% idle (measured; see extract_to_dir docstring).
    def _burn() -> float:
        t0 = time.perf_counter()
        x = 0
        for i in range(5_000_000):
            x += i * i
        return round(time.perf_counter() - t0, 3)

    from pdfz_ray.pipelines.extract_pipeline import extract_to_dir

    out_dir = os.path.join(SHM_ROOT, f"out-{num_cpus}")
    import shutil

    # Burn-gated trials (VERDICT r3 next-round #1): each trial is
    # bracketed by single-core calibration burns; a burn above
    # BENCH_BURN_GATE marks a stolen-host window (shared VM) and the
    # trial is DISCARDED and re-run (bounded attempts), so the recorded
    # trials measure the pipeline, not the neighbor's workload. Kept
    # trials, their burns, and the discard count all land in the JSON.
    n_trials = int(os.environ.get("BENCH_EXTRACT_TRIALS", "3"))
    burn_gate = float(os.environ.get("BENCH_BURN_GATE", "0.35"))
    max_attempts = n_trials * 3

    # UNTIMED warmups. (a) One-shard extract: the trivial pool pre-spin
    # above does not make workers import the pipeline modules — the
    # first real extract used to pay ~20 s of per-worker import/JIT and
    # inflate the trial spread (r3: [103, 48]). (b) Full-corpus read:
    # plasma allocates object-store pages lazily, so the first trial
    # otherwise pays the zero-fill for ~6 GB of fresh store memory.
    warm_dir = os.path.join(SHM_ROOT, f"warm-{num_cpus}")
    extract_to_dir(corpus[:1], warm_dir, ocr=True, batch_size=2048)
    shutil.rmtree(warm_dir, ignore_errors=True)
    rd.read_parquet(corpus).map_batches(
        lambda t: t.slice(0, 1), batch_format="pyarrow"
    ).count()
    # (c) One FULL untimed pipeline pass: the one-shard warmup only makes
    # the handful of workers it schedules import the pipeline — at 32
    # CPUs the first timed trial still paid per-worker import plus
    # first-touch of the ~19 GB tmpfs output on the remaining workers
    # (measured: kept trials [49.1, 35.5, 33.3] — a 47% spread with
    # healthy burns on every trial, so it is cold state, not host steal).
    # The warmup's wall time is recorded in the JSON, never hidden.
    t0 = time.perf_counter()
    extract_to_dir(corpus, out_dir, ocr=True, batch_size=2048)
    warmup_extract_sec = round(time.perf_counter() - t0, 3)
    # OCR runs in task mode (per-worker engine cache): an actor pool
    # would fuse the whole read→extract chain onto its reserved CPUs
    # and cap parallelism at the pool size (measured 3× slower here).
    trials = gated_extract_trials(
        lambda: extract_to_dir(corpus, out_dir, ocr=True, batch_size=2048),
        out_dir,
        n_trials=n_trials,
        burn_gate=burn_gate,
        max_attempts=max_attempts,
        burn=_burn,
    )
    extract_trials = trials["extract_trials_sec"]
    calib = trials["calibration_burn_sec"]
    discarded_trials = trials["discarded_trials_sec"]
    discarded_burns = trials["discarded_burns_sec"]
    timings["extract"] = min(extract_trials)

    # untimed: docs/pages for throughput from the narrow metric columns
    # (gated_extract_trials guarantees out_dir holds extract output here)
    mt = pads.dataset(out_dir, format="parquet").to_table(
        columns=["status", "pages"]
    )
    import pyarrow.compute as pc

    docs_done = int(
        pc.sum(pc.equal(mt.column("status"), "done").cast("int64")).as_py() or 0
    )
    pages = int(pc.sum(mt.column("pages")).as_py() or 0)
    shutil.rmtree(out_dir, ignore_errors=True)  # free the tmpfs footprint

    # extract-only mode for --scaling-protocol legs: the scaling metric
    # uses only the extract pipeline; skipping the per-op suite halves a
    # low-CPU leg's wall time without touching what is measured
    if os.environ.get("BENCH_EXTRACT_ONLY"):
        ray.shutdown()
        total = round(sum(timings.values()), 3)
        return {
            "metric": "pdfz_ray extract pipeline (extract-only mode)",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": os.path.basename(os.path.normpath(sf_dir)),
            "num_cpus": num_cpus,
            "bench_docs": n_docs * replicas,
            "docs_done": docs_done,
            "pages": pages,
            "docs_per_sec": round(docs_done / timings["extract"], 2),
            "pages_per_sec": round(pages / timings["extract"], 2),
            "warmup_extract_sec": warmup_extract_sec,
            "extract_trials_sec": extract_trials,
            "calibration_burn_sec": calib,
            "burn_gate_sec": burn_gate,
            "discarded_trials_sec": discarded_trials,
            "discarded_burns_sec": discarded_burns,
        }

    # 2) exact dedup over the driver documents table
    from pdfz_ray.functions.dedup import exact_dedup_docs, minhash_lsh_pairs

    def _docs():
        return rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )

    timed("exact_dedup", lambda: exact_dedup_docs(_docs()).to_pandas())

    # 3) minhash-LSH near-dup
    timed("minhash_lsh", lambda: minhash_lsh_pairs(_docs(), threshold=0.2))

    # 4) ANN brute-force top-k
    from pdfz_ray.functions.similarity import knn_brute, load_query_matrix

    ids, mat = load_query_matrix(sf_dir, n_queries=16)
    timed(
        "knn_brute",
        lambda: knn_brute(rd.read_parquet(f"{sf_dir}/embeddings.parquet"), mat, ids, k=10),
    )

    # 5) wide-op analytics
    from pdfz_ray.functions.analytics import events_hourly, lineitem_pricing_summary

    timed("lineitem_pricing", lambda: lineitem_pricing_summary(sf_dir))
    timed("events_hourly", lambda: events_hourly(sf_dir))

    # 6) content-key kernels (round-1 perf-weak set, now vectorized)
    from pdfz_ray.functions.dedup import simhash_sign_task
    from pdfz_ray.functions.text import fingerprint_batch, winnow_batch

    timed(
        "fingerprint",
        lambda: _docs().map_batches(fingerprint_batch, batch_format="pyarrow").count(),
    )
    timed(
        "winnow",
        lambda: _docs().map_batches(winnow_batch, batch_format="pyarrow").count(),
    )
    timed(
        "simhash_sign",
        lambda: _docs().map_batches(simhash_sign_task, batch_format="pyarrow").count(),
    )

    # 7) corpus curation (round-2 additions): contamination scan against a
    # broadcast benchmark gram set, distributed prefix-scan packing, RE2
    # PII sweep, and the Q5-shaped three-table join
    from pdfz_ray.functions.analytics import revenue_by_nation
    from pdfz_ray.functions.curation import (
        decontaminate,
        pack_sequences,
        pii_redact_batch,
    )

    timed("decontaminate", lambda: decontaminate(_docs()).count())
    timed("pack_sequences", lambda: pack_sequences(_docs()).count())
    from pdfz_ray.functions.curation import curate_corpus

    timed("curate_corpus", lambda: curate_corpus(_docs(), n=5).count())
    timed(
        "pii_redact",
        lambda: _docs()
        .map_batches(pii_redact_batch, batch_format="pyarrow")
        .count(),
    )
    timed("revenue_by_nation", lambda: revenue_by_nation(sf_dir))

    # 8) round-3 curation ops: passage-level substring-dup stats (window
    # fingerprints → bounded groupby → broadcast membership) and the
    # global deterministic shuffle rank (hash-range-partitioned
    # zipWithIndex — the one intentional all-to-all here)
    from pdfz_ray.functions.curation import passage_stats, shuffle_rank

    timed("passage_stats", lambda: passage_stats(_docs(), n=5, min_docs=2).count())
    timed(
        "shuffle_rank",
        lambda: shuffle_rank(
            rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
        ).count(),
    )

    # 9) round-4 prep ops: RAG token-window chunking (narrow flat
    # expansion, no shuffle) and per-doc TF-IDF (vocab-sized df broadcast
    # + in-batch doc-local top-k)
    from pdfz_ray.functions.prep import chunk_documents, tfidf_topk

    timed("chunk_docs", lambda: chunk_documents(_docs()).count())
    timed("tfidf_topk", lambda: len(tfidf_topk(sf_dir, k=3)))

    # kernel-level speedup: vectorized mod-2^64 poly hash vs the round-1
    # per-byte Python loop (mod 2^61-1), same normalized input, driver-side
    def _kernel_speedup() -> float:
        import pyarrow.compute as pcc
        import pyarrow.parquet as pq

        from pdfz_ray.functions.text import poly64_array

        t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
        t = pa.concat_tables([t] * 8)  # amortize fixed numpy overheads
        low = pcc.utf8_lower(t.column("text"))
        norm = pcc.replace_substring_regex(
            low, pattern=r"\s+", replacement=" "
        ).combine_chunks()

        def loop_r1(s: str, base: int = 1_000_003, mod: int = (1 << 61) - 1) -> int:
            h = 0
            for ch in s.encode():
                h = (h * base + ch) % mod
            return h

        poly64_array(norm)  # warm page allocations
        t0 = time.perf_counter()
        poly64_array(norm)
        vec = time.perf_counter() - t0
        t0 = time.perf_counter()
        for s in norm.to_pylist():
            loop_r1(s)
        loop = time.perf_counter() - t0
        return round(loop / vec, 1)

    kernel_speedup = _kernel_speedup()

    ray.shutdown()

    total = round(sum(timings.values()), 3)
    return {
        "metric": "pdfz_ray headline pipelines (extract+dedup+ann+analytics)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": os.path.basename(os.path.normpath(sf_dir)),
        "num_cpus": num_cpus,
        "bench_docs": n_docs * replicas,
        "docs_done": docs_done,
        "pages": pages,
        "docs_per_sec": round(docs_done / timings["extract"], 2),
        "pages_per_sec": round(pages / timings["extract"], 2),
        # kept (healthy-burn) extract trials — best is the headline — plus
        # the burns that bracketed them; discarded_* records trials/burns
        # rejected by the gate so host-steal windows are visible, not
        # silently folded into the spread (see BASELINE.md protocol)
        "warmup_extract_sec": warmup_extract_sec,
        "extract_trials_sec": extract_trials,
        "calibration_burn_sec": calib,
        "burn_gate_sec": burn_gate,
        "discarded_trials_sec": discarded_trials,
        "discarded_burns_sec": discarded_burns,
        "poly64_kernel_speedup_vs_r1_loop": kernel_speedup,
    }


def run_scaling(sf_dir: str, n_docs: int, replicas: int, lo: int = 8, hi: int = 32) -> dict:
    """Best-of-N trials per level. Each subprocess already runs
    BENCH_EXTRACT_TRIALS (default 2) in-process extract trials and reports
    the per-trial spread, so one subprocess per level suffices; raise
    BENCH_TRIALS for extra whole-process repeats."""
    trials = int(os.environ.get("BENCH_TRIALS", "1"))

    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=sf_dir,
                   BENCH_DOCS=str(n_docs), BENCH_REPLICAS=str(replicas))
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        if proc.returncode != 0:
            # surface the leg's actual failure instead of a bare
            # CalledProcessError with captured (hidden) stderr; the
            # protocol runner records this and moves to the next run
            raise RuntimeError(
                f"{ncpu}-cpu leg exited {proc.returncode}: "
                + proc.stderr.strip()[-2000:]
            )
        return json.loads(proc.stdout.strip().splitlines()[-1])

    def best(ncpu: int) -> tuple[dict, list[float]]:
        runs = [one(ncpu) for _ in range(trials)]
        # per-trial throughput spread across every in-process extract trial
        # of every subprocess run (pages / trial seconds)
        spread = sorted(
            round(r["pages"] / t, 2)
            for r in runs
            for t in r.get("extract_trials_sec", [r["queries"]["extract"]])
        )
        return max(runs, key=lambda r: r["pages_per_sec"]), spread

    ensure_bench_corpus(n_docs, replicas)  # build once, shared by both runs
    (r_lo, spread_lo), (r_hi, spread_hi) = best(lo), best(hi)
    thr_lo = r_lo["pages_per_sec"]
    thr_hi = r_hi["pages_per_sec"]
    eff = (thr_hi / thr_lo) / (hi / lo)
    return {
        "metric": "scaling efficiency (pages/sec, extract pipeline)",
        "cpus_lo": lo,
        "cpus_hi": hi,
        "sec_lo": r_lo["queries"]["extract"],
        "sec_hi": r_hi["queries"]["extract"],
        "pages_per_sec_lo": thr_lo,
        "pages_per_sec_hi": thr_hi,
        # full per-trial throughputs: best-of-N is capability, the spread
        # shows the shared-VM host variance behind it (see BASELINE.md)
        "pages_per_sec_lo_trials": spread_lo,
        "pages_per_sec_hi_trials": spread_hi,
        "total_sec_lo": r_lo["value"],
        "total_sec_hi": r_hi["value"],
        # single-core calibration burns from each leg's subprocess: ~0.25 s
        # is a healthy host; 0.35+ marks a stolen-CPU window, which hits
        # the hi leg disproportionately (no spare cores absorb the steal)
        # and depresses measured efficiency — compare legs' burns before
        # trusting a low efficiency number
        "calibration_burn_sec_lo": r_lo.get("calibration_burn_sec", []),
        "calibration_burn_sec_hi": r_hi.get("calibration_burn_sec", []),
        "discarded_lo": len(r_lo.get("discarded_burns_sec", [])),
        "discarded_hi": len(r_hi.get("discarded_burns_sec", [])),
        # healthy = both legs kept >= 1 burn-gated trial (the in-process
        # gate guarantees kept burns < gate; an empty calib list means the
        # leg fell back to discarded trials — an unhealthy run)
        "healthy": bool(r_lo.get("calibration_burn_sec"))
        and bool(r_hi.get("calibration_burn_sec")),
        "scaling_efficiency": round(eff, 3),
    }


def run_scaling_protocol(
    sf_dir: str,
    n_docs: int,
    replicas: int,
    pairs: tuple = ((8, 32), (4, 16)),
    n_healthy: int = 4,
    max_runs_per_pair: int = 7,
) -> dict:
    """The stated scaling-measurement protocol (VERDICT r3 next-round #2):
    repeat each lo→hi pair until ``n_healthy`` runs are healthy — every
    kept extract trial on BOTH legs passed the calibration-burn gate —
    and report each run plus the MEDIAN efficiency over the healthy ones
    (never a best-of-day composite). Unhealthy runs stay on the record,
    flagged, excluded from the median."""
    import statistics

    out: dict = {
        "metric": "scaling efficiency protocol (median over healthy runs)",
        "burn_gate_sec": float(os.environ.get("BENCH_BURN_GATE", "0.35")),
        "n_healthy_target": n_healthy,
        "pairs": {},
    }
    ensure_bench_corpus(n_docs, replicas)
    for lo, hi in pairs:
        runs: list[dict] = []
        n_ok = 0
        while n_ok < n_healthy and len(runs) < max_runs_per_pair:
            try:
                r = run_scaling(sf_dir, n_docs, replicas, lo, hi)
            except RuntimeError as ex:
                # a leg subprocess died (host OOM / contention window):
                # record the failure as an unhealthy run and keep going —
                # one bad window must not void the whole protocol
                rec = {"healthy": False, "error": str(ex)[:500]}
                runs.append(rec)
                print(json.dumps({"pair": f"{lo}->{hi}", **rec}), file=sys.stderr)
                continue
            rec = {
                "efficiency": r["scaling_efficiency"],
                "pages_per_sec_lo": r["pages_per_sec_lo"],
                "pages_per_sec_hi": r["pages_per_sec_hi"],
                "sec_lo": r["sec_lo"],
                "sec_hi": r["sec_hi"],
                "burns_lo": r["calibration_burn_sec_lo"],
                "burns_hi": r["calibration_burn_sec_hi"],
                "discards": [r["discarded_lo"], r["discarded_hi"]],
                "healthy": r["healthy"],
            }
            runs.append(rec)
            n_ok += int(rec["healthy"])
            print(json.dumps({"pair": f"{lo}->{hi}", **rec}), file=sys.stderr)
        effs = sorted(x["efficiency"] for x in runs if x["healthy"])
        out["pairs"][f"{lo}->{hi}"] = {
            "runs": runs,
            "n_healthy": len(effs),
            "median_efficiency_healthy": (
                round(statistics.median(effs), 3) if effs else None
            ),
        }
    return out


if __name__ == "__main__":
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    n_docs = int(os.environ.get("BENCH_DOCS", "60000"))
    replicas = int(os.environ.get("BENCH_REPLICAS", "150"))
    if "--scaling-protocol" in sys.argv:
        n_h = int(os.environ.get("BENCH_PROTOCOL_HEALTHY", "4"))
        print(
            json.dumps(
                run_scaling_protocol(sf_dir, n_docs, replicas, n_healthy=n_h)
            )
        )
    elif "--scaling" in sys.argv:
        lo = int(os.environ.get("BENCH_SCALING_LO", "8"))
        hi = int(os.environ.get("BENCH_SCALING_HI", "32"))
        print(json.dumps(run_scaling(sf_dir, n_docs, replicas, lo, hi)))
    else:
        print(json.dumps(run_bench(sf_dir, ncpu, n_docs, replicas)))
