"""Flagship extraction pipeline: read → dedup → extract → OCR → write.

The Ray-Data-native re-expression of the reference's whole system
(SURVEY.md §3.1 trace): the RabbitMQ queue + semaphore + tokio tasks become
the streaming executor's backpressured block scheduling; Redis
status/progress becomes lineage columns + the per-partition manifest; the
per-doc JSON files become one partitioned Parquet dataset.

Scale notes (the 100 TB design points):
- exact dedup never shuffles payloads: a column-pruned id scan finds the
  (rare) duplicated ids, which are broadcast as a set; only those rows take
  the groupby path, everything else streams through untouched;
- the jobs table is broadcast once via ``ray.put`` and read per actor/task,
  never re-shipped per batch;
- the OCR stage is an actor pool sized independently of the parse stage so
  a slow model can't idle the cheap extract tasks (the reference's shared
  single Ollama is exactly this bottleneck, docker-compose.yml:86-98);
- output is committed per input partition (atomic rename + manifest line),
  so a resumed run skips finished partitions exactly.
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..jobs import jobs_table_to_lookup
from ..oracle import Job
from ..stages.engines import OcrStage
from ..stages.extract import extract_batch, flatten_output
from ..state.manifest import Manifest


def dedup_within_batch(batch: pa.Table) -> pa.Table:
    """First-wins doc_id dedup inside one batch (vectorized pre-pass)."""
    import pandas as pd

    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    dup = pd.Index(ids).duplicated(keep="first")
    if not dup.any():
        return batch
    return batch.filter(pa.array(~dup))


def find_duplicate_ids(ids_ds: "ray.data.Dataset") -> set:
    """Ids appearing more than once. Pass a *column-pruned* dataset (only
    ``doc_id``) so at scale this scans one narrow column, not payloads.

    The duplicated-id set is assumed small enough to broadcast (dup rate
    ≪ 1%); a dup-heavy corpus would keep this distributed as a semi-join.
    """
    counts = ids_ds.groupby("doc_id").count()
    dup = counts.map_batches(
        lambda t: t.filter(pc.greater(t.column("count()"), 1)).select(["doc_id"]),
        batch_format="pyarrow",
    )
    return {r["doc_id"] for r in dup.take_all()}


@ray.remote(num_cpus=1)
def _file_id_hashes(path: str) -> "np.ndarray":
    """uint64 hashes of one file's doc_id column (a tiny per-file sketch)."""
    import pandas as pd
    import pyarrow.parquet as pq

    ids = pq.read_table(path, columns=["doc_id"]).column("doc_id")
    return pd.util.hash_array(ids.to_numpy(zero_copy_only=False))


def scan_duplicates(
    input_files: list[str],
) -> tuple[set, dict[str, set]]:
    """(dup_ids, per-file dup-id presence) via a distributed narrow scan.

    One raw Ray task per file reads ONLY the doc_id column and returns
    uint64 hashes (8 bytes/row — a Dataset string groupby here cost 10×
    more, measured); duplicates are found numerically on the driver, then
    the (rare) colliding ids are resolved exactly by re-reading just the
    files that contain them. Raw tasks are justified: the reduction is a
    driver-side merge of per-file sketches, which the Dataset API would
    express as a far costlier global shuffle. Scale path beyond ~10^9 rows
    per run: tree-merge the per-file hash arrays in tasks instead of
    concatenating on the driver.
    """
    import pandas as pd
    import pyarrow.parquet as pq

    hashes = ray.get([_file_id_hashes.remote(f) for f in input_files])
    all_h = np.sort(np.concatenate(hashes)) if hashes else np.zeros(0, np.uint64)
    dup_h = np.unique(all_h[1:][all_h[1:] == all_h[:-1]])
    if len(dup_h) == 0:
        return set(), {}
    # exact resolution: count candidate id strings in the touched files
    from collections import Counter

    cnt: Counter = Counter()
    file_candidates: dict[str, set] = {}
    for f, h in zip(input_files, hashes):
        mask = np.isin(h, dup_h)
        if not mask.any():
            continue
        ids = (
            pq.read_table(f, columns=["doc_id"]).column("doc_id")
            .to_numpy(zero_copy_only=False)
        )
        cand = ids[mask]
        file_candidates[f] = set(cand.tolist())
        cnt.update(cand.tolist())
    dup_ids = {s for s, c in cnt.items() if c > 1}
    file_dups = {
        f: cands & dup_ids
        for f, cands in file_candidates.items()
        if cands & dup_ids
    }
    return dup_ids, file_dups


def _winner_rows(
    input_files: list[str] | None,
    ds: "ray.data.Dataset",
    dup_ids: set,
) -> pa.Table:
    """One deterministic winner row per duplicated id: the first occurrence
    in (file order, row order) — the J1 'first to arrive' made reproducible.

    With ``input_files`` this is a targeted parquet read with predicate
    pushdown (only row groups containing dup ids are materialized); the
    fallback filters the Dataset (one extra pass, test scale only).
    """
    if input_files is not None:
        import pyarrow.dataset as pads

        tbl = pads.dataset(input_files, format="parquet").to_table(
            filter=pc.field("doc_id").isin(list(dup_ids)), use_threads=True
        )
    else:
        dup_arr = pa.array(sorted(dup_ids), pa.string())
        dup_ref = ray.put(dup_arr)
        filtered = ds.map_batches(
            lambda b: b.filter(
                pc.is_in(b.column("doc_id"), value_set=ray.get(dup_ref))
            ),
            batch_format="pyarrow",
        )
        refs = filtered.to_arrow_refs()
        tables = [t for t in ray.get(refs) if t.num_rows]
        tbl = pa.concat_tables(tables)  # dup_ids nonempty ⇒ rows exist
    return dedup_within_batch(tbl)


def exact_dedup(
    ds: "ray.data.Dataset",
    dup_ids: set | None = None,
    input_files: list[str] | None = None,
) -> "ray.data.Dataset":
    """Exact doc_id dedup (J1 semantics) in ONE pass over the payloads.

    Shape: a column-pruned id scan finds duplicated ids (rare); their
    winner rows are fetched by a targeted pushdown read and re-injected as
    a tiny side dataset, while the main pass simply drops all dup-id rows.
    No payload shuffle, no branch re-execution of the main input. A
    dup-heavy corpus would use a hash-partitioned groupby instead.
    """
    if dup_ids is None:
        dup_ids = find_duplicate_ids(ds.select_columns(["doc_id"]))
    if not dup_ids:
        return ds
    winners = _winner_rows(input_files, ds, dup_ids)
    dup_ref = ray.put(pa.array(sorted(dup_ids), pa.string()))

    def drop_dups(batch: pa.Table) -> pa.Table:
        mask = pc.invert(
            pc.is_in(batch.column("doc_id"), value_set=ray.get(dup_ref))
        )
        return batch.filter(mask)

    main = ds.map_batches(drop_dups, batch_format="pyarrow")
    side = ray.data.from_arrow(winners)
    return main.union(side)


def estimate_span_threshold(
    ds: "ray.data.Dataset", quantile: float = 0.99, sample_rows: int = 20_000
) -> int:
    """Span-count quantile from a bounded sample (narrow limit read) — the
    routing threshold for ``skew_threshold`` (SURVEY §7.1 M4 / §4 skew)."""
    sample = ds.limit(sample_rows).map_batches(
        lambda b: pa.Table.from_arrays(
            [
                pc.cast(
                    pc.fill_null(pc.list_value_length(b.column("spans")), 0),
                    pa.int64(),
                )
            ],
            names=["n"],
        ),
        batch_format="pyarrow",
    )
    ns = np.array([r["n"] for r in sample.take_all()], np.int64)
    if len(ns) == 0:
        return 0
    # 'lower' keeps the threshold below the monster sizes even when the
    # monster fraction is near (1 - quantile); pick quantile safely under
    # 1 - monster_fraction for routing to engage
    return int(np.quantile(ns, quantile, method="lower"))


def build_extract_pipeline(
    ds: "ray.data.Dataset",
    jobs: pa.Table | dict[str, Job] | None = None,
    *,
    dedup: bool = True,
    dup_ids: set | None = None,
    exclude_ids: set | None = None,
    input_files: list[str] | None = None,
    ocr: bool = True,
    ocr_engine: str = "tesseract",
    ocr_model: str | None = None,
    ocr_concurrency=None,
    batch_size: int = 1024,
    skew_threshold: int | None = None,
    monster_batch_size: int = 16,
    big_blocks: int = 32,
    metrics: str | None = None,
) -> "ray.data.Dataset":
    """documents Dataset → extraction output Dataset (lazy, streaming).

    ``metrics``: name of a live MetricsActor (state/metrics.py) — the
    extract stage then flushes ONE fire-and-forget counter call per batch
    (docs/pages/failures), pollable mid-run via ``live_progress``. The
    reference polled per-page Redis writes for the same surface (G2).

    ``exclude_ids``: doc_ids owned by another partition (cross-partition
    dedup, see ``run_partitioned``) — dropped before any work.

    ``ocr_concurrency``: None (default) runs the engine as *stateless
    tasks* with a per-worker engine cache — right when the engine is cheap
    relative to a CPU reservation (Ray fuses the whole chain into the
    actor pool otherwise, capping pipeline parallelism at the pool size).
    An int/tuple creates a dedicated actor pool — right for heavy models
    that need exclusive resources (GPUs, big weights); size it knowing the
    upstream map fuses in.
    """
    if exclude_ids:
        excl_ref = ray.put(pa.array(sorted(exclude_ids), pa.string()))

        def _drop_excluded(batch: pa.Table) -> pa.Table:
            mask = pc.invert(
                pc.is_in(batch.column("doc_id"), value_set=ray.get(excl_ref))
            )
            return batch.filter(mask)

        ds = ds.map_batches(_drop_excluded, batch_format="pyarrow")
    winners: pa.Table | None = None
    if dedup:
        dup_files = None
        if dup_ids is None and input_files is not None:
            # distributed narrow id-hash scan straight off the files
            dup_ids, file_dups = scan_duplicates(input_files)
            # preserve the caller's input_files order (not lexicographic) so
            # the deterministic winner is the true first occurrence in file
            # order even for unsorted input lists
            dup_files = [f for f in input_files if f in file_dups]
        elif dup_ids is None:
            # no file handle (in-memory dataset): column-pruned Dataset scan
            dup_ids = find_duplicate_ids(ds.select_columns(["doc_id"]))
        if dup_ids and exclude_ids:
            # excluded ids are owned elsewhere — never re-inject their winners
            dup_ids = set(dup_ids) - set(exclude_ids)
        if dup_ids:
            winners = _winner_rows(
                dup_files if dup_files is not None else input_files, ds, dup_ids
            )
            dup_ref = ray.put(pa.array(sorted(dup_ids), pa.string()))

            def drop_dups(batch: pa.Table) -> pa.Table:
                mask = pc.invert(
                    pc.is_in(batch.column("doc_id"), value_set=ray.get(dup_ref))
                )
                return batch.filter(mask)

            # dup rows are dropped in the fused main chain; the (tiny)
            # winner set is extracted driver-side and unioned AFTER the
            # extract stage, so the main read→extract→write chain stays one
            # fused operator (a pre-extract union costs an extra trip of
            # the whole corpus through the object store — measured)
            ds = ds.map_batches(drop_dups, batch_format="pyarrow")
    lookup = jobs if isinstance(jobs, dict) else jobs_table_to_lookup(jobs)
    jobs_ref = ray.put(lookup) if lookup else None

    def _report_metrics(out: pa.Table) -> None:
        # one fire-and-forget flush per BATCH (pre-aggregated), never per
        # row/page — SURVEY §4 progress row
        if metrics is not None and out.num_rows:
            from ..state.metrics import metrics_handle

            metrics_handle(metrics).report.remote(
                docs=out.num_rows,
                pages=int(pc.sum(out.column("pages")).as_py() or 0),
                decode_failures=int(
                    pc.sum(out.column("decode_failures")).as_py() or 0
                ),
            )

    def _extract(batch: pa.Table) -> pa.Table:
        j = ray.get(jobs_ref) if jobs_ref is not None else {}
        out = extract_batch(batch, j, emit_payloads=ocr)
        _report_metrics(out)
        return out

    from ..stages.engines import ocr_task

    def _chain(src: "ray.data.Dataset", bsize: int) -> "ray.data.Dataset":
        out = src.map_batches(_extract, batch_format="pyarrow", batch_size=bsize)
        if ocr:
            if ocr_concurrency is None:
                out = out.map_batches(
                    ocr_task,
                    fn_kwargs={"engine": ocr_engine, "model": ocr_model},
                    batch_format="pyarrow",
                    batch_size=bsize,
                )
            else:
                out = out.map_batches(
                    OcrStage,
                    fn_constructor_kwargs={"engine": ocr_engine, "model": ocr_model},
                    batch_format="pyarrow",
                    batch_size=bsize,
                    concurrency=ocr_concurrency,
                    num_cpus=1,
                )
        return out

    if skew_threshold is None:
        out = _chain(ds, batch_size)
    else:
        # size-bucket routing (SURVEY §7.1 M4): monster docs go to their
        # own branch, REPARTITIONED into small blocks — Ray's task
        # granularity is the block (measured: batch_size does not split a
        # block across tasks), so a cluster of 100×-median docs in one
        # input block would otherwise serialize behind a single task.
        # The small branch stays a fused read→extract(→ocr) chain; the
        # big-branch repartition shuffles only the (rare) monster rows.
        # Size big_blocks ≈ cluster cores so the heavy rows spread.
        def _route(keep_big: bool):
            def f(b: pa.Table) -> pa.Table:
                n = pc.fill_null(pc.list_value_length(b.column("spans")), 0)
                mask = (
                    pc.greater(n, skew_threshold)
                    if keep_big
                    else pc.less_equal(n, skew_threshold)
                )
                return b.filter(mask)

            return f

        small = ds.map_batches(_route(False), batch_format="pyarrow")
        big = ds.map_batches(_route(True), batch_format="pyarrow").repartition(
            big_blocks
        )
        out = _chain(small, batch_size).union(_chain(big, monster_batch_size))
    if winners is not None:
        side = extract_batch(winners, lookup, emit_payloads=ocr)
        if ocr:
            side = ocr_task(side, engine=ocr_engine, model=ocr_model)
        _report_metrics(side)  # winner rows bypass the streamed stage
        out = out.union(ray.data.from_arrow(side))
    return out


def extract_to_dir(
    input_files: list[str],
    out_dir: str,
    jobs: pa.Table | dict[str, Job] | None = None,
    *,
    ocr: bool = True,
    ocr_engine: str = "tesseract",
    ocr_model: str | None = None,
    batch_size: int = 2048,
    compression: str = "zstd",
) -> None:
    """One-shot extract run: input parquet files → one output directory,
    with the dedup winners written as a separate small side file.

    This is the at-scale write topology: `Dataset.union` of the (tiny)
    winner set with the streamed output inserts a UnionOperator between the
    map chain and the Write operator, which un-fuses map→write and sends
    every output block through an extra object-store hop (measured ~25%
    idle time at 32 CPUs). Writing the winner rows as one extra parquet
    file in the same directory keeps the main read→dedup→extract→OCR→write
    chain a single fused task pipeline; the output *table* (dir contents)
    is row-identical to ``build_extract_pipeline(...).write_parquet(...)``.
    """
    import pyarrow.parquet as pq

    from ..stages.engines import ocr_task

    dup_ids, file_dups = scan_duplicates(input_files)
    dup_files = [f for f in input_files if f in file_dups]
    ds = ray.data.read_parquet(input_files)
    lookup = jobs if isinstance(jobs, dict) else jobs_table_to_lookup(jobs)
    jobs_ref = ray.put(lookup) if lookup else None
    if dup_ids:
        dup_ref = ray.put(pa.array(sorted(dup_ids), pa.string()))

        def drop_dups(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.invert(
                    pc.is_in(batch.column("doc_id"), value_set=ray.get(dup_ref))
                )
            )

        ds = ds.map_batches(drop_dups, batch_format="pyarrow")

    def _extract(batch: pa.Table) -> pa.Table:
        j = ray.get(jobs_ref) if jobs_ref is not None else {}
        return extract_batch(batch, j, emit_payloads=ocr)

    out = ds.map_batches(_extract, batch_format="pyarrow", batch_size=batch_size)
    if ocr:
        out = out.map_batches(
            ocr_task,
            fn_kwargs={"engine": ocr_engine, "model": ocr_model},
            batch_format="pyarrow",
            batch_size=batch_size,
        )
    out.write_parquet(out_dir, compression=compression)
    if dup_ids:
        winners = _winner_rows(dup_files, None, dup_ids)
        side = extract_batch(winners, lookup or {}, emit_payloads=ocr)
        if ocr:
            side = ocr_task(side, engine=ocr_engine, model=ocr_model)
        pq.write_table(
            side,
            f"{out_dir.rstrip('/')}/winners.parquet",
            compression=compression,
        )


def run_partitioned(
    input_paths: list[str],
    out_dir: str,
    jobs: pa.Table | dict[str, Job] | None = None,
    *,
    partition_size: int = 8,
    resume: bool = True,
    **pipeline_kw,
) -> dict:
    """Checkpoint-resumable run: input files → partitioned parquet output.

    Partition = ``partition_size`` input files; each is processed by its own
    streaming pipeline and committed atomically (temp dir → rename +
    manifest append). Resume skips committed partitions — the anti-join of
    input partitions vs the manifest (SURVEY.md §4 resume row).

    Cross-partition exact dedup without moving payloads: a column-pruned
    distributed scan counts doc_ids; the (rare) duplicated ids are then
    assigned an *owner* partition (first in partition order — deterministic,
    so resume reproduces it), and every other partition drops them. Only the
    narrow doc_id column is ever read twice; payloads stream exactly once.
    """
    import hashlib

    manifest = Manifest(out_dir)
    chunks = [
        (pid, input_paths[lo : lo + partition_size])
        for pid, lo in enumerate(range(0, len(input_paths), partition_size))
    ]
    # fingerprint each partition's file list: a manifest 'done' entry is
    # honored only if the partition still maps to the same files — resuming
    # with a different --partition-size or input set must not skip pids
    # that now cover different chunks (would duplicate/drop documents)
    chunk_md5 = {
        pid: hashlib.md5("\n".join(files).encode()).hexdigest()
        for pid, files in chunks
    }
    done = set()
    if resume:
        for pid, row in manifest.completed().items():
            if row.get("files_md5", chunk_md5.get(pid)) == chunk_md5.get(pid):
                done.add(pid)
    metrics_name = pipeline_kw.get("metrics")
    metrics_actor = None
    if metrics_name:
        from ..state.metrics import get_metrics_actor

        metrics_actor = get_metrics_actor(metrics_name)
        ray.get(metrics_actor.set_gauge.remote(partitions_total=len(chunks)))
        if done:
            ray.get(metrics_actor.report.remote(partitions_done=len(done)))
    dedup = pipeline_kw.get("dedup", True)
    exclude: dict[int, set] = {}
    chunk_dups: dict[int, set] = {}
    chunk_dup_files: dict[int, list[str]] = {}
    if dedup and len(chunks) > 1:
        dup_ids, file_dups = scan_duplicates(input_paths)
        owner: dict = {}
        for pid, files in chunks:
            if not dup_ids:
                break
            present: set = set()
            for f in files:
                present |= file_dups.get(f, set())
            excl = {d for d in present if owner.get(d, pid) != pid}
            for d in present:
                owner.setdefault(d, pid)
            if excl:
                exclude[pid] = excl
            chunk_dups[pid] = present
            chunk_dup_files[pid] = [f for f in files if file_dups.get(f)]
    ran, skipped = [], []
    for pid, files in chunks:
        if pid in done:
            skipped.append(pid)
            continue
        t0 = time.perf_counter()
        ds = ray.data.read_parquet(files)
        out = build_extract_pipeline(
            ds,
            jobs,
            dup_ids=chunk_dups.get(pid, set()) if (dedup and len(chunks) > 1) else None,
            exclude_ids=exclude.get(pid),
            input_files=chunk_dup_files.get(pid, files) if dedup else files,
            **pipeline_kw,
        )
        tmp = manifest.begin(pid)
        out.write_parquet(tmp)
        wall = time.perf_counter() - t0
        metrics = _partition_metrics(tmp)
        metrics["wall_s"] = round(wall, 4)
        metrics["files_md5"] = chunk_md5[pid]
        manifest.commit(pid, metrics)
        if metrics_actor is not None:
            metrics_actor.report.remote(partitions_done=1)
        ran.append(pid)
    return {
        "out_dir": out_dir,
        "partitions_run": ran,
        "partitions_skipped": skipped,
        "manifest": manifest.path,
        "output_dirs": manifest.output_dirs(),
        "output_files": manifest.output_files(),
    }


def _partition_metrics(part_dir: str) -> dict:
    """Lineage metrics from the partition's own committed columns (reads
    only the narrow metric columns, never the span payloads)."""
    import pyarrow.dataset as pads

    t = pads.dataset(part_dir, format="parquet").to_table(
        columns=["status", "pages", "decode_failures", "empty_pages"]
    )
    status = t.column("status")
    return {
        "docs": t.num_rows,
        "docs_failed": int(pc.sum(pc.equal(status, "failed").cast(pa.int64())).as_py() or 0),
        "pages": int(pc.sum(t.column("pages")).as_py() or 0),
        "decode_failures": int(pc.sum(t.column("decode_failures")).as_py() or 0),
        "empty_pages": int(pc.sum(t.column("empty_pages")).as_py() or 0),
    }


# ---------------------------------------------------------------------------
# Ingest: flat text documents → interleaved span documents (the S2 analogue:
# upload/validate/mint-id, api/src/helpers/uploadhelper.ts:16-43). Used by
# entry() to run the flagship over the driver-provided flat documents table.
# ---------------------------------------------------------------------------

WORDS_PER_PAGE = 40
WORDS_PER_SPAN = 15


def interleave_documents(batch: pa.Table) -> pa.Table:
    """Deterministically re-shape flat docs (doc_id:int64, text, ...) into
    the interleaved schema: pages of ~40 words, 1-3 text spans per page,
    a media span every 3rd page (every 9th is a decode failure).

    Vectorized with list-offset arithmetic: the span layout (pages, spans
    per page, media cadence) is flat numpy arrays; span text is gathered
    from one concatenated byte buffer with a single fancy index and the
    utf8/list arrays are assembled directly from offsets — no per-span
    dicts or from_pylist (the round-1 row-loop version sat in the entry()
    hot path)."""
    from ..schema import DOCUMENTS_SCHEMA, SPAN_STRUCT

    ids_np = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    texts = batch.column("text").to_pylist()
    D = len(texts)
    if D == 0:
        return pa.Table.from_pylist([], schema=DOCUMENTS_SCHEMA)

    words_per_doc = [(t or "").split() for t in texts]
    n_words = np.fromiter((len(w) for w in words_per_doc), np.int64, D)
    n_all = int(n_words.sum())
    # word byte offsets straight from the space positions of one giant
    # single-space-joined buffer: words contain no 0x20 (split() ate all
    # whitespace, and 0x20 never occurs inside a multi-byte UTF-8 char),
    # so separators are exactly the spaces — no per-word Arrow array
    # two-level join (per-doc, then across non-empty docs) — one C pass
    # each, no flattened word list materialized
    gbytes = np.frombuffer(
        " ".join(" ".join(ws) for ws in words_per_doc if ws).encode(), np.uint8
    )
    seps = np.nonzero(gbytes == 0x20)[0]
    gstart = np.zeros(n_all + 1, np.int64)
    if n_all:
        gstart[1 : len(seps) + 1] = seps + 1
        gstart[n_all] = len(gbytes) + 1  # sentinel: end "separator" + 1
    gend = gstart[1 : n_all + 1] - 1
    doc_word0 = np.zeros(D, np.int64)
    np.cumsum(n_words[:-1], out=doc_word0[1:])

    # page layout (every doc has ≥1 page even when empty)
    P = np.maximum((n_words + WORDS_PER_PAGE - 1) // WORDS_PER_PAGE, 1)
    n_pages = int(P.sum())
    page_doc = np.repeat(np.arange(D), P)
    page_num = (np.arange(n_pages) - np.repeat(np.cumsum(P) - P, P) + 1)
    is_last = page_num == P[page_doc]
    rem = n_words - (P - 1) * WORDS_PER_PAGE
    pw = np.where(is_last, rem[page_doc], WORDS_PER_PAGE)
    t_spans = np.maximum((pw + WORDS_PER_SPAN - 1) // WORDS_PER_SPAN, 1)
    has_media = (ids_np[page_doc] + page_num) % 3 == 0

    # text spans: word ranges → byte ranges → one gather off the buffer
    n_ts = int(t_spans.sum())
    ts_page = np.repeat(np.arange(n_pages), t_spans)
    s_idx = np.arange(n_ts) - np.repeat(np.cumsum(t_spans) - t_spans, t_spans)
    ts_doc = page_doc[ts_page]
    w_lo = (page_num[ts_page] - 1) * WORDS_PER_PAGE + s_idx * WORDS_PER_SPAN
    page_end = (page_num[ts_page] - 1) * WORDS_PER_PAGE + pw[ts_page]
    w_hi = np.minimum(w_lo + WORDS_PER_SPAN, page_end)
    b_lo = gstart[doc_word0[ts_doc] + w_lo]
    # clip the end-word index so empty spans (w_hi == w_lo, masked by the
    # where) never index past the word table
    gend_safe = gend if len(gend) else np.zeros(1, np.int64)
    end_idx = np.minimum(
        doc_word0[ts_doc] + np.maximum(w_hi, 1) - 1, len(gend_safe) - 1
    )
    b_hi = np.where(w_hi > w_lo, gend_safe[end_idx], b_lo)
    L = b_hi - b_lo
    n_bytes = int(L.sum())
    span_starts = np.cumsum(L) - L
    src = (
        b_lo[np.repeat(np.arange(n_ts), L)]
        + np.arange(n_bytes)
        - np.repeat(span_starts, L)
    )
    data = gbytes[src] if n_bytes else np.zeros(0, np.uint8)
    offs = np.zeros(n_ts + 1, np.int32)
    np.cumsum(L, out=offs[1:])
    text_vals = pa.Array.from_buffers(
        pa.utf8(), n_ts, [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(data.tobytes())]
    )

    # media spans (≤1 per page; payload strings are few, built directly)
    mp = np.nonzero(has_media)[0]
    m_doc, m_page = page_doc[mp], page_num[mp]
    m_ids = ids_np[m_doc]
    bad = (m_ids + m_page) % 9 == 0
    payloads = [
        ("!bad-img-" if b else "img-") + f"{i}-{p}"
        for i, p, b in zip(m_ids.tolist(), m_page.tolist(), bad.tolist())
    ]
    mrefs = [f"in-{i}-{p}" for i, p in zip(m_ids.tolist(), m_page.tolist())]
    n_ms = len(mp)

    # interleave: per doc, per page — text spans in order, then the media
    # span. Output positions are computable directly from page-level span
    # counts (exclusive cumsum), so the permutation is one O(n) scatter —
    # no lexsort.
    page_total = t_spans + has_media.astype(np.int64)
    page_base = np.cumsum(page_total) - page_total
    total = n_ts + n_ms
    perm = np.empty(total, np.int64)
    perm[page_base[ts_page] + s_idx] = np.arange(n_ts)
    perm[page_base[mp] + t_spans[mp]] = n_ts + np.arange(n_ms)
    order = pa.array(perm)
    all_page = np.concatenate([page_num[ts_page], m_page])
    all_med = np.concatenate([np.zeros(n_ts, np.int8), np.ones(n_ms, np.int8)])
    text_col = pa.concat_arrays([text_vals, pa.array(payloads, pa.string())]).take(order)
    ref_col = pa.concat_arrays(
        [pa.nulls(n_ts, pa.string()).fill_null(""), pa.array(mrefs, pa.string())]
    ).take(order)
    kind_col = pa.array(np.where(all_med == 1, "media", "text")[perm])
    off_col = pa.array(all_page[perm].astype(np.int32))
    struct = pa.StructArray.from_arrays(
        [kind_col, text_col, ref_col, off_col],
        fields=list(SPAN_STRUCT),
    )
    spans_per_doc = np.bincount(page_doc, weights=page_total, minlength=D).astype(
        np.int64
    )
    list_offs = np.zeros(D + 1, np.int32)
    np.cumsum(spans_per_doc, out=list_offs[1:])
    spans_col = pa.ListArray.from_arrays(pa.array(list_offs), struct)
    doc_ids = pa.array([f"doc-{int(i):08d}" for i in ids_np], pa.string())
    return pa.Table.from_arrays([doc_ids, spans_col], schema=DOCUMENTS_SCHEMA)
