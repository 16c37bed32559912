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
    """First-wins doc_id dedup inside one batch (cheap pre-pass)."""
    ids = batch.column("doc_id").to_pylist()
    seen: set = set()
    keep = []
    for i, d in enumerate(ids):
        if d not in seen:
            seen.add(d)
            keep.append(i)
    if len(keep) == batch.num_rows:
        return batch
    return batch.take(pa.array(keep, pa.int64()))


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


def exact_dedup(
    ds: "ray.data.Dataset", dup_ids: set | None = None
) -> "ray.data.Dataset":
    """Exact doc_id dedup (J1 semantics) without shuffling unique payloads.

    Duplicate groups keep one row; with distributed unordered input the
    reference's "first to arrive" is arbitrary too (api/src/server.ts:90-103
    races), so any-deterministic-winner within a group is faithful.
    """
    ds = ds.map_batches(dedup_within_batch, batch_format="pyarrow")
    if dup_ids is None:
        dup_ids = find_duplicate_ids(ds.select_columns(["doc_id"]))
    if not dup_ids:
        return ds
    dup_ref = ray.put(dup_ids)

    def split(batch: pa.Table, keep_dups: bool) -> pa.Table:
        dups = ray.get(dup_ref)
        mask = pa.array([d in dups for d in batch.column("doc_id").to_pylist()])
        return batch.filter(mask if keep_dups else pc.invert(mask))

    uniq = ds.map_batches(lambda b: split(b, False), batch_format="pyarrow")
    dups_only = ds.map_batches(lambda b: split(b, True), batch_format="pyarrow")
    resolved = dups_only.groupby("doc_id").map_groups(
        lambda t: t.slice(0, 1), batch_format="pyarrow"
    )
    return uniq.union(resolved)


def build_extract_pipeline(
    ds: "ray.data.Dataset",
    jobs: pa.Table | dict[str, Job] | None = None,
    *,
    dedup: bool = True,
    dup_ids: set | None = None,
    exclude_ids: set | None = None,
    ocr: bool = True,
    ocr_engine: str = "tesseract",
    ocr_model: str | None = None,
    ocr_concurrency=(1, 4),
    batch_size: int = 1024,
) -> "ray.data.Dataset":
    """documents Dataset → extraction output Dataset (lazy, streaming).

    ``exclude_ids``: doc_ids owned by another partition (cross-partition
    dedup, see ``run_partitioned``) — dropped before any work.
    """
    if exclude_ids:
        excl_ref = ray.put(exclude_ids)

        def _drop_excluded(batch: pa.Table) -> pa.Table:
            excl = ray.get(excl_ref)
            mask = pa.array(
                [d not in excl for d in batch.column("doc_id").to_pylist()]
            )
            return batch.filter(mask)

        ds = ds.map_batches(_drop_excluded, batch_format="pyarrow")
    if dedup:
        ds = exact_dedup(ds, dup_ids)
    lookup = jobs if isinstance(jobs, dict) else jobs_table_to_lookup(jobs)
    jobs_ref = ray.put(lookup) if lookup else None

    def _extract(batch: pa.Table) -> pa.Table:
        j = ray.get(jobs_ref) if jobs_ref is not None else {}
        return extract_batch(batch, j, emit_payloads=ocr)

    out = ds.map_batches(_extract, batch_format="pyarrow", batch_size=batch_size)
    if ocr:
        out = out.map_batches(
            OcrStage,
            fn_constructor_kwargs={"engine": ocr_engine, "model": ocr_model},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=ocr_concurrency,
            num_cpus=1,
        )
    return out


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
    manifest = Manifest(out_dir)
    done = set(manifest.completed()) if resume else set()
    chunks = [
        (pid, input_paths[lo : lo + partition_size])
        for pid, lo in enumerate(range(0, len(input_paths), partition_size))
    ]
    dedup = pipeline_kw.get("dedup", True)
    dup_ids: set = set()
    exclude: dict[int, set] = {}
    if dedup and len(chunks) > 1:
        ids_ds = ray.data.read_parquet(input_paths, columns=["doc_id"])
        dup_ids = find_duplicate_ids(ids_ds)
        owner: dict = {}
        for pid, files in chunks:
            if not dup_ids:
                break
            import pyarrow.parquet as _pq

            present = set()
            for f in files:
                col = _pq.read_table(f, columns=["doc_id"]).column("doc_id")
                present.update(v for v in col.to_pylist() if v in dup_ids)
            excl = {d for d in present if owner.get(d, pid) != pid}
            for d in present:
                owner.setdefault(d, pid)
            if excl:
                exclude[pid] = excl
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
            dup_ids=dup_ids if (dedup and len(chunks) > 1) else None,
            exclude_ids=exclude.get(pid),
            **pipeline_kw,
        )
        tmp = manifest.begin(pid)
        out.write_parquet(tmp)
        wall = time.perf_counter() - t0
        metrics = _partition_metrics(tmp)
        metrics["wall_s"] = round(wall, 4)
        manifest.commit(pid, metrics)
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
    a media span every 3rd page (every 9th is a decode failure)."""
    from ..schema import DOCUMENTS_SCHEMA

    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    rows = []
    for i, txt in zip(ids, texts):
        doc_id = f"doc-{int(i):08d}"
        words = (txt or "").split()
        spans = []
        page = 0
        for lo in range(0, max(len(words), 1), WORDS_PER_PAGE):
            page += 1
            pw = words[lo : lo + WORDS_PER_PAGE]
            for s in range(0, max(len(pw), 1), WORDS_PER_SPAN):
                spans.append(
                    {
                        "kind": "text",
                        "text": " ".join(pw[s : s + WORDS_PER_SPAN]),
                        "media_ref": "",
                        "offset": page,
                    }
                )
            if (int(i) + page) % 3 == 0:
                bad = (int(i) + page) % 9 == 0
                payload = f"{'!bad-' if bad else ''}img-{int(i)}-{page}"
                spans.append(
                    {
                        "kind": "media",
                        "text": payload,
                        "media_ref": f"in-{int(i)}-{page}",
                        "offset": page,
                    }
                )
        rows.append({"doc_id": doc_id, "spans": spans})
    return pa.Table.from_pylist(rows, schema=DOCUMENTS_SCHEMA)
