"""Sources: ingest + validation + point lookups.

The reference's upload path (S2: multer ext/MIME filter, id minting —
api/src/helpers/uploadhelper.ts:16-43) becomes a validating ingest stage
with a quarantine side-channel; its content endpoint (S5/J3:
GET /content/:id, api/src/server.ts:182-207) becomes a key filter; the
upload-exists guard (J4, api/src/server.ts:86-88) becomes a broadcast
semi-join of job ids against input ids.

Lance note: the north-star names Lance tables; this container ships no
lance package, so URIs resolve to parquet datasets with the same schema —
``read_documents`` is the single switch point where a lance reader would
plug in (import-gated).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..schema import DOCUMENTS_SCHEMA

try:  # pragma: no cover - not in this container
    import lance  # noqa: F401

    _HAS_LANCE = True
except Exception:
    _HAS_LANCE = False

VALID_KINDS = ("text", "media")


def read_documents(paths, fmt: str = "parquet", **kw) -> "ray.data.Dataset":
    """Read the interleaved documents table (parquet | json | lance)."""
    if fmt == "parquet":
        return ray.data.read_parquet(paths, **kw)
    if fmt == "json":
        # JSON rows: {"doc_id": ..., "spans": [{kind,text,media_ref,offset}]}
        ds = ray.data.read_json(paths, **kw)
        return ds.map_batches(
            lambda t: t.select(["doc_id", "spans"]).cast(DOCUMENTS_SCHEMA),
            batch_format="pyarrow",
        )
    if fmt == "lance":  # pragma: no cover
        if not _HAS_LANCE:
            raise NotImplementedError(
                "lance reader unavailable in this environment; parquet "
                "datasets carry the same schema"
            )
        return ray.data.read_lance(paths, **kw)
    raise ValueError(f"unknown format {fmt!r}")


def validate_batch(batch: pa.Table) -> pa.Table:
    """Row validity predicate (the M11 upload filter, vectorized):
    non-empty doc_id, every span kind ∈ {text, media}, offsets >= 1.
    Adds a boolean ``_valid`` column."""
    import numpy as np

    ids = batch.column("doc_id")
    id_ok = pc.and_(pc.is_valid(ids), pc.not_equal(pc.fill_null(ids, ""), ""))
    spans = batch.column("spans").combine_chunks()
    flat = spans.flatten()
    n = batch.num_rows
    if len(flat):
        parent = pc.list_parent_indices(spans).to_numpy().astype(np.int64)
        kind_ok = pc.is_in(
            flat.field("kind"), value_set=pa.array(VALID_KINDS)
        ).to_numpy(zero_copy_only=False)
        off_ok = (
            pc.fill_null(flat.field("offset"), 0).to_numpy(zero_copy_only=False) >= 1
        )
        bad = np.zeros(n, bool)
        np.logical_or.at(bad, parent, ~(kind_ok & off_ok))
        span_ok = pa.array(~bad)
    else:
        span_ok = pa.array([True] * n)
    return batch.append_column("_valid", pc.and_(id_ok, span_ok))


def ingest(
    ds: "ray.data.Dataset",
) -> tuple["ray.data.Dataset", "ray.data.Dataset"]:
    """(accepted, quarantined) — invalid rows are never silently dropped
    (unlike the reference's ack-and-drop on parse failure,
    extractor/src/controllers/queue_handler.rs:67-71)."""
    v = ds.map_batches(validate_batch, batch_format="pyarrow")
    ok = v.map_batches(
        lambda t: t.filter(t.column("_valid")).drop_columns(["_valid"]),
        batch_format="pyarrow",
    )
    quarantine = v.map_batches(
        lambda t: t.filter(pc.invert(t.column("_valid"))).drop_columns(["_valid"]),
        batch_format="pyarrow",
    )
    return ok, quarantine


def content_lookup(ds: "ray.data.Dataset", doc_id: str) -> pa.Table:
    """Point lookup by key (GET /content/:id). At scale this is a Lance
    take-by-key / parquet predicate-pushdown read; here a vectorized
    filter."""
    out = ds.map_batches(
        lambda t: t.filter(pc.equal(t.column("doc_id"), doc_id)),
        batch_format="pyarrow",
    )
    return pa.Table.from_pylist(out.take_all())


def filter_jobs_to_existing(
    jobs: pa.Table, ds: "ray.data.Dataset"
) -> tuple[pa.Table, pa.Table]:
    """J4 upload-exists guard: semi-join jobs against the input id set
    (broadcast — the id set of *jobs* is small; we probe the big side with
    a pushdown-friendly is_in and collect matching ids only)."""
    wanted = pc.unique(jobs.column("doc_id").combine_chunks())
    ref = ray.put(wanted)

    def probe(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        mask = pc.is_in(ids, value_set=ray.get(ref))
        return pa.Table.from_arrays(
            [pc.cast(ids.filter(mask), pa.string())], names=["doc_id"]
        )

    present = {
        r["doc_id"]
        for r in ds.select_columns(["doc_id"])
        .map_batches(probe, batch_format="pyarrow")
        .take_all()
    }
    mask = pa.array([d in present for d in jobs.column("doc_id").to_pylist()])
    return jobs.filter(mask), jobs.filter(pc.invert(mask))
