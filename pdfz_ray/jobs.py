"""Job-parameter handling: normalization, validation, broadcast lookup.

The reference ships job params per document through RabbitMQ
(extractor/src/worker.rs:4-11); here the (small) jobs table is broadcast to
every extract task via ``ray.put`` and resolved per batch — never re-shipped
per batch and never shuffled.
"""

from __future__ import annotations

import pyarrow as pa

from .oracle import DEFAULT_JOB, VALID_ENGINES, Job


def normalize_model(model: str | None) -> str | None:
    """Append ":latest" when the tag is missing (api/src/server.ts:111-113)."""
    if model and ":" not in model:
        return f"{model}:latest"
    return model


def validate_engine(engine: str) -> bool:
    """Lower-cased membership (engine_handler.rs:24-31). Unknown engines are
    *failed rows* here, not worker panics (queue_handler.rs:51)."""
    return engine.lower() in VALID_ENGINES


def jobs_table_to_lookup(jobs: pa.Table | None) -> dict[str, Job]:
    """Build the broadcastable ``doc_id -> Job`` dict from a jobs table."""
    if jobs is None or jobs.num_rows == 0:
        return {}
    out: dict[str, Job] = {}
    for row in jobs.to_pylist():
        out[row["doc_id"]] = Job(
            start_page=int(row.get("start_page") or 1),
            page_count=int(row.get("page_count") or 0),
            engine=(row.get("engine") or DEFAULT_JOB.engine),
            model=normalize_model(row.get("model") or None),
        )
    return out
