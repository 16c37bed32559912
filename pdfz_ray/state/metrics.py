"""Live pipeline metrics — G2's mid-run progress surface.

The reference writes per-page progress to Redis, one round trip per page
(reference: extractor/src/engine/mod.rs:89; SURVEY §4 flags the per-row
write as the anti-pattern). The rebuild pre-aggregates per BATCH inside
the extract kernel and flushes ONE fire-and-forget actor call per batch;
any process in the cluster can poll ``live_progress`` while a
``run_partitioned`` job is in flight.

Semantics: counters are at-least-once (a retried task re-reports) — this
is a monitoring surface. Exactly-once lineage stays with the partition
manifest (state/manifest.py), which is the source of truth.
"""

from __future__ import annotations

import ray

DEFAULT_NAME = "pdfz_metrics"


@ray.remote(num_cpus=0)
class MetricsActor:
    """Tiny named accumulator: counters (monotonic adds) + gauges (sets)."""

    def __init__(self):
        self._counters: dict[str, int] = {}
        self._gauges: dict[str, int] = {}

    def report(self, **counters: int) -> None:
        for k, v in counters.items():
            self._counters[k] = self._counters.get(k, 0) + int(v)

    def set_gauge(self, **gauges: int) -> None:
        self._gauges.update({k: int(v) for k, v in gauges.items()})

    def snapshot(self) -> dict:
        return {**self._gauges, **self._counters}

    def reset(self) -> None:
        self._counters.clear()
        self._gauges.clear()


def get_metrics_actor(name: str = DEFAULT_NAME, detached: bool = False):
    """Create-or-attach the named metrics actor (idempotent).

    A non-detached named actor lives only while some handle to it is held
    — keep the returned handle alive for the duration you want to poll.
    Pass ``detached=True`` for cross-driver polling (caller must
    ``ray.kill`` it when done)."""
    opts = {"name": name, "get_if_exists": True}
    if detached:
        opts["lifetime"] = "detached"
    return MetricsActor.options(**opts).remote()


# per-worker handle cache: resolving a named actor once per worker, not
# once per batch
_HANDLES: dict[str, "ray.actor.ActorHandle"] = {}


def metrics_handle(name: str):
    h = _HANDLES.get(name)
    if h is None:
        h = ray.get_actor(name)
        _HANDLES[name] = h
    return h


def live_progress(name: str = DEFAULT_NAME) -> dict:
    """Poll the in-flight counters (empty dict when no run is active)."""
    try:
        actor = ray.get_actor(name)
    except ValueError:
        return {}
    return ray.get(actor.snapshot.remote())
