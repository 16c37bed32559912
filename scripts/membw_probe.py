"""Pipeline-independent host-ceiling probe for the scaling analysis.

Measures aggregate memory bandwidth (numpy copy of a 256 MB float64
array — a STREAM-copy analogue) at 1, 8, and 32 concurrent processes.
If 32 workers achieve far less than 4× the 8-worker aggregate, the node's
shared memory system — not the Ray pipeline — caps the 8→32 scaling
efficiency of any bandwidth-bound job on this single-socket sandbox.
The real cluster criterion (N → 4N NODES) adds memory bandwidth
proportionally with nodes; this probe quantifies exactly what the
single-node surrogate cannot.

    python scripts/membw_probe.py            # prints one JSON line
"""
import json
import multiprocessing as mp
import time

ARR_MB = 256
REPS = 8


def _worker(q):
    import numpy as np

    a = np.ones(ARR_MB * 1024 * 1024 // 8, np.float64)
    b = np.empty_like(a)
    b[:] = a  # touch pages before timing
    t0 = time.perf_counter()
    for _ in range(REPS):
        b[:] = a
    dt = time.perf_counter() - t0
    # copy moves 2 bytes per byte of payload (read + write)
    q.put(2 * REPS * ARR_MB / 1024 / dt)  # GB/s for this worker


def run(p: int) -> float:
    q = mp.Queue()
    procs = [mp.Process(target=_worker, args=(q,)) for _ in range(p)]
    for x in procs:
        x.start()
    vals = [q.get() for _ in procs]
    for x in procs:
        x.join()
    return round(sum(vals), 1)


if __name__ == "__main__":
    out = {"probe": "stream-copy GB/s aggregate", "arr_mb": ARR_MB}
    for p in (1, 8, 32):
        out[f"p{p}"] = run(p)
    out["scaling_8_to_32"] = round(out["p32"] / out["p8"] / 4, 3)
    print(json.dumps(out))
