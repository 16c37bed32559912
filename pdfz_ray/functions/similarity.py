"""Similarity search over an embedding column (``list<float>``).

- ``knn_brute``: exact top-k cosine — per-batch float64 matmul against a
  broadcast query matrix, local top-k per batch, global top-k merge. The
  baseline every approximate variant is measured against.
- ``knn_lsh``: random-hyperplane LSH bucketing — the scale path. Vectors
  are hashed into 2^planes buckets; a query probes its own bucket plus all
  1-bit-flip neighbors (multiprobe), so only a fraction of the corpus is
  scored. Recall vs brute force is asserted in tests.

Scale notes: the query matrix is `ray.put` once (a few KB–MB), candidates
shuffle as (query_id, vec_id, sim) triples, never embeddings; bucket
routing is a narrow (bucket, vec_id) shuffle. For 10^9+ vectors swap the
in-task partial top-k for a per-bucket groupby top-k (same code path,
bigger `k_local`).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def _to_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    lst = batch.column(col)
    n = batch.num_rows
    if n == 0:
        # shape the empty matrix (0, d) so downstream matmuls against a
        # broadcast (N, d) matrix don't shape-mismatch on empty batches
        t = batch.schema.field(col).type
        d = t.list_size if pa.types.is_fixed_size_list(t) else 1
        return np.zeros((0, d), np.float64)
    flat = lst.combine_chunks().flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(n, -1).astype(np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)


def knn_brute(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    exclude_self: bool = True,
) -> pa.Table:
    """Exact top-k cosine neighbors per query → (query_id, vec_id, rank).

    Rank ties broken by vec_id ascending (deterministic, SQL-matchable).
    """
    qn = _normalize(np.asarray(queries, np.float64))
    qref = ray.put((np.asarray(query_ids, np.int64), qn))

    def local_topk(batch: pa.Table) -> pa.Table:
        qids, qmat = ray.get(qref)
        vids = np.asarray(batch.column("vec_id").to_pylist(), np.int64)
        m = _normalize(_to_matrix(batch))
        sims = qmat @ m.T  # (Q, B)
        kk = min(k + (1 if exclude_self else 0), sims.shape[1])
        if kk < sims.shape[1]:
            # one batched argpartition across all queries
            top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]  # (Q, kk)
        else:
            top = np.broadcast_to(np.arange(sims.shape[1]), (len(qids), sims.shape[1]))
        q_rep = np.repeat(qids, top.shape[1])
        flat_top = top.ravel()
        return pa.Table.from_arrays(
            [
                pa.array(q_rep),
                pa.array(vids[flat_top]),
                pa.array(np.take_along_axis(sims, top, axis=1).ravel()),
            ],
            names=["query_id", "vec_id", "sim"],
        )

    cands = ds.map_batches(local_topk, batch_format="pyarrow")
    df = pa.Table.from_pylist(
        cands.take_all(),
        schema=pa.schema(
            [("query_id", pa.int64()), ("vec_id", pa.int64()), ("sim", pa.float64())]
        ),
    ).to_pandas()
    if exclude_self:
        df = df[df["query_id"] != df["vec_id"]]
    df = df.sort_values(
        ["query_id", "sim", "vec_id"], ascending=[True, False, True]
    )
    df["rank"] = df.groupby("query_id").cumcount() + 1
    df = df[df["rank"] <= k][["query_id", "vec_id", "rank"]]
    return pa.Table.from_pandas(df.reset_index(drop=True), preserve_index=False)


class HyperplaneHasher:
    """Random-hyperplane LSH: sign pattern of `planes` dot products."""

    def __init__(self, dim: int, planes: int = 8, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.h = rng.standard_normal((planes, dim))
        self.planes = planes

    def bucket(self, m: np.ndarray) -> np.ndarray:
        bits = (m @ self.h.T) > 0  # (N, planes)
        return (bits.astype(np.int64) * (1 << np.arange(self.planes))).sum(axis=1)


def knn_lsh(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    planes: int = 6,
    tables: int = 8,
    dim: int | None = None,
    exclude_self: bool = True,
) -> pa.Table:
    """Approximate top-k via multi-table hyperplane LSH + 1-bit multiprobe.

    ``tables`` independent hash tables drive recall (1-(1-p)^L); each table
    uses ``planes`` hyperplanes, so a vector is scored only when it shares a
    bucket with the query in at least one table.
    """
    q = np.asarray(queries, np.float64)
    dim = dim or q.shape[1]
    hashers = [HyperplaneHasher(dim, planes, seed=42 + t) for t in range(tables)]
    qn = _normalize(q)
    probe: dict[tuple[int, int], list[int]] = {}
    for t, hasher in enumerate(hashers):
        qb = hasher.bucket(qn)
        for qi, b in enumerate(qb):
            probe.setdefault((t, int(b)), []).append(qi)
            for p in range(planes):  # multiprobe: flip each bit once
                probe.setdefault((t, int(b) ^ (1 << p)), []).append(qi)
    planes_mats = np.stack([h.h for h in hashers])  # (T, planes, dim)
    qref = ray.put((np.asarray(query_ids, np.int64), qn, probe, planes_mats))

    def local_topk(batch: pa.Table) -> pa.Table:
        qids, qmat, prb, pmats = ray.get(qref)
        vids = np.asarray(batch.column("vec_id").to_pylist(), np.int64)
        m = _normalize(_to_matrix(batch))
        out = []
        # candidate query set per vector row = union over tables
        cand: dict[int, set[int]] = {}
        for t in range(pmats.shape[0]):
            bits = (m @ pmats[t].T) > 0
            buckets = (
                bits.astype(np.int64) * (1 << np.arange(pmats.shape[1]))
            ).sum(axis=1)
            for b in np.unique(buckets):
                qis = prb.get((t, int(b)))
                if not qis:
                    continue
                rows = np.nonzero(buckets == b)[0]
                for qi in qis:
                    cand.setdefault(qi, set()).update(rows.tolist())
        for qi, rowset in cand.items():
            rows = np.fromiter(rowset, np.int64, len(rowset))
            s = qmat[qi] @ m[rows].T
            kk = min(k + 1, len(s))
            top = np.argpartition(-s, kk - 1)[:kk] if kk < len(s) else np.arange(len(s))
            out.append(
                pa.Table.from_arrays(
                    [
                        pa.array(np.full(len(top), qids[qi], np.int64)),
                        pa.array(vids[rows[top]]),
                        pa.array(s[top]),
                    ],
                    names=["query_id", "vec_id", "sim"],
                )
            )
        if not out:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64()), pa.array([], pa.int64()),
                 pa.array([], pa.float64())],
                names=["query_id", "vec_id", "sim"],
            )
        return pa.concat_tables(out)

    cands = ds.map_batches(local_topk, batch_format="pyarrow")
    df = pa.Table.from_pylist(
        cands.take_all(),
        schema=pa.schema(
            [("query_id", pa.int64()), ("vec_id", pa.int64()), ("sim", pa.float64())]
        ),
    ).to_pandas().drop_duplicates(["query_id", "vec_id"])
    if exclude_self:
        df = df[df["query_id"] != df["vec_id"]]
    df = df.sort_values(["query_id", "sim", "vec_id"], ascending=[True, False, True])
    df["rank"] = df.groupby("query_id").cumcount() + 1
    df = df[df["rank"] <= k][["query_id", "vec_id", "rank"]]
    return pa.Table.from_pandas(df.reset_index(drop=True), preserve_index=False)


def _kmeans_fit(
    sample: np.ndarray, nlist: int, iters: int = 10, seed: int = 42
) -> np.ndarray:
    """Deterministic spherical k-means (fixed iterations, seeded kmeans++
    init) over L2-normalized vectors → (nlist, dim) normalized centroids."""
    rng = np.random.default_rng(seed)
    x = _normalize(sample.astype(np.float64))
    centroids = np.empty((nlist, x.shape[1]))
    centroids[0] = x[int(rng.integers(len(x)))]
    d2 = None
    for c in range(1, nlist):
        sims = x @ centroids[:c].T
        d2 = np.maximum(1.0 - sims.max(axis=1), 1e-12)
        centroids[c] = x[int(rng.choice(len(x), p=d2 / d2.sum()))]
    for _ in range(iters):
        assign = np.argmax(x @ centroids.T, axis=1)
        for c in range(nlist):
            m = assign == c
            if m.any():
                v = x[m].mean(axis=0)
                centroids[c] = v / max(np.linalg.norm(v), 1e-30)
    return centroids


def knn_ivf(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    train_sample: int = 4096,
    exclude_self: bool = True,
) -> pa.Table:
    """Approximate top-k via IVF (inverted-file) coarse quantization — the
    second ANN scale path next to hyperplane LSH: a small sample trains
    nlist spherical-kmeans centroids driver-side (bounded ``limit`` read),
    the centroid matrix broadcasts once, and each batch scores a vector
    against a query ONLY when the vector's cell is among that query's
    nprobe nearest cells — so roughly nprobe/nlist of the corpus is
    scored. Candidates shuffle as (query_id, vec_id, sim) triples."""
    sample_rows = ds.select_columns(["embedding"]).limit(train_sample).take_all()
    sample = np.stack([np.asarray(r["embedding"], np.float64) for r in sample_rows])
    centroids = _kmeans_fit(sample, nlist)
    qn = _normalize(np.asarray(queries, np.float64))
    # each query probes its nprobe nearest cells
    q_cells = np.argsort(-(qn @ centroids.T), axis=1)[:, :nprobe]
    ref = ray.put((np.asarray(query_ids, np.int64), qn, centroids, q_cells))

    def local_topk(batch: pa.Table) -> pa.Table:
        qids, qmat, cents, qcells = ray.get(ref)
        vids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(_to_matrix(batch))
        if not len(vids):
            return pa.Table.from_arrays(
                [pa.array([], pa.int64()), pa.array([], pa.int64()),
                 pa.array([], pa.float64())],
                names=["query_id", "vec_id", "sim"],
            )
        cell = np.argmax(m @ cents.T, axis=1)
        out_q, out_v, out_s = [], [], []
        for qi in range(len(qids)):
            rows = np.nonzero(np.isin(cell, qcells[qi]))[0]
            if not len(rows):
                continue
            s = qmat[qi] @ m[rows].T
            kk = min(k + 1, len(s))
            top = (
                np.argpartition(-s, kk - 1)[:kk] if kk < len(s) else np.arange(len(s))
            )
            out_q.append(np.full(len(top), qids[qi], np.int64))
            out_v.append(vids[rows[top]])
            out_s.append(s[top])
        if not out_q:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64()), pa.array([], pa.int64()),
                 pa.array([], pa.float64())],
                names=["query_id", "vec_id", "sim"],
            )
        return pa.Table.from_arrays(
            [pa.array(np.concatenate(out_q)), pa.array(np.concatenate(out_v)),
             pa.array(np.concatenate(out_s))],
            names=["query_id", "vec_id", "sim"],
        )

    cands = ds.map_batches(local_topk, batch_format="pyarrow")
    df = pa.Table.from_pylist(
        cands.take_all(),
        schema=pa.schema(
            [("query_id", pa.int64()), ("vec_id", pa.int64()), ("sim", pa.float64())]
        ),
    ).to_pandas().drop_duplicates(["query_id", "vec_id"])
    if exclude_self:
        df = df[df["query_id"] != df["vec_id"]]
    df = df.sort_values(["query_id", "sim", "vec_id"], ascending=[True, False, True])
    df["rank"] = df.groupby("query_id").cumcount() + 1
    df = df[df["rank"] <= k][["query_id", "vec_id", "rank"]]
    return pa.Table.from_pandas(df.reset_index(drop=True), preserve_index=False)


def load_query_matrix(sf_dir: str, n_queries: int = 5):
    """First n vec_ids (deterministic) as the query set."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    df = t.to_pandas().sort_values("vec_id").head(n_queries)
    ids = df["vec_id"].to_numpy(np.int64)
    mat = np.stack([np.asarray(v, np.float64) for v in df["embedding"]])
    return ids, mat


def _kmeans_l2(
    sample: np.ndarray, k: int, iters: int = 10, seed: int = 42
) -> np.ndarray:
    """Deterministic plain-L2 k-means (seeded kmeans++ init, fixed
    iterations) for PQ sub-quantizers → (k, dsub) centroids."""
    rng = np.random.default_rng(seed)
    x = sample.astype(np.float64)
    cents = np.empty((k, x.shape[1]))
    cents[0] = x[int(rng.integers(len(x)))]
    for c in range(1, k):
        d2 = ((x[:, None, :] - cents[None, :c, :]) ** 2).sum(-1).min(axis=1)
        d2 = np.maximum(d2, 1e-12)
        cents[c] = x[int(rng.choice(len(x), p=d2 / d2.sum()))]
    for _ in range(iters):
        d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        assign = np.argmin(d2, axis=1)
        for c in range(k):
            msk = assign == c
            if msk.any():
                cents[c] = x[msk].mean(axis=0)
    return cents


def pq_train(
    ds: "ray.data.Dataset",
    m: int = 8,
    ksub: int = 32,
    train_sample: int = 4096,
    seed: int = 42,
) -> np.ndarray:
    """Train product-quantization codebooks on a bounded sample of
    L2-NORMALIZED vectors (cosine search space) → (m, ksub, dim/m).
    Driver-side like IVF's coarse quantizer: the sample is a ``limit``
    read, never the full table."""
    rows = ds.select_columns(["embedding"]).limit(train_sample).take_all()
    x = _normalize(np.stack([np.asarray(r["embedding"], np.float64) for r in rows]))
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    return np.stack(
        [
            _kmeans_l2(x[:, j * dsub : (j + 1) * dsub], ksub, seed=seed + j)
            for j in range(m)
        ]
    )


def pq_encode_batch(batch: pa.Table, codebooks: np.ndarray) -> pa.Table:
    """Encode a batch's (normalized) vectors to m uint8 codes — the 32×
    memory-compression path for 10^10+-vector corpora (a 64-dim float32
    vector becomes 8 bytes). Vectorized argmin per subspace."""
    m, ksub, dsub = codebooks.shape
    vids = batch.column("vec_id")
    x = _normalize(_to_matrix(batch))
    n = x.shape[0]
    codes = np.empty((n, m), np.uint8)
    for j in range(m):
        sub = x[:, j * dsub : (j + 1) * dsub]
        # ||a-b||² = ||a||² - 2ab + ||b||²; the ||a||² term is rank-constant
        d2 = (codebooks[j] ** 2).sum(-1)[None, :] - 2.0 * (sub @ codebooks[j].T)
        codes[:, j] = np.argmin(d2, axis=1).astype(np.uint8)
    return pa.Table.from_arrays(
        [
            vids,
            pa.FixedSizeListArray.from_arrays(
                pa.array(codes.ravel(), pa.uint8()), m
            ),
        ],
        names=["vec_id", "codes"],
    )


def knn_pq(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    m: int = 8,
    ksub: int = 32,
    rerank: int = 8,
    train_sample: int = 4096,
    exclude_self: bool = True,
) -> pa.Table:
    """Approximate top-k via product quantization with asymmetric distance
    computation (ADC) + in-batch exact rerank — the third ANN path next to
    hyperplane LSH and IVF, for corpora whose vectors don't fit memory
    uncompressed. Per batch: vectors are PQ-encoded, each query ranks them
    by summed codebook distance-table lookups (no full dot products), and
    only the top ``k·rerank`` ADC candidates get exact cosine scores. The
    codebooks (m·ksub·dsub floats) broadcast once; candidates shuffle as
    (query_id, vec_id, sim) triples. At default settings the reranked
    result equals brute force on the driver corpus (pinned by the SQL
    oracle); the ADC recall floor is asserted separately in pytest."""
    codebooks = pq_train(ds, m=m, ksub=ksub, train_sample=train_sample)
    qn = _normalize(np.asarray(queries, np.float64))
    dsub = codebooks.shape[2]
    # per-query distance tables: dt[q, j, c] = ||q_j - codebook[j, c]||²
    dt = np.stack(
        [
            ((qn[:, j * dsub : (j + 1) * dsub][:, None, :] - codebooks[j][None])
             ** 2).sum(-1)
            for j in range(codebooks.shape[0])
        ],
        axis=1,
    )  # (Q, m, ksub)
    ref = ray.put((np.asarray(query_ids, np.int64), qn, codebooks, dt))

    def local_topk(batch: pa.Table) -> pa.Table:
        qids, qmat, cbs, dtab = ray.get(ref)
        empty = pa.Table.from_arrays(
            [pa.array([], pa.int64()), pa.array([], pa.int64()),
             pa.array([], pa.float64())],
            names=["query_id", "vec_id", "sim"],
        )
        if batch.num_rows == 0:
            return empty
        vids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        x = _normalize(_to_matrix(batch))
        mm, kk_, ds_ = cbs.shape
        codes = np.empty((x.shape[0], mm), np.int64)
        for j in range(mm):
            sub = x[:, j * ds_ : (j + 1) * ds_]
            d2 = (cbs[j] ** 2).sum(-1)[None, :] - 2.0 * (sub @ cbs[j].T)
            codes[:, j] = np.argmin(d2, axis=1)
        # ADC: approx distance of every vector to every query via table
        # lookups — (Q, N) from (Q, m, ksub)[codes]
        adc = dtab[:, np.arange(mm)[None, :], codes].sum(-1)  # (Q, N)
        n_cand = min(k * rerank + 1, adc.shape[1])
        cand = (
            np.argpartition(adc, n_cand - 1, axis=1)[:, :n_cand]
            if n_cand < adc.shape[1]
            else np.broadcast_to(np.arange(adc.shape[1]), (len(qids), adc.shape[1]))
        )
        out_q, out_v, out_s = [], [], []
        for qi in range(len(qids)):
            rows = cand[qi]
            s = qmat[qi] @ x[rows].T  # exact rerank on candidates only
            out_q.append(np.full(len(rows), qids[qi], np.int64))
            out_v.append(vids[rows])
            out_s.append(s)
        return pa.Table.from_arrays(
            [pa.array(np.concatenate(out_q)), pa.array(np.concatenate(out_v)),
             pa.array(np.concatenate(out_s))],
            names=["query_id", "vec_id", "sim"],
        )

    cands = ds.map_batches(local_topk, batch_format="pyarrow")
    df = pa.Table.from_pylist(
        cands.take_all(),
        schema=pa.schema(
            [("query_id", pa.int64()), ("vec_id", pa.int64()), ("sim", pa.float64())]
        ),
    ).to_pandas().drop_duplicates(["query_id", "vec_id"])
    if exclude_self:
        df = df[df["query_id"] != df["vec_id"]]
    df = df.sort_values(["query_id", "sim", "vec_id"], ascending=[True, False, True])
    df["rank"] = df.groupby("query_id").cumcount() + 1
    df = df[df["rank"] <= k][["query_id", "vec_id", "rank"]]
    return pa.Table.from_pandas(df.reset_index(drop=True), preserve_index=False)
