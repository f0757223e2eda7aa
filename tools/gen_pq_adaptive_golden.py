#!/usr/bin/env python3
"""Kernel-replay golden for x_refresh_adaptive's RETRAINED leg.

The entry probes an IVF-PQ index whose codebooks and coarse centroids
were density-adaptively trained: hash-sampled initializers + integer
Lloyd refinement (graft.operators.Pq.refineFlat — exact BIGINT
assignment/recenter with an SSE guard). Integer k-means is
bit-replayable but not a single SQL pass, so like the LSH/SimHash/IVF
families the probe's top-10 lists are verified against a committed
golden this script re-derives INDEPENDENTLY (numpy int64 — exact for
|x| <= 127 grids) rather than dumped from the Spark side.

Replayed pipeline, per SF (must track the Scala constants):
  union   = embeddings ∪ (vec_id+10^7, abs-folded embedding)
  q       = int8 quantize: floor(x * 127 / max|x|)  (double arithmetic)
  cb init = 256 smallest (hashRank(id), id) union codes, per-subspace
            slices (m=8, sub=8); cent init = 64 smallest
            (hashRank(id, salt=7), id) full codes
  refine  = adaptiveRefineIters (= 5, Queries.scala) integer Lloyd
            rounds per grid: exact int squared-L2 argmin (ties ->
            smallest code), recenter to floorDiv(2*sum + n, 2n) only
            when it strictly lowers the cluster SSE, empty clusters
            keep their codeword
  encode  = per-subspace argmin under the refined codebook;
            cells = full-code argmin under the refined centroids
  probe   = drifted queries (ids 10^7..10^7+19), top-8 cells by
            cc - 2*dot (ties cell asc), ADC = sum of subspace dots,
            top-10 by (adc desc, id asc)

Output: tools/golden/pq_adaptive_topk.parquet
        (corpus_key, query_id, vec_id, rank, adc_dot), corpus_key =
        sum(floor(first_component * 2^48)) over the BASE embeddings —
        the same discriminator every embedding golden uses.

Usage: python3 tools/gen_pq_adaptive_golden.py
"""
import math

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SFS = ["0.001", "0.01", "0.1"]
M = 8
NCODE = 256
NLIST = 64
N_PROBE = 8
K = 10
REFINE_ITERS = 5  # = Queries.adaptiveRefineIters

P = 2147483647
A = 1103515245
B = 784588716


def hash_rank(vid, salt=0):
    r0 = (vid % P) + ((salt % P) + P) % P
    return ((r0 * A) % P * B) % P


def int8_codes(v):
    """Similarity.int8Quantize replay: floor(x * 127 / max|x|)."""
    if not v:
        return []
    mx = max(abs(float(x)) for x in v)
    if mx == 0.0:
        return [0] * len(v)
    return [math.floor(float(x) * 127.0 / mx) for x in v]


def assign(V, CB):
    """Exact int squared-L2 argmin rows of V against rows of CB
    (ties -> smallest index; np.argmin keeps the first minimum)."""
    # (n, nc) distance table; int64 exact at these magnitudes
    d = ((V[:, None, :] - CB[None, :, :]) ** 2).sum(axis=2)
    return d.argmin(axis=1)


def refine(V, init, iters):
    """Integer Lloyd replay of Pq.refineFlat over ONE grid: V (n, sub)
    int64 training rows, init (nc, sub) int64 codewords."""
    cb = init.copy()
    n_rows = V.shape[0]
    nc, sub = cb.shape
    for _ in range(iters):
        a = assign(V, cb)
        for c in range(nc):
            members = V[a == c]
            n = members.shape[0]
            if n == 0:
                continue
            s = members.sum(axis=0, dtype=np.int64)
            sxx = int((members.astype(np.int64) ** 2).sum())
            cand = (2 * s + n) // (2 * n)  # floorDiv, matches Java/Scala
            cw = cb[c]
            sse_old = sxx - 2 * int((cw * s).sum()) + n * int((cw * cw).sum())
            sse_cand = sxx - 2 * int((cand * s).sum()) + n * int((cand * cand).sum())
            if sse_cand < sse_old:
                cb[c] = cand
    return cb


def adaptive_topk(vecs):
    """vecs: {vid: [float, ...]} UNION corpus. Returns
    [(query_id, vec_id, rank, adc_dot)] for the drifted queries."""
    ids = sorted(vecs)
    codes = {vid: int8_codes(vecs[vid]) for vid in ids}
    dim = len(next(iter(codes.values())))
    sub = dim // M

    by_h0 = sorted(ids, key=lambda v: (hash_rank(v), v))[:NCODE]
    by_h7 = sorted(ids, key=lambda v: (hash_rank(v, 7), v))[:NLIST]
    Q = np.array([codes[v] for v in ids], dtype=np.int64)

    # per-subspace codebooks: one (nc, sub) grid per subspace, refined
    # independently (Pq.refineFlat runs them as one (m, nc, sub) grid;
    # subspaces never interact)
    cb = []
    for j in range(M):
        init = np.array([codes[v][j * sub:(j + 1) * sub] for v in by_h0],
                        dtype=np.int64)
        cb.append(refine(Q[:, j * sub:(j + 1) * sub], init, REFINE_ITERS))

    cent_init = np.array([codes[v] for v in by_h7], dtype=np.int64)
    cent = refine(Q, cent_init, REFINE_ITERS)

    # encode + route the union under the refined grids
    enc = np.stack([assign(Q[:, j * sub:(j + 1) * sub], cb[j])
                    for j in range(M)], axis=1)  # (n, m)
    cell = assign(Q, cent)  # (n,)
    cc = (cent * cent).sum(axis=1)  # (nlist,)

    out = []
    qids = [v for v in ids if 10000000 <= v < 10000020]
    id_arr = np.array(ids, dtype=np.int64)
    for qid in qids:
        qq = np.array(codes[qid], dtype=np.int64)
        # top-8 cells by cc - 2*dot, ties cell asc (argsort is stable,
        # cells are already in ascending order)
        dist = cc - 2 * (cent @ qq)
        probed = set(np.argsort(dist, kind="stable")[:N_PROBE].tolist())
        # per-subspace LUT: lut[j][c] = dot(q_sub_j, cw[j][c])
        lut = [cb[j] @ qq[j * sub:(j + 1) * sub] for j in range(M)]
        mask = np.array([cell[i] in probed for i in range(len(ids))])
        cand_idx = np.nonzero(mask)[0]
        scored = []
        for i in cand_idx:
            adc = int(sum(lut[j][enc[i, j]] for j in range(M)))
            scored.append((-adc, int(id_arr[i]), adc))
        scored.sort()
        for rank, (_, vid, adc) in enumerate(scored[:K], start=1):
            out.append((qid, vid, rank, adc))
    return out


rows = []
for sf in SFS:
    base = {
        vid: list(v)
        for vid, v in duckdb.sql(
            f"SELECT vec_id, embedding FROM "
            f"'/root/testdata/sf{sf}/embeddings.parquet'"
        ).fetchall()
    }
    emb_key = sum(math.floor(v[0] * float(1 << 48)) for v in base.values())
    union = dict(base)
    for vid, v in base.items():
        union[vid + 10000000] = [abs(x) for x in v]
    topk = adaptive_topk(union)
    rows += [(emb_key, q, i, r, d) for q, i, r, d in topk]
    print(f"sf{sf}: emb_key={emb_key}, {len(topk)} golden rows")

pq.write_table(
    pa.table({
        "corpus_key": pa.array([r[0] for r in rows], pa.int64()),
        "query_id": pa.array([r[1] for r in rows], pa.int64()),
        "vec_id": pa.array([r[2] for r in rows], pa.int64()),
        "rank": pa.array([r[3] for r in rows], pa.int32()),
        "adc_dot": pa.array([r[4] for r in rows], pa.int64()),
    }),
    "tools/golden/pq_adaptive_topk.parquet",
)
print("wrote tools/golden/pq_adaptive_topk.parquet")
