#!/usr/bin/env python3
"""Golden-oracle generator for x_ann_lsh and x_dedup_embedding.

Both catalog entries hash vectors through deterministic hyperplane LSH
(graft.functions.Kernels.signBucket, splitmix64-derived planes), so
their outputs are engine-specific — no SQL engine can derive them from
the data alone — but fully deterministic. This script replays the
kernels in Python (64-bit wraparound splitmix64, identical
plane-component derivation, identical sequential float accumulation
order so every double is bit-exact) over the three test scale factors
and writes:

  tools/golden/lsh_topk.parquet        (corpus_key, query_id, id, rank)
  tools/golden/embedding_pairs.parquet (corpus_key, id_a, id_b, cosine)
  tools/golden/knn_graph_ann.parquet   (corpus_key, query_id, id, rank)

corpus_key discriminates which embeddings table a golden row belongs
to, computed portably in both DuckDB and here as
  sum(floor(first_component * 2^48))
— float32→double widening, power-of-two scaling, floor, and integer
summation are all exact, so the key is engine-independent. The oracle
SQL computes the key for the table under test and selects the matching
golden subset; an unseen corpus selects nothing and fails loudly as a
row-count mismatch.

Usage: python3 tools/gen_lsh_golden.py
"""
import math

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SFS = ["0.001", "0.01", "0.1"]
M64 = (1 << 64) - 1
KEY_SCALE = float(1 << 48)


def splitmix64(x):
    x = (x + 0x9E3779B97F4A7C15) & M64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & M64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & M64
    return x ^ (x >> 31)


def signed64(v):
    return v - (1 << 64) if v >= (1 << 63) else v


def plane_component(seed, p, i):
    arg = (seed * 0x9E3779B9 + p * 0x85EBCA6B + i) & M64
    return signed64(splitmix64(arg)) / 9223372036854775807.0


def sign_bucket(vec, planes, seed):
    bucket = 0
    for p in range(planes):
        acc = 0.0
        for i, x in enumerate(vec):
            acc += x * plane_component(seed, p, i)
        if acc >= 0:
            bucket |= 1 << p
    return bucket


def sign_buckets(vec, planes, tables, base_seed=17):
    return [sign_bucket(vec, planes, t * 7919 + base_seed) for t in range(tables)]


def cosine(a, b):
    # kernel replay: one pass, sequential accumulation order
    dot = 0.0
    na = 0.0
    nb = 0.0
    for x, y in zip(a, b):
        dot += x * y
        na += x * x
        nb += y * y
    denom = math.sqrt(na) * math.sqrt(nb)
    return 0.0 if denom == 0.0 else dot / denom


def load(sf):
    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM "
        f"'/root/testdata/sf{sf}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    # duckdb surfaces float32 list elements as exact-widened Python floats
    return {vid: list(vec) for vid, vec in rows}


def corpus_key(vecs):
    return sum(math.floor(v[0] * KEY_SCALE) for v in vecs.values())


def bucket_groups(vecs, planes, tables):
    groups = {}
    for vid, vec in vecs.items():
        for band, bucket in enumerate(sign_buckets(vec, planes, tables)):
            groups.setdefault((band, bucket), []).append(vid)
    return groups


def embedding_pairs(vecs, threshold=0.35, planes=6, tables=8, max_bucket=1000):
    """Replay of Dedup.embeddingNearDups: bucket -> capped pair expansion
    -> exact-cosine verify."""
    pairs = set()
    for ids in bucket_groups(vecs, planes, tables).values():
        if 2 <= len(ids) <= max_bucket:
            ids = sorted(ids)
            for i, a in enumerate(ids):
                for b in ids[i + 1:]:
                    pairs.add((a, b))
    out = []
    for a, b in sorted(pairs):
        c = cosine(vecs[a], vecs[b])
        if c >= threshold:
            out.append((a, b, c))
    return out


def lsh_topk(vecs, k=10, planes=10, tables=6):
    """Replay of Similarity.lshTopK for queries vec_id < 5."""
    queries = {qid: v for qid, v in vecs.items() if qid < 5}
    corpus_buckets = {vid: sign_buckets(v, planes, tables) for vid, v in vecs.items()}
    out = []
    for qid, qv in queries.items():
        qb = sign_buckets(qv, planes, tables)
        cands = {
            vid
            for vid, cb in corpus_buckets.items()
            if any(cb[t] == qb[t] for t in range(tables))
        }
        scored = sorted(((cosine(vecs[c], qv), c) for c in cands),
                        key=lambda t: (-t[0], t[1]))
        for rank, (_, vid) in enumerate(scored[:k], start=1):
            out.append((qid, vid, rank))
    return out


def knn_graph_ann(vecs, k=5, planes=6, tables=8, max_bucket=1000):
    """Replay of Similarity.knnGraphApprox: zero-norm filter -> band ->
    capped bucket pair expansion -> exact-cosine score (symmetric, one
    eval per undirected pair) -> per-query top-k by (-cosine, id)."""
    nz = {vid: v for vid, v in vecs.items() if sum(x * x for x in v) > 0.0}
    cands = {}
    for ids in bucket_groups(nz, planes, tables).values():
        if 2 <= len(ids) <= max_bucket:
            for a in ids:
                for b in ids:
                    if a != b:
                        cands.setdefault(a, set()).add(b)
    out = []
    for qid in sorted(cands):
        scored = sorted(((cosine(nz[c], nz[qid]), c) for c in cands[qid]),
                        key=lambda t: (-t[0], t[1]))
        for rank, (_, vid) in enumerate(scored[:k], start=1):
            out.append((qid, vid, rank))
    return out


pair_rows, topk_rows, knn_rows = [], [], []
for sf in SFS:
    vecs = load(sf)
    key = corpus_key(vecs)
    pairs = embedding_pairs(vecs)
    topk = lsh_topk(vecs)
    knn = knn_graph_ann(vecs)
    pair_rows += [(key, a, b, c) for a, b, c in pairs]
    topk_rows += [(key, q, i, r) for q, i, r in topk]
    knn_rows += [(key, q, i, r) for q, i, r in knn]
    print(f"sf{sf}: corpus_key={key}, {len(pairs)} pairs, {len(topk)} topk, "
          f"{len(knn)} knn rows")

pq.write_table(
    pa.table(
        {
            "corpus_key": pa.array([r[0] for r in pair_rows], pa.int64()),
            "id_a": pa.array([r[1] for r in pair_rows], pa.int64()),
            "id_b": pa.array([r[2] for r in pair_rows], pa.int64()),
            "cosine": pa.array([r[3] for r in pair_rows], pa.float64()),
        }
    ),
    "tools/golden/embedding_pairs.parquet",
)
pq.write_table(
    pa.table(
        {
            "corpus_key": pa.array([r[0] for r in topk_rows], pa.int64()),
            "query_id": pa.array([r[1] for r in topk_rows], pa.int64()),
            "id": pa.array([r[2] for r in topk_rows], pa.int64()),
            "rank": pa.array([r[3] for r in topk_rows], pa.int32()),
        }
    ),
    "tools/golden/lsh_topk.parquet",
)
pq.write_table(
    pa.table(
        {
            "corpus_key": pa.array([r[0] for r in knn_rows], pa.int64()),
            "query_id": pa.array([r[1] for r in knn_rows], pa.int64()),
            "id": pa.array([r[2] for r in knn_rows], pa.int64()),
            "rank": pa.array([r[3] for r in knn_rows], pa.int32()),
        }
    ),
    "tools/golden/knn_graph_ann.parquet",
)
print("wrote tools/golden/{embedding_pairs,lsh_topk,knn_graph_ann}.parquet")
