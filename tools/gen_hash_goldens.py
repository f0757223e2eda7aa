#!/usr/bin/env python3
"""Golden-oracle generator for x_dedup_simhash, x_ann_ivf, and x_diversity_sample.

Like tools/gen_lsh_golden.py, these two catalog entries hash data
through engine-side kernels (XXH64 token hashes for SimHash; an
XXH64-ordered centroid sample for IVF), so their outputs are
engine-specific but fully deterministic. This script replays the
kernels in Python — including a from-spec XXH64 (Collet's public
xxHash, the same algorithm Spark's XXH64 ports) — and writes:

  tools/golden/simhash_pairs.parquet (corpus_key, id_a, id_b, hamming)
  tools/golden/ivf_topk.parquet      (corpus_key, query_id, id, rank)

corpus_key discriminates the table under test, computed portably in
DuckDB and here:
  documents:  sum((doc_id+1) * length(text))   -- code-point length
  embeddings: sum(floor(first_component * 2^48))
Exact integer arithmetic both sides; an unseen corpus selects zero
golden rows and fails as a row-count mismatch.

Replication notes:
 - SimHash tokens are Spark `split(trim(text), '\\s+')`: trim strips
   ASCII spaces only; split keeps every empty token (limit -1, Java
   ASCII \\s) — Python re.split matches with re.ASCII;
 - each token's XXH64 (seed 7) votes per bit; banding is 4 x 16-bit
   blocks (maxDistance 3); buckets capped at 1000; pairs verified at
   hamming <= 3;
 - IVF centroids are the nlist=64 corpus vectors with the smallest
   SIGNED xxhash64(id) (Spark's xxhash64, seed 42, long input), in
   that hash order; assignment/probing replays the insertion-sorted
   nearest-centroid kernel (strict >, ties keep the earlier centroid)
   with the same sequential float accumulation so doubles are
   bit-exact.

Usage: python3 tools/gen_hash_goldens.py
"""
import math
import re

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SFS = ["0.001", "0.01", "0.1"]
M64 = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & M64


def fmix(h):
    h ^= h >> 33
    h = (h * P2) & M64
    h ^= h >> 29
    h = (h * P3) & M64
    h ^= h >> 32
    return h


def xxh64(data, seed):
    """Reference XXH64 over bytes (little-endian reads)."""
    n = len(data)
    if n >= 32:
        v1 = (seed + P1 + P2) & M64
        v2 = (seed + P2) & M64
        v3 = seed & M64
        v4 = (seed - P1) & M64
        def rnd(acc, lane):
            return (rotl((acc + lane * P2) & M64, 31) * P1) & M64

        i = 0
        while i + 32 <= n:
            v1 = rnd(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = rnd(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = rnd(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = rnd(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)) & M64
        for v in (v1, v2, v3, v4):
            h ^= (rotl((v * P2) & M64, 31) * P1) & M64
            h = ((h * P1) + P4) & M64
    else:
        h = (seed + P5) & M64
        i = 0
    h = (h + n) & M64
    while i + 8 <= n:
        lane = int.from_bytes(data[i:i + 8], "little")
        h ^= (rotl((lane * P2) & M64, 31) * P1) & M64
        h = ((rotl(h, 27) * P1) + P4) & M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * P1) & M64
        h = ((rotl(h, 23) * P2) + P3) & M64
        i += 4
    while i < n:
        h ^= (data[i] * P5) & M64
        h = (rotl(h, 11) * P1) & M64
        i += 1
    return fmix(h)


def xxh64_long(value, seed):
    """Spark XXH64.hashLong: one 8-byte lane, not byte hashing."""
    h = (seed + P5 + 8) & M64
    h ^= (rotl(((value & M64) * P2) & M64, 31) * P1) & M64
    h = ((rotl(h, 27) * P1) + P4) & M64
    return fmix(h)


def signed64(v):
    return v - (1 << 64) if v >= (1 << 63) else v


# ---------------------------------------------------------------------
# SimHash near-dup replay (Dedup.simHashNearDups, maxDistance=3)
# ---------------------------------------------------------------------

WS = re.compile(r"\s+", re.ASCII)


def tokens(text):
    return WS.split(text.strip(" "))


def simhash64(toks):
    votes = [0] * 64
    for t in toks:
        h = xxh64(t.encode("utf-8"), 7)
        for j in range(64):
            votes[j] += 1 if (h >> j) & 1 else -1
    out = 0
    for j in range(64):
        if votes[j] > 0:
            out |= 1 << j
    return out


def simhash_pairs(docs, max_distance=3, max_bucket=1000):
    hashes = {did: simhash64(tokens(t)) for did, t in docs.items()}
    blocks = max_distance + 1
    bits = 64 // blocks
    mask = (1 << bits) - 1
    groups = {}
    for did, h in hashes.items():
        for b in range(blocks):
            groups.setdefault((b, (h >> (b * bits)) & mask), []).append(did)
    pairs = set()
    for ids in groups.values():
        if 2 <= len(ids) <= max_bucket:
            ids = sorted(ids)
            for i, a in enumerate(ids):
                for b in ids[i + 1:]:
                    pairs.add((a, b))
    out = []
    for a, b in sorted(pairs):
        ham = bin(hashes[a] ^ hashes[b]).count("1")
        if ham <= max_distance:
            out.append((a, b, ham))
    return out


# ---------------------------------------------------------------------
# MinHash estimated-pair replay (Dedup.minHashEstimatedPairs:
# shingleSize=3, numHashes=64, bands=16, threshold=0.5, maxBucket=1000)
# ---------------------------------------------------------------------

SM1 = 0x9E3779B97F4A7C15
SM2 = 0xBF58476D1CE4E5B9
SM3 = 0x94D049BB133111EB


def splitmix64(x):
    x = (x + SM1) & M64
    x = ((x ^ (x >> 30)) * SM2) & M64
    x = ((x ^ (x >> 27)) * SM3) & M64
    return x ^ (x >> 31)


# Kernels.shingles uses Java String.trim (strips every char <= U+0020),
# unlike the Spark SQL trim() the SimHash path goes through
JTRIM = "".join(chr(i) for i in range(0x21))


def shingles3(text, n=3):
    """Kernels.shingles replay: Java trim, ASCII \\s+ split, n-token
    windows joined by single spaces, first-occurrence dedup."""
    toks = WS.split(text.strip(JTRIM))
    m = len(toks)
    if m < n or (m == 1 and toks[0] == ""):
        return []
    return list(dict.fromkeys(" ".join(toks[i:i + n]) for i in range(m - n + 1)))


GA = [splitmix64(2 * j + 1) | 1 for j in range(64)]
GB = [splitmix64(2 * j) for j in range(64)]
LONG_MAX = (1 << 63) - 1


def minhash_signature(shs, num_hashes=64):
    """Each shingle xxh64'd once (seed 42); g_j = a_j*h + b_j with
    SIGNED 64-bit wraparound; min per row by signed comparison."""
    sig = [LONG_MAX] * num_hashes
    for s in shs:
        h = xxh64(s.encode("utf-8"), 42)
        for j in range(num_hashes):
            g = signed64((h * GA[j] + GB[j]) & M64)
            if g < sig[j]:
                sig[j] = g
    return sig


def minhash_bands(sig, bands=16):
    rows = len(sig) // bands
    out = []
    for b in range(bands):
        h = (0x517CC1B727220A95 + b) & M64
        for r in range(b * rows, (b + 1) * rows):
            h = xxh64_long(sig[r], h)
        out.append(h)
    return out


def minhash_bucket_hist(docs, num_hashes=64, bands=16):
    """(band, bucket) population histogram: bucket_size -> n_buckets."""
    buckets = {}
    for did, t in docs.items():
        shs = shingles3(t)
        if not shs:
            continue
        sig = minhash_signature(shs, num_hashes)
        for b, bk in enumerate(minhash_bands(sig, bands)):
            buckets[(b, bk)] = buckets.get((b, bk), 0) + 1
    hist = {}
    for sz in buckets.values():
        hist[sz] = hist.get(sz, 0) + 1
    return sorted(hist.items())


def minhash_est_pairs(docs, threshold=0.5, max_bucket=1000,
                      num_hashes=64, bands=16):
    sigs, buckets = {}, {}
    for did, t in docs.items():
        shs = shingles3(t)
        if not shs:
            continue
        sig = minhash_signature(shs, num_hashes)
        sigs[did] = sig
        for b, bk in enumerate(minhash_bands(sig, bands)):
            buckets.setdefault((b, bk), []).append(did)
    cands = set()
    for ids in buckets.values():
        if 2 <= len(ids) <= max_bucket:
            ids = sorted(ids)
            for i, a in enumerate(ids):
                for b in ids[i + 1:]:
                    cands.add((a, b))
    min_agree = math.ceil(threshold * num_hashes)
    out = []
    for a, b in sorted(cands):
        agree = sum(1 for x, y in zip(sigs[a], sigs[b]) if x == y)
        if agree >= min_agree:
            out.append((a, b, agree))
    return out


# ---------------------------------------------------------------------
# IVF top-k replay (Ivf.ivfTopK: k=10, nlist=64, nProbe=8)
# ---------------------------------------------------------------------

def nearest_centroids(vec, centroids, n_probe):
    """Kernel replay: insertion-sorted descending top list, strict >."""
    vn = 0.0
    v = list(vec)
    for x in v:
        vn += x * x
    top_idx = [0] * min(n_probe, len(centroids))
    top_sim = [float("-inf")] * len(top_idx)
    for c, cent in enumerate(centroids):
        dot = 0.0
        cn = 0.0
        for j in range(min(len(v), len(cent))):
            x = cent[j]
            dot += v[j] * x
            cn += x * x
        denom = math.sqrt(vn) * math.sqrt(cn)
        sim = 0.0 if denom == 0.0 else dot / denom
        pos = len(top_idx) - 1
        if sim > top_sim[pos]:
            while pos > 0 and sim > top_sim[pos - 1]:
                top_sim[pos] = top_sim[pos - 1]
                top_idx[pos] = top_idx[pos - 1]
                pos -= 1
            top_sim[pos] = sim
            top_idx[pos] = c
    return top_idx


def cosine(a, b):
    dot = 0.0
    na = 0.0
    nb = 0.0
    for x, y in zip(a, b):
        dot += x * y
        na += x * x
        nb += y * y
    denom = math.sqrt(na) * math.sqrt(nb)
    return 0.0 if denom == 0.0 else dot / denom


def ivf_probe_sweep(vecs, probes=(2, 4, 8), k=10, nlist=64):
    """ivf_topk at several nProbe settings: (n_probe, qid, id, rank)."""
    out = []
    for p in probes:
        for qid, vid, rank in ivf_topk(vecs, k=k, nlist=nlist, n_probe=p):
            out.append((p, qid, vid, rank))
    return out


def ivf_topk(vecs, k=10, nlist=64, n_probe=8):
    by_hash = sorted(
        (vid for vid, v in vecs.items() if v),
        key=lambda vid: signed64(xxh64_long(vid, 42)),
    )
    centroids = [vecs[vid] for vid in by_hash[:nlist]]
    cell = {vid: nearest_centroids(v, centroids, 1)[0] for vid, v in vecs.items()}
    out = []
    for qid in sorted(v for v in vecs if v < 5):
        qv = vecs[qid]
        probes = set(nearest_centroids(qv, centroids, n_probe))
        cands = [vid for vid, c in cell.items() if c in probes]
        scored = sorted(((cosine(vecs[c], qv), c) for c in cands),
                        key=lambda t: (-t[0], t[1]))
        for rank, (_, vid) in enumerate(scored[:k], start=1):
            out.append((qid, vid, rank))
    return out


# ---------------------------------------------------------------------

def int8_codes(v):
    """Kernel replay of Similarity.int8Quantize: floor(x*127/max|x|)."""
    if not v:
        return []
    mx = max(abs(float(x)) for x in v)
    if mx == 0.0:
        return [0] * len(v)
    return [math.floor(float(x) * 127.0 / mx) for x in v]


def ivf_int8_topk(vecs, k=10, nlist=64, n_probe=8):
    """Ivf.ivfInt8TopK replay: IVF routing + exact int8 integer dot."""
    by_hash = sorted(
        (vid for vid, v in vecs.items() if v),
        key=lambda vid: signed64(xxh64_long(vid, 42)),
    )
    centroids = [vecs[vid] for vid in by_hash[:nlist]]
    cell = {vid: nearest_centroids(v, centroids, 1)[0] for vid, v in vecs.items()}
    codes = {vid: int8_codes(v) for vid, v in vecs.items()}
    out = []
    for qid in sorted(v for v in vecs if v < 5):
        probes = set(nearest_centroids(vecs[qid], centroids, n_probe))
        qc = codes[qid]
        cands = [vid for vid, c in cell.items() if c in probes]
        scored = sorted(
            ((sum(a * b for a, b in zip(codes[c], qc)), c) for c in cands),
            key=lambda t: (-t[0], t[1]))
        for rank, (d, vid) in enumerate(scored[:k], start=1):
            out.append((qid, vid, rank, d))
    return out


def ivf_cell_hist(vecs, nlist=64):
    """Replay of Ivf.assign cell populations: cell_size -> n_cells."""
    by_hash = sorted(
        (vid for vid, v in vecs.items() if v),
        key=lambda vid: signed64(xxh64_long(vid, 42)),
    )
    centroids = [vecs[vid] for vid in by_hash[:nlist]]
    sizes = {}
    for v in vecs.values():
        c = nearest_centroids(v, centroids, 1)[0]
        sizes[c] = sizes.get(c, 0) + 1
    hist = {}
    for sz in sizes.values():
        hist[sz] = hist.get(sz, 0) + 1
    return sorted(hist.items())


def diversity_sample(vecs, nlist=64, per_cell=3):
    """Replay of Ivf.diversitySample: hash-sampled centroids (same as
    ivf_topk), nearest-cell assignment, per-cell keep of the per_cell
    ids with the smallest signed xxh64(id, 42), ties by id."""
    by_hash = sorted(
        (vid for vid, v in vecs.items() if v),
        key=lambda vid: signed64(xxh64_long(vid, 42)),
    )
    centroids = [vecs[vid] for vid in by_hash[:nlist]]
    cell = {vid: nearest_centroids(v, centroids, 1)[0] for vid, v in vecs.items()}
    by_cell = {}
    for vid, c in cell.items():
        by_cell.setdefault(c, []).append(vid)
    out = []
    for c in sorted(by_cell):
        picked = sorted(by_cell[c],
                        key=lambda vid: (signed64(xxh64_long(vid, 42)), vid))
        for pos, vid in enumerate(picked[:per_cell], start=1):
            out.append((c, pos, vid))
    return out


sim_rows, ivf_rows, div_rows, mh_rows, mh16_rows, mhh_rows = [], [], [], [], [], []
sweep_rows, cell_rows, vcell_rows, i8_rows = [], [], [], []
for sf in SFS:
    docs = dict(
        duckdb.sql(
            f"SELECT doc_id, text FROM '/root/testdata/sf{sf}/documents.parquet' "
            f"WHERE text IS NOT NULL"
        ).fetchall()
    )
    doc_key = sum((did + 1) * len(t) for did, t in docs.items())
    pairs = simhash_pairs(docs)
    sim_rows += [(doc_key, a, b, h) for a, b, h in pairs]
    mh = minhash_est_pairs(docs)
    mh_rows += [(doc_key, a, b, g) for a, b, g in mh]
    mh16 = minhash_est_pairs(docs, num_hashes=16, bands=4)
    mh16_rows += [(doc_key, a, b, g) for a, b, g in mh16]
    mhh_rows += [(doc_key, sz, nb) for sz, nb in minhash_bucket_hist(docs)]

    vecs = {
        vid: list(v)
        for vid, v in duckdb.sql(
            f"SELECT vec_id, embedding FROM "
            f"'/root/testdata/sf{sf}/embeddings.parquet'"
        ).fetchall()
    }
    emb_key = sum(math.floor(v[0] * float(1 << 48)) for v in vecs.values())
    topk = ivf_topk(vecs)
    ivf_rows += [(emb_key, q, i, r) for q, i, r in topk]
    i8_rows += [(emb_key, q, i, r, d) for q, i, r, d in ivf_int8_topk(vecs)]
    sweep_rows += [(emb_key, p, q, i, r)
                   for p, q, i, r in ivf_probe_sweep(vecs)]
    div = diversity_sample(vecs)
    div_rows += [(emb_key, c, p, i) for c, p, i in div]
    cell_rows += [(emb_key, sz, nc) for sz, nc in ivf_cell_hist(vecs)]
    by_hash = sorted((vid for vid, v in vecs.items() if v),
                     key=lambda vid: signed64(xxh64_long(vid, 42)))
    cents = [vecs[vid] for vid in by_hash[:64]]
    vcell_rows += [(emb_key, vid, nearest_centroids(v, cents, 1)[0])
                   for vid, v in vecs.items()]
    print(f"sf{sf}: doc_key={doc_key} ({len(pairs)} simhash pairs, "
          f"{len(mh)} minhash est pairs), "
          f"emb_key={emb_key} ({len(topk)} ivf rows, {len(div)} diversity rows)")

pq.write_table(
    pa.table(
        {
            "corpus_key": pa.array([r[0] for r in sim_rows], pa.int64()),
            "id_a": pa.array([r[1] for r in sim_rows], pa.int64()),
            "id_b": pa.array([r[2] for r in sim_rows], pa.int64()),
            "hamming": pa.array([r[3] for r in sim_rows], pa.int32()),
        }
    ),
    "tools/golden/simhash_pairs.parquet",
)
pq.write_table(
    pa.table(
        {
            "corpus_key": pa.array([r[0] for r in ivf_rows], pa.int64()),
            "query_id": pa.array([r[1] for r in ivf_rows], pa.int64()),
            "id": pa.array([r[2] for r in ivf_rows], pa.int64()),
            "rank": pa.array([r[3] for r in ivf_rows], pa.int32()),
        }
    ),
    "tools/golden/ivf_topk.parquet",
)
pq.write_table(
    pa.table(
        {
            "corpus_key": pa.array([r[0] for r in div_rows], pa.int64()),
            "cell": pa.array([r[1] for r in div_rows], pa.int64()),
            "pos": pa.array([r[2] for r in div_rows], pa.int32()),
            "id": pa.array([r[3] for r in div_rows], pa.int64()),
        }
    ),
    "tools/golden/diversity_sample.parquet",
)
pq.write_table(
    pa.table(
        {
            "corpus_key": pa.array([r[0] for r in mh_rows], pa.int64()),
            "id_a": pa.array([r[1] for r in mh_rows], pa.int64()),
            "id_b": pa.array([r[2] for r in mh_rows], pa.int64()),
            "n_agree": pa.array([r[3] for r in mh_rows], pa.int32()),
        }
    ),
    "tools/golden/minhash_est_pairs.parquet",
)
pq.write_table(
    pa.table(
        {
            "corpus_key": pa.array([r[0] for r in mh16_rows], pa.int64()),
            "id_a": pa.array([r[1] for r in mh16_rows], pa.int64()),
            "id_b": pa.array([r[2] for r in mh16_rows], pa.int64()),
            "n_agree": pa.array([r[3] for r in mh16_rows], pa.int32()),
        }
    ),
    "tools/golden/minhash_est_pairs16.parquet",
)
pq.write_table(
    pa.table(
        {
            "corpus_key": pa.array([r[0] for r in mhh_rows], pa.int64()),
            "bucket_size": pa.array([r[1] for r in mhh_rows], pa.int64()),
            "n_buckets": pa.array([r[2] for r in mhh_rows], pa.int64()),
        }
    ),
    "tools/golden/minhash_bucket_hist.parquet",
)
pq.write_table(
    pa.table(
        {
            "corpus_key": pa.array([r[0] for r in sweep_rows], pa.int64()),
            "n_probe": pa.array([r[1] for r in sweep_rows], pa.int64()),
            "query_id": pa.array([r[2] for r in sweep_rows], pa.int64()),
            "id": pa.array([r[3] for r in sweep_rows], pa.int64()),
            "rank": pa.array([r[4] for r in sweep_rows], pa.int32()),
        }
    ),
    "tools/golden/ivf_probe_sweep.parquet",
)
pq.write_table(
    pa.table(
        {
            "corpus_key": pa.array([r[0] for r in cell_rows], pa.int64()),
            "cell_size": pa.array([r[1] for r in cell_rows], pa.int64()),
            "n_cells": pa.array([r[2] for r in cell_rows], pa.int64()),
        }
    ),
    "tools/golden/ivf_cell_hist.parquet",
)
pq.write_table(
    pa.table(
        {
            "corpus_key": pa.array([r[0] for r in vcell_rows], pa.int64()),
            "vec_id": pa.array([r[1] for r in vcell_rows], pa.int64()),
            "cell": pa.array([r[2] for r in vcell_rows], pa.int64()),
        }
    ),
    "tools/golden/ivf_cells.parquet",
)
pq.write_table(
    pa.table(
        {
            "corpus_key": pa.array([r[0] for r in i8_rows], pa.int64()),
            "query_id": pa.array([r[1] for r in i8_rows], pa.int64()),
            "id": pa.array([r[2] for r in i8_rows], pa.int64()),
            "rank": pa.array([r[3] for r in i8_rows], pa.int32()),
            "int_dot": pa.array([r[4] for r in i8_rows], pa.int64()),
        }
    ),
    "tools/golden/ivf_int8_topk.parquet",
)
print("wrote tools/golden/{simhash_pairs,minhash_est_pairs[16],"
      "minhash_bucket_hist,ivf_topk,ivf_probe_sweep,ivf_cell_hist,"
      "diversity_sample}.parquet")
