#!/usr/bin/env python3
"""Golden-oracle generator for the x_bpe_tokens catalog entry.

Independently replays the runtime BPE counting kernel
(graft.functions.BpeVocab.countWord — greedy lowest-rank-first merge,
all occurrences left-to-right per round) over every distinct document
text in the three test scale factors, and writes
tools/golden/bpe_counts.parquet keyed by md5(text). The oracle SQL
joins documents to this golden on md5(text), which makes the check
scale-factor-agnostic: counts are a pure function of the text, so any
sf dir whose texts were seen here verifies, and an unseen text fails
loudly (null-vs-value hash mismatch via the LEFT JOIN).

Replication notes (must mirror the JVM kernel exactly):
 - pretokenize with \\w+|[^\\w\\s], ASCII classes (re.ASCII == Java's
   default ASCII \\w/\\s);
 - a pretoken whose Java length (UTF-16 code units) is 1 counts 1;
 - Java strings are UTF-16, so a single non-BMP code point is TWO
   surrogate "chars" to countWord — two symbols that never merge,
   count 2. Word pretokens are ASCII-only ([A-Za-z0-9_]) so this only
   affects 1-codepoint punctuation pretokens;
 - merge loop: find lowest-rank adjacent pair, replace every
   left-to-right occurrence, repeat until no ranked pair remains.

Usage: python3 tools/gen_bpe_golden.py
"""
import hashlib
import re

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

MERGES = "src/main/resources/graft/bpe_merges.txt"
OUT = "tools/golden/bpe_counts.parquet"
SF_DOCS = [f"/root/testdata/sf{sf}/documents.parquet" for sf in ("0.001", "0.01", "0.1")]
PRETOKEN = re.compile(r"\w+|[^\w\s]", re.ASCII)

rank = {}
with open(MERGES) as fh:
    for line in fh:
        line = line.rstrip("\n")
        if not line or line.startswith("#"):
            continue
        a, b = line.split("\t")
        rank[(a, b)] = len(rank)

cache = {}


def count_word(syms):
    """Surviving symbol count after rank-ordered merges (kernel replay)."""
    key = "".join(syms)
    hit = cache.get(key)
    if hit is not None:
        return hit
    syms = list(syms)
    while len(syms) > 1:
        best, best_pair = None, None
        for i in range(len(syms) - 1):
            r = rank.get((syms[i], syms[i + 1]))
            if r is not None and (best is None or r < best):
                best, best_pair = r, (syms[i], syms[i + 1])
        if best_pair is None:
            break
        a, b = best_pair
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    cache[key] = len(syms)
    return len(syms)


def count_text(text):
    total = 0
    for w in PRETOKEN.findall(text):
        # Java length = UTF-16 code units; non-BMP code points are 2
        units = sum(2 if ord(c) > 0xFFFF else 1 for c in w)
        if units == 1:
            total += 1
        elif units != len(w):
            # contains a non-BMP char: replay over UTF-16 units (each
            # surrogate is its own never-merging symbol)
            syms = []
            for c in w:
                if ord(c) > 0xFFFF:
                    enc = c.encode("utf-16-be")
                    syms.append(enc[:2].decode("utf-16-be", "surrogatepass"))
                    syms.append(enc[2:].decode("utf-16-be", "surrogatepass"))
                else:
                    syms.append(c)
            total += count_word(syms)
        else:
            total += count_word(list(w))
    return total


seen = {}
for docs in SF_DOCS:
    for (text,) in duckdb.sql(
        f"SELECT text FROM '{docs}' WHERE text IS NOT NULL"
    ).fetchall():
        key = hashlib.md5(text.encode("utf-8")).hexdigest()
        n = count_text(text)
        prev = seen.get(key)
        assert prev is None or prev == n, f"md5 collision or nondeterminism: {key}"
        seen[key] = n

table = pa.table(
    {
        "text_md5": pa.array(sorted(seen), type=pa.string()),
        "n_bpe_tokens": pa.array([seen[k] for k in sorted(seen)], type=pa.int64()),
    }
)
pq.write_table(table, OUT)
print(f"wrote {len(seen)} distinct texts to {OUT}")
