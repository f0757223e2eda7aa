#!/usr/bin/env python3
"""Offline trainer for the vendored toy BPE vocabulary.

Trains a classic character-level BPE merge table (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units" — the
published algorithm, reimplemented from the paper) on the sf0.1
documents table (the DOCS default below — the committed merge table was
built from it; retrain from the same corpus or every BpeSpec golden
breaks), and writes the ranked merge list to
src/main/resources/graft/bpe_merges.txt, which the runtime
BpeVocab loads from the classpath. Re-run to regenerate; the output is
committed so builds are hermetic (no network, no training at runtime).

Pre-tokenization MUST match the runtime kernel exactly:
`\\w+|[^\\w\\s]` with ASCII classes (Java's default \\w/\\s are
ASCII-only, so Python needs re.ASCII). Word pretokens therefore contain
only [A-Za-z0-9_] — tab-separating the merge file is safe — and
1-char punctuation pretokens never produce pairs, so every merge
symbol is word-internal.

Usage: python3 tools/train_bpe.py [docs_parquet] [max_merges]
"""
import collections
import re
import sys

import duckdb

DOCS = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1/documents.parquet"
MAX_MERGES = int(sys.argv[2]) if len(sys.argv) > 2 else 3000
OUT = "src/main/resources/graft/bpe_merges.txt"
PRETOKEN = re.compile(r"\w+|[^\w\s]", re.ASCII)

texts = [r[0] for r in duckdb.sql(f"SELECT text FROM '{DOCS}' WHERE text IS NOT NULL").fetchall()]
# The synthetic documents use a ~31-word vocabulary, on which BPE
# degenerates to word-level in <100 merges. Mix in the repo's own prose
# docs (stable, authored here — NOT the retrieved PAPERS/SNIPPETS) so
# the vocabulary carries realistic English subword merges for words the
# corpus has never seen.
for extra in ("README.md", "SURVEY.md", "BASELINE.md", "TESTDATA.md"):
    try:
        with open(extra) as fh:
            texts.append(fh.read())
    except OSError:
        pass

# word -> frequency, each word as a tuple of single-char symbols
word_freq = collections.Counter()
for t in texts:
    for w in PRETOKEN.findall(t):
        if len(w) > 1:  # 1-char pretokens can never merge
            word_freq[w] += 1
words = {w: (list(w), f) for w, f in word_freq.items()}

merges = []
for _ in range(MAX_MERGES):
    pairs = collections.Counter()
    for syms, f in words.values():
        for i in range(len(syms) - 1):
            pairs[(syms[i], syms[i + 1])] += f
    if not pairs:
        break
    (a, b), freq = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))
    if freq < 2:  # merging hapax pairs just memorizes the corpus
        break
    merges.append((a, b))
    ab = a + b
    for w, (syms, f) in words.items():
        i, out = 0, []
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(ab)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        words[w] = (out, f)

with open(OUT, "w") as fh:
    fh.write("# toy BPE merges, ranked; trained by tools/train_bpe.py — do not hand-edit\n")
    for a, b in merges:
        fh.write(f"{a}\t{b}\n")
print(f"wrote {len(merges)} merges to {OUT} from {len(words)} distinct words, {len(texts)} docs")
