#!/usr/bin/env python3
"""Independent oracle for q86 (BPE train + tokenize) — VERDICT r11 task #2.

BPE has no counterpart in the reference package, so the anchor here is a
SECOND, INDEPENDENT implementation: a deliberately naive Python trainer
(recount every pair count from scratch after each merge — the O(merges x
corpus) textbook loop) plus the textbook greedy encoder, sharing nothing
with the engine's incremental lazy-deletion-heap trainer or its codegen
kernel except the published BPE contract:

  * pre-tokenizer: lowercased ASCII [a-z0-9]+ runs (TextOps.tokens);
  * word -> code-point symbols + terminal '</w>';
  * merge step: highest pair count, ties to the lexicographically
    smallest (left, right);
  * encode: repeatedly merge ALL left-to-right non-overlapping
    occurrences of the lowest-rank adjacent pair (rank = merge order;
    the engine keys ranks by left + NUL + right, which tuple keys
    replicate exactly — no concatenation ambiguity).

Output parquet rows are keyed by a corpus fingerprint
(count:total_text_chars) so ONE committed file serves every driver SF:
the oracle SQL selects its slice with
  WHERE corpus_key = (SELECT count(*) || ':' || CAST(sum(length(text)) AS
  BIGINT) FROM documents)

Run from the repo root:  python3 scripts/gen_golden_oracle_bpe.py
"""
import re

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

NUM_MERGES = 200
BIG = 1 << 30
TOKEN_RE = re.compile(r"[a-z0-9]+")


def train(word_counts, num_merges):
    vocab = {w: (tuple(w) + ("</w>",), c) for w, c in word_counts.items()}
    merges = []
    for _ in range(num_merges):
        pairs = {}
        for syms, c in vocab.values():
            for j in range(len(syms) - 1):
                p = (syms[j], syms[j + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        # max count; ties -> lexicographically smallest (left, right)
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        l, r = best
        for w, (syms, c) in vocab.items():
            out, p = [], 0
            while p < len(syms):
                if p < len(syms) - 1 and syms[p] == l and syms[p + 1] == r:
                    out.append(syms[p] + syms[p + 1])
                    p += 2
                else:
                    out.append(syms[p])
                    p += 1
            vocab[w] = (tuple(out), c)
    return merges


def encoder(merges):
    ranks = {}
    for i, pair in enumerate(merges):
        ranks.setdefault(pair, i)
    cache = {}

    def n_subwords(word):
        if word in cache:
            return cache[word]
        syms = list(word) + ["</w>"]
        while len(syms) > 1:
            best = min((ranks.get((syms[j], syms[j + 1]), BIG)
                        for j in range(len(syms) - 1)), default=BIG)
            if best == BIG:
                break
            out, p = [], 0
            while p < len(syms):
                if (p < len(syms) - 1
                        and ranks.get((syms[p], syms[p + 1]), BIG) == best):
                    out.append(syms[p] + syms[p + 1])
                    p += 2
                else:
                    out.append(syms[p])
                    p += 1
            syms = out
        cache[word] = len(syms)
        return len(syms)

    return n_subwords


def main():
    keys, ids, counts = [], [], []
    for sf in ("0.001", "0.01", "0.1"):
        con = duckdb.connect()
        docs = con.execute(
            "SELECT doc_id, text FROM "
            f"read_parquet('/root/testdata/sf{sf}/documents.parquet') "
            "ORDER BY doc_id").fetchall()
        corpus_key = f"{len(docs)}:{sum(len(t) for _, t in docs)}"
        wc = {}
        for doc_id, text in docs:
            if doc_id % 10 == 0:  # q86 trains on the 90% slice
                continue
            for w in TOKEN_RE.findall(text.lower()):
                wc[w] = wc.get(w, 0) + 1
        merges = train(wc, NUM_MERGES)
        enc = encoder(merges)
        for doc_id, text in docs:
            keys.append(corpus_key)
            ids.append(doc_id)
            counts.append(sum(enc(w) for w in TOKEN_RE.findall(text.lower())))
        print(f"sf{sf}: key={corpus_key} vocab={len(wc)} "
              f"merges={len(merges)} docs={len(docs)}")
    pq.write_table(pa.table({
        "corpus_key": keys,
        "doc_id": np.array(ids, dtype=np.int64),
        "n_subwords": np.array(counts, dtype=np.int64),
    }), "golden_oracle/q86_bpe_tokenize.parquet")
    print("done -> golden_oracle/q86_bpe_tokenize.parquet")


if __name__ == "__main__":
    main()
