#!/usr/bin/env python3
"""Golden anchor for the deflate compression-ratio quality signal
(VERDICT r14 #6): an INDEPENDENT Python-zlib raw-deflate implementation
computes each document's compressed length; the q183 oracle reads this
parquet and recomputes the engine's quantized ratio from it.

The engine (TextKernelExpressions.deflateRatio) runs JDK Deflater(6,
nowrap=true) — raw DEFLATE, level 6. CPython's zlib.compressobj(6,
DEFLATED, wbits=-15) is the same algorithm from an independent runtime;
measured byte-length-identical on adversarial cases (empty, single char,
high repetition, 10k run, mixed) and on the full documents corpora.
Empty text: the engine short-circuits to ratio 1.0 without deflating —
the oracle's CASE mirrors that, so the stored length for empty docs is
never read.

Rows are keyed by the corpus fingerprint (count:sum(length(text)), the
q86 convention) so ONE committed file serves every driver SF.

Run from the repo root: python3 scripts/gen_golden_oracle_deflate.py
"""
import zlib

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

OUT = "golden_oracle/q183_deflate.parquet"
SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
       "/root/testdata/sf0.1"]

keys, ids, lens = [], [], []
for sf in SFS:
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{sf}/documents.parquet') "
        "ORDER BY doc_id").fetchall()
    key = con.execute(
        "SELECT CAST(count(*) AS VARCHAR) || ':' || "
        "CAST(CAST(sum(length(text)) AS BIGINT) AS VARCHAR) "
        f"FROM read_parquet('{sf}/documents.parquet')").fetchone()[0]
    for doc_id, text in rows:
        b = (text or "").encode("utf-8")
        co = zlib.compressobj(6, zlib.DEFLATED, -15)
        n = len(co.compress(b) + co.flush())
        keys.append(key)
        ids.append(doc_id)
        lens.append(n)
    print(f"{sf}: {len(rows)} docs, corpus_key={key}")

t = pa.table({
    "corpus_key": pa.array(keys, pa.string()),
    "doc_id": pa.array(ids, pa.int64()),
    "deflate_len": pa.array(lens, pa.int64()),
})
pq.write_table(t, OUT)
print(f"wrote {len(ids)} rows -> {OUT}")
