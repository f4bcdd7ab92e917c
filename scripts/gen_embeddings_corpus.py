#!/usr/bin/env python3
"""Generate an embeddings-only scaled corpus for the ANN clamp-boundary
probes (VERDICT r13 #3) — measurement tooling, not test data.

Mirrors graft.ScaleUp's embedding transform exactly: copy c of the
source table rotates each vector by c % dim positions (same norm and
component distribution, decorrelated direction) and offsets vec_id by
c * stride. Only the embeddings table is materialized, because
RecallCurve and the clamp probes read nothing else — a full ScaleUp of
the documents/lineitem tables at factor 2000 would burn an hour of
wall for bytes nobody scans.

Usage: gen_embeddings_corpus.py <srcSfDir> <dstDir> <factor> [nFiles]
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def main() -> None:
    src, dst, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    n_files = int(sys.argv[4]) if len(sys.argv) > 4 else max(1, factor // 2)
    t = pq.read_table(f"{src}/embeddings.parquet")
    vec_id = t.column("vec_id").to_numpy()
    emb = np.asarray(t.column("embedding").to_pylist(), dtype=np.float32)
    label = t.column("label").to_numpy()
    n, dim = emb.shape
    stride = vec_id.max() + 1

    ids_out, emb_out, lab_out = [], [], []
    for c in range(factor):
        rot = c % dim
        ids_out.append(vec_id + c * stride)
        emb_out.append(np.roll(emb, -rot, axis=1) if rot else emb)
        lab_out.append(label)
    ids = np.concatenate(ids_out)
    vecs = np.concatenate(emb_out)
    labs = np.concatenate(lab_out)

    import os
    out_dir = f"{dst}/embeddings.parquet"
    os.makedirs(out_dir, exist_ok=True)
    per = (len(ids) + n_files - 1) // n_files
    for i in range(n_files):
        lo, hi = i * per, min((i + 1) * per, len(ids))
        if lo >= hi:
            break
        chunk = pa.table({
            "vec_id": pa.array(ids[lo:hi], type=pa.int64()),
            "embedding": pa.array(list(vecs[lo:hi]),
                                  type=pa.list_(pa.float32())),
            "label": pa.array(labs[lo:hi], type=pa.int32()),
        })
        pq.write_table(chunk, f"{out_dir}/part-{i:05d}.parquet")
    print(f"{dst}: {len(ids)} vectors, dim {dim}, {n_files} files")


if __name__ == "__main__":
    main()
