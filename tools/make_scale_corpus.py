"""Deterministic scale-up corpus builder for scaling experiments.

The driver ships parquet at sf<=0.1; the engine's performance claim is that
its per-query fixed cost (scheduling, Python dispatch) amortizes at real
scale while the heavy operators scale near-linearly. This tool builds an
sfN corpus under /tmp by replicating sf0.1 K times with per-replica
perturbations chosen so each workload keeps its SHAPE instead of
degenerating:

- events: key offsets only (event_id, user_id). Per-user groups multiply in
  COUNT (requests scale out); per-AP groups (ap = user % 50) grow 10x in
  size (per-key load scales up) — both realistic axes.
- documents: doc_id offset + a deterministic per-replica word permutation.
  A verbatim copy would make every doc a member of a 10-way exact-dup
  clique (near-dup pairs ~ K^2, df-cap flips most shingles to hot —
  a different workload, not a bigger one). Permuting word order preserves
  length/vocabulary/token stats but destroys cross-replica shingle
  identity, so the corpus has 10x docs with the original within-replica
  dup rate.
- embeddings: vec_id offset + np.roll by the replica index (norms
  preserved, cross-replica cosine decorrelated).
- TPC-H side tables: rows unchanged (no registry query scales on them),
  rewritten with split row groups like every other table.

Usage: python tools/make_scale_corpus.py [--base /root/testdata/sf0.1]
       [--out /tmp/sf1] [--k 10]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sf1")
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    def write_split(table, path, groups=32):
        """Write with ~`groups` row groups, like a real lakehouse layout.

        The driver's base corpus is one row group per file, which is
        UNSPLITTABLE: Spark (and DuckDB) parallelize parquet scans at
        row-group granularity, so a single-group file pins the whole
        decode + partial-aggregate on one core no matter how many split
        offsets the scheduler computes. A 100 TB table is thousands of
        128 MB row groups; a scale corpus that can't be scanned in
        parallel benchmarks the wrong property.
        """
        pq.write_table(table, path, row_group_size=max(4096, len(table) // groups))

    for t in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem"):
        write_split(pq.read_table(f"{args.base}/{t}.parquet"), f"{args.out}/{t}.parquet")

    # events: key offsets
    ev = pq.read_table(f"{args.base}/events.parquet")
    n_ev, n_users = len(ev), int(pa.compute.max(ev["user_id"]).as_py()) + 1
    parts = []
    for k in range(args.k):
        tb = ev
        if k:
            tb = tb.set_column(
                tb.schema.get_field_index("event_id"),
                "event_id",
                pa.compute.add(tb["event_id"], k * n_ev),
            )
            tb = tb.set_column(
                tb.schema.get_field_index("user_id"),
                "user_id",
                pa.compute.add(tb["user_id"], k * n_users),
            )
        parts.append(tb)
    write_split(pa.concat_tables(parts), f"{args.out}/events.parquet")

    # documents: offset + per-replica word permutation
    dc = pq.read_table(f"{args.base}/documents.parquet")
    n_doc = len(dc)
    texts = dc["text"].to_pylist()
    parts = []
    for k in range(args.k):
        if k == 0:
            parts.append(dc)
            continue
        rng = np.random.RandomState(k)
        new_texts = []
        for txt in texts:
            w = txt.split(" ")
            order = rng.permutation(len(w))
            new_texts.append(" ".join(w[i] for i in order))
        tb = dc.set_column(
            dc.schema.get_field_index("doc_id"),
            "doc_id",
            pa.compute.add(dc["doc_id"], k * n_doc),
        )
        tb = tb.set_column(
            tb.schema.get_field_index("text"), "text", pa.array(new_texts)
        )
        parts.append(tb)
    write_split(pa.concat_tables(parts), f"{args.out}/documents.parquet")

    # embeddings: offset + roll
    em = pq.read_table(f"{args.base}/embeddings.parquet")
    n_vec = len(em)
    mat = np.array(em["embedding"].to_pylist(), dtype=np.float32)
    parts = []
    for k in range(args.k):
        if k == 0:
            parts.append(em)
            continue
        rolled = np.roll(mat, k, axis=1)
        tb = em.set_column(
            em.schema.get_field_index("vec_id"),
            "vec_id",
            pa.compute.add(em["vec_id"], k * n_vec),
        )
        tb = tb.set_column(
            tb.schema.get_field_index("embedding"),
            "embedding",
            pa.array(list(rolled), type=em.schema.field("embedding").type),
        )
        parts.append(tb)
    write_split(pa.concat_tables(parts), f"{args.out}/embeddings.parquet")
    print(f"wrote {args.out}: events x{args.k}, documents x{args.k}, embeddings x{args.k}")


if __name__ == "__main__":
    main()
