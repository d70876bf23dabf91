#!/usr/bin/env python3
"""Local scale-rehearsal generator: synthesize an sf1 directory (10x sf0.1)
by replicating the driver-shipped sf0.1 tables with disjoint key offsets.

This is a DEV TOOL for measuring per-query scaling exponents (BASELINE.md
records them); it is not part of the library and never runs in the gate.

Replication alone would manufacture pathologies the operators would then
be measured against: 10 identical copies of every document make each one
a 10-way exact duplicate (quadratic pair volume by construction), and 10
identical copies of every embedding do the same to the cosine near-dup
family. So the payload columns are DECORRELATED per copy while keeping
every marginal distribution intact:
  - documents: words are deterministically shuffled per copy (seeded by
    the copy index) — length, charset, token and language distributions
    are untouched, but cross-copy 3-gram shingle overlap drops to noise.
  - embeddings: the 64 dims are rolled by the copy index — norms and
    per-dim marginals survive, cross-copy cosine falls off the near-dup
    threshold, and the cluster structure stays k-means-able.
Keys (order, part, supplier, customer, user, doc, vec, event) get copy
offsets so joins stay referentially intact and the co-purchase graph
scales as 10 disjoint sf0.1 graphs.
"""
import sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10

import os
os.makedirs(DST, exist_ok=True)

# Offsets: next power of 10 above each key's max, so copies are disjoint
# and keys stay readable.
OFF = {"order": 10**7, "part": 10**6, "supp": 10**5, "cust": 10**6,
       "user": 10**6, "doc": 10**5, "vec": 10**5, "event": 10**7}

def bump(arr, off, i):
    return pa.array(np.asarray(arr) + np.int64(off) * i, type=pa.int64())

def rep(name, bumps, transform=None):
    t = pq.read_table(f"{SRC}/{name}.parquet")
    chunks = []
    for i in range(COPIES):
        cols = {}
        for c in t.column_names:
            if c in bumps:
                cols[c] = bump(t[c].combine_chunks(), OFF[bumps[c]], i)
            else:
                cols[c] = t[c]
        if transform is not None:
            cols = transform(cols, i)
        chunks.append(pa.table(cols, schema=t.schema))
    out = pa.concat_tables(chunks)
    pq.write_table(out, f"{DST}/{name}.parquet")
    print(f"{name}: {t.num_rows} -> {out.num_rows}")

def shuffle_text(cols, i):
    if i == 0:
        return cols
    rng = np.random.default_rng(42 + i)
    texts = cols["text"].to_pylist()
    shuffled = []
    for s in texts:
        w = s.split(" ")
        rng.shuffle(w)
        shuffled.append(" ".join(w))
    cols["text"] = pa.array(shuffled, type=pa.string())
    return cols

def roll_embedding(cols, i):
    if i == 0:
        return cols
    vecs = np.stack(cols["embedding"].combine_chunks().to_numpy(zero_copy_only=False))
    rolled = np.roll(vecs, i, axis=1).astype(np.float32)
    cols["embedding"] = pa.array(list(rolled), type=pa.list_(pa.float32()))
    return cols

rep("lineitem", {"l_orderkey": "order", "l_partkey": "part", "l_suppkey": "supp"})
rep("orders", {"o_orderkey": "order", "o_custkey": "cust"})
rep("part", {"p_partkey": "part"})
rep("customer", {"c_custkey": "cust"})
rep("supplier", {"s_suppkey": "supp"})
rep("events", {"event_id": "event", "user_id": "user"})
rep("documents", {"doc_id": "doc"}, transform=shuffle_text)
rep("embeddings", {"vec_id": "vec"}, transform=roll_embedding)
for small in ("nation", "region"):
    pq.write_table(pq.read_table(f"{SRC}/{small}.parquet"), f"{DST}/{small}.parquet")
    print(f"{small}: copied")
print("done ->", DST)
