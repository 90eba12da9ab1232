#!/usr/bin/env python3
"""Scale up the driver's sf0.1 testdata by an integer factor (default 10x
-> "sf1") for LOCAL scale-proof benchmarking. Writes to a target dir
outside the read-only /root/testdata tree.

Design notes (what a naive 10x copy would get wrong):

- Keys: every copy k offsets primary/foreign keys consistently, so join
  cardinalities scale linearly and referential integrity holds.
- Dimensions (region, nation) stay fixed -- facts grow, dims don't,
  like a real warehouse.
- documents.text: copy 0 is verbatim; copies k>0 mutate ~35% of tokens.
  The mutation is seeded by (copy, token, position) -- NOT by doc_id --
  so two near-duplicate documents inside one copy receive near-identical
  mutations and REMAIN near-duplicates (intra-copy dup structure is
  preserved), while the same document across two copies diverges by
  ~2*35% of tokens (token jaccard ~0.27, under every near-dup threshold
  in the suite). Plain replication would make every doc a 10-way exact
  dup and blow pair counts quadratically for data reasons, not engine
  reasons.
- embeddings: per-(copy, vec) noise at 0.35 relative magnitude --
  cross-copy cosine ~0.89, below the suite's tau thresholds; cell/block
  populations (the actual cost driver of the ANN/semdedup operators)
  scale 10x.
- events: ids/users offset, timestamps preserved (same Jan-2024 window
  the serving queries filter on).

Deterministic: all randomness from numpy PCG64 seeded by (table, copy).

Usage: python3 tools/gen_scale.py [factor] [outdir]
       defaults: 10 /tmp/sf1
"""
import sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
FACTOR = int(sys.argv[1]) if len(sys.argv) > 1 else 10
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"

import os
os.makedirs(OUT, exist_ok=True)


def read(t):
    return pq.read_table(f"{SRC}/{t}.parquet")


def write(t, table):
    pq.write_table(table, f"{OUT}/{t}.parquet")
    print(f"{t}: {table.num_rows} rows")


def offsets(tbl, col):
    return int(pa.compute.max(tbl[col]).as_py()) + 1


# --- fixed dims ------------------------------------------------------ #
for t in ["region", "nation"]:
    write(t, read(t))

# --- keyed facts/dims ------------------------------------------------ #
cust = read("customer"); CK = offsets(cust, "c_custkey")
supp = read("supplier"); SK = offsets(supp, "s_suppkey")
part = read("part"); PK = offsets(part, "p_partkey")
orders = read("orders"); OK = offsets(orders, "o_orderkey")
events = read("events")
EK = offsets(events, "event_id"); UK = offsets(events, "user_id")


def replicate(tbl, shifts):
    """Concat FACTOR copies, adding copy*offset to the named int64 cols."""
    chunks = []
    for k in range(FACTOR):
        cols = {}
        for name in tbl.column_names:
            col = tbl[name]
            if name in shifts and k > 0:
                col = pa.compute.add(col, shifts[name] * k)
                col = col.cast(tbl.schema.field(name).type)
            cols[name] = col
        chunks.append(pa.table(cols, schema=tbl.schema))
    return pa.concat_tables(chunks)


write("customer", replicate(cust, {"c_custkey": CK}))
write("supplier", replicate(supp, {"s_suppkey": SK}))
write("part", replicate(part, {"p_partkey": PK}))
write("orders", replicate(orders, {"o_orderkey": OK, "o_custkey": CK}))
write("lineitem", replicate(read("lineitem"),
    {"l_orderkey": OK, "l_partkey": PK, "l_suppkey": SK}))
write("events", replicate(events, {"event_id": EK, "user_id": UK}))

# --- documents: mutation seeded by (copy, token, pos) ---------------- #
docs = read("documents")
DK = offsets(docs, "doc_id")
doc_ids = docs["doc_id"].to_pylist()
texts = docs["text"].to_pylist()
langs = docs["lang"]
sources = docs["source"]

# replacement vocabulary: deterministic nonsense words, disjoint from
# real text so a mutation always breaks the token/shingle
def repl_word(h):
    return "z" + format(h % 16777216, "06x")

chunks = []
for k in range(FACTOR):
    if k == 0:
        chunks.append(docs)
        continue
    new_texts = []
    from zlib import crc32  # process-stable, unlike builtin hash()
    for t in texts:
        toks = t.split(" ")
        out = []
        for p, tok in enumerate(toks):
            # stable per-(copy, token, position) decision
            h = crc32(f"{k}:{tok}:{p}".encode())
            if h % 100 < 35:
                out.append(repl_word(crc32(f"{k}:{tok}".encode())))
            else:
                out.append(tok)
        new_texts.append(" ".join(out))
    chunks.append(pa.table({
        "doc_id": pa.array([d + DK * k for d in doc_ids], pa.int64()),
        "text": pa.array(new_texts, pa.string()),
        "lang": langs,
        "source": sources,
        "n_chars": pa.array([len(t) for t in new_texts], pa.int64()),
    }, schema=docs.schema))
write("documents", pa.concat_tables(chunks))

# --- embeddings: per-(copy, vec) noise, renormalized to original norm  #
emb = read("embeddings")
VK = offsets(emb, "vec_id")
vec_ids = np.array(emb["vec_id"].to_pylist(), dtype=np.int64)
vecs = np.array(emb["embedding"].to_pylist(), dtype=np.float32)
labels = emb["label"]
dim = vecs.shape[1]
chunks = []
for k in range(FACTOR):
    if k == 0:
        chunks.append(emb)
        continue
    rng = np.random.default_rng(seed=42_000 + k)
    noise = rng.standard_normal(vecs.shape).astype(np.float32)
    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
    nnorms = np.linalg.norm(noise, axis=1, keepdims=True)
    mixed = vecs + noise * (0.35 * norms / np.maximum(nnorms, 1e-9))
    # keep the original norm so magnitude-sensitive ops see the same
    # distribution
    mixed *= norms / np.maximum(np.linalg.norm(mixed, axis=1, keepdims=True), 1e-9)
    chunks.append(pa.table({
        "vec_id": pa.array(vec_ids + VK * k, pa.int64()),
        "embedding": pa.array(list(mixed), pa.list_(pa.float32())),
        "label": labels,
    }, schema=emb.schema))
write("embeddings", pa.concat_tables(chunks))
print(f"done -> {OUT} (factor {FACTOR})")
