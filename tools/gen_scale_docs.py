#!/usr/bin/env python3
"""documents+embeddings-only variant of gen_scale.py for the sf100
sub-linear-family spot check (q19/q25/q33/q67/q81 touch ONLY these two
tables; replicating lineitem/events 1000x would cost ~70 GB of memory
and hours of generator time for tables no query reads).

Same design contract as gen_scale.py with two deliberate deltas:

- Mutation decisions keep gen_scale.py's (copy, token, position)
  seeding (vocabulary-level seeding was measured and REJECTED: this
  corpus has a 31-token vocabulary, so per-copy only ~7 tokens mutate
  and cross-copy 3-gram jaccard stays ~0.70 — ABOVE the 0.6 near-dup
  threshold; per-position gives ~0.20) but compute them with a
  vectorized splitmix64 over (copy, token_id, position) numpy arrays
  instead of 400M per-token Python crc32 calls at factor 1000. The
  hash differs from gen_scale.py bit-for-bit; the statistical contract
  (35% of positions, deterministic, intra-copy dup structure preserved
  because decisions depend only on (copy, token, position)) is the
  same.
- Output streams through a ParquetWriter in 20-copy batches, so memory
  stays bounded at any factor.

Usage: python3 tools/gen_scale_docs.py [factor] [outdir]
       defaults: 1000 /tmp/sf100
"""
import os
import sys
from zlib import crc32

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
FACTOR = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf100"
BATCH = 20  # copies per written row-group batch

os.makedirs(OUT, exist_ok=True)

# --- documents ------------------------------------------------------- #
docs = pq.read_table(f"{SRC}/documents.parquet")
DK = int(pa.compute.max(docs["doc_id"]).as_py()) + 1
doc_ids = np.array(docs["doc_id"].to_pylist(), dtype=np.int64)
texts = docs["text"].to_pylist()
langs = docs["lang"]
sources = docs["source"]

# tokenize once; corpus as flat (token-id, in-doc position) arrays +
# per-doc boundaries
tokenized = [t.split(" ") for t in texts]
vocab_index = {}
flat = []
pos = []
bounds = [0]
for toks in tokenized:
    for p, tok in enumerate(toks):
        i = vocab_index.get(tok)
        if i is None:
            i = len(vocab_index)
            vocab_index[tok] = i
        flat.append(i)
        pos.append(p)
    bounds.append(len(flat))
flat = np.array(flat, dtype=np.int64)
posu = np.array(pos, dtype=np.uint64)
flatu = flat.astype(np.uint64)
vocab = np.array(list(vocab_index.keys()), dtype=object)
print(f"documents: {len(texts)} docs, vocab {len(vocab)}, "
      f"{len(flat)} tokens/copy")


def repl_word(h):
    return "z" + format(h % 16777216, "06x")


def mix64(x):
    """splitmix64 finalizer, vectorized over uint64 (wraps mod 2^64)."""
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def copy_texts(k):
    """All texts of copy k (k=0 verbatim)."""
    if k == 0:
        return texts
    ku = np.uint64(k) * np.uint64(0x9E3779B97F4A7C15)
    h = mix64(ku ^ (flatu * np.uint64(0xC2B2AE3D27D4EB4F))
              ^ (posu << np.uint64(24)))
    mutate = (h % np.uint64(100)) < np.uint64(35)
    # replacement word per (copy, token) — same as gen_scale.py, tiny
    repl = np.array(
        [repl_word(crc32(f"{k}:{tok}".encode())) for tok in vocab],
        dtype=object)
    corpus = np.where(mutate, repl[flat], vocab[flat])
    return [" ".join(corpus[bounds[d]:bounds[d + 1]])
            for d in range(len(texts))]


doc_writer = pq.ParquetWriter(f"{OUT}/documents.parquet", docs.schema)
for b0 in range(0, FACTOR, BATCH):
    chunks = []
    for k in range(b0, min(b0 + BATCH, FACTOR)):
        new_texts = copy_texts(k)
        chunks.append(pa.table({
            "doc_id": pa.array(doc_ids + DK * k),
            "text": pa.array(new_texts, pa.string()),
            "lang": langs,
            "source": sources,
            "n_chars": pa.array([len(t) for t in new_texts], pa.int64()),
        }, schema=docs.schema))
    doc_writer.write_table(pa.concat_tables(chunks))
    print(f"documents: copies {b0}..{min(b0 + BATCH, FACTOR) - 1} written")
doc_writer.close()

# --- embeddings (identical math to gen_scale.py) --------------------- #
emb = pq.read_table(f"{SRC}/embeddings.parquet")
VK = int(pa.compute.max(emb["vec_id"]).as_py()) + 1
vec_ids = np.array(emb["vec_id"].to_pylist(), dtype=np.int64)
vecs = np.array(emb["embedding"].to_pylist(), dtype=np.float32)
labels = emb["label"]

emb_writer = pq.ParquetWriter(f"{OUT}/embeddings.parquet", emb.schema)
for b0 in range(0, FACTOR, BATCH):
    chunks = []
    for k in range(b0, min(b0 + BATCH, FACTOR)):
        if k == 0:
            chunks.append(emb)
            continue
        rng = np.random.default_rng(seed=42_000 + k)
        noise = rng.standard_normal(vecs.shape).astype(np.float32)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        nnorms = np.linalg.norm(noise, axis=1, keepdims=True)
        mixed = vecs + noise * (0.35 * norms / np.maximum(nnorms, 1e-9))
        mixed *= norms / np.maximum(
            np.linalg.norm(mixed, axis=1, keepdims=True), 1e-9)
        chunks.append(pa.table({
            "vec_id": pa.array(vec_ids + VK * k, pa.int64()),
            "embedding": pa.array(list(mixed), pa.list_(pa.float32())),
            "label": labels,
        }, schema=emb.schema))
    emb_writer.write_table(pa.concat_tables(chunks))
emb_writer.close()
print(f"done -> {OUT} (factor {FACTOR}, documents+embeddings only)")
