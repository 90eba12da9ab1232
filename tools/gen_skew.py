#!/usr/bin/env python3
"""Zipfian-skew variant of a gen_scale.py output, for skew-proofing the
dedup/ANN operators. gen_scale's mutation keeps band/bucket populations
roughly UNIFORM; real web corpora are Zipfian — boilerplate families
(license blocks, templated pages) with a power-law size distribution,
and embedding space dominated by a few dense topical clusters.

What this writes (documents + embeddings mutated; every other table
hard-linked from the source dir so the full query surface still runs):

- documents: the LAST ~`frac` of doc_ids are replaced by members of
  near-duplicate FAMILIES whose sizes follow size_k = C / k^s
  (s ~ 1.1). Each member mutates ~10% of its family template's tokens
  (seeded per (family, member, position)) — members stay above every
  near-dup threshold in the suite but are never exact duplicates (the
  identical-text case is exact-dedup's job and defeats any bucketing
  by construction; see STRESS.md's LSH note). The largest family is
  ~25% of the replaced mass — the worst band-bucket a minhash join
  will see, and a giant component for connected components.
- embeddings: the last ~`frac` of vec_ids become members of Zipf-sized
  clusters around template vectors (relative noise 0.15, renormalized:
  cosine ~0.99 to the center) — the worst IVF cell / LSH bucket.

Deterministic (crc32 / PCG64 with fixed seeds). Usage:
  python3 tools/gen_skew.py <srcdir> <outdir> [s=1.1] [frac=0.3]
"""
import os
import sys
from zlib import crc32

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = sys.argv[1]
OUT = sys.argv[2]
S = float(sys.argv[3]) if len(sys.argv) > 3 else 1.1
FRAC = float(sys.argv[4]) if len(sys.argv) > 4 else 0.3

os.makedirs(OUT, exist_ok=True)


def zipf_sizes(total, s):
    """Family sizes C/k^s summing to ~total, smallest size >= 3."""
    c = total / 4.0  # largest family ~ a quarter of the replaced mass
    sizes, k, acc = [], 1, 0
    while acc < total:
        sz = max(3, int(c / (k ** s)))
        sz = min(sz, total - acc) if total - acc >= 3 else total - acc
        if sz <= 0:
            break
        sizes.append(sz)
        acc += sz
        k += 1
    return sizes


# --- documents ------------------------------------------------------- #
docs = pq.read_table(f"{SRC}/documents.parquet")
n = docs.num_rows
texts = docs["text"].to_pylist()
doc_ids = docs["doc_id"].to_pylist()
target = int(n * FRAC)
sizes = zipf_sizes(target, S)
print(f"documents: {n} rows, {sum(sizes)} skewed across {len(sizes)} "
      f"families, largest {sizes[0]}")

# templates: spaced through the UNTOUCHED prefix so families are
# mutually dissimilar
tpl_idx = [int(i * (n - target) / len(sizes)) for i in range(len(sizes))]


def mutate(text, fam, member, rate=10):
    toks = text.split(" ")
    out = []
    for p, tok in enumerate(toks):
        h = crc32(f"{fam}:{member}:{p}:{tok}".encode())
        if h % 100 < rate:
            out.append("q" + format(crc32(f"{fam}:{member}:{tok}".encode())
                                    % 16777216, "06x"))
        else:
            out.append(tok)
    return " ".join(out)


new_texts = list(texts)
pos = n - target
fam_of_doc = {}
for fam, sz in enumerate(sizes):
    tpl = texts[tpl_idx[fam]]
    for m in range(sz):
        new_texts[pos] = mutate(tpl, fam, m)
        fam_of_doc[doc_ids[pos]] = fam
        pos += 1

pq.write_table(pa.table({
    "doc_id": docs["doc_id"],
    "text": pa.array(new_texts, pa.string()),
    "lang": docs["lang"],
    "source": docs["source"],
    "n_chars": pa.array([len(t) for t in new_texts], pa.int64()),
}, schema=docs.schema), f"{OUT}/documents.parquet")

# --- embeddings ------------------------------------------------------ #
emb = pq.read_table(f"{SRC}/embeddings.parquet")
nv = emb.num_rows
vecs = np.array(emb["embedding"].to_pylist(), dtype=np.float32)
vtarget = int(nv * FRAC)
vsizes = zipf_sizes(vtarget, S)
print(f"embeddings: {nv} rows, {sum(vsizes)} skewed across {len(vsizes)} "
      f"clusters, largest {vsizes[0]}")
vtpl_idx = [int(i * (nv - vtarget) / len(vsizes)) for i in range(len(vsizes))]

rng = np.random.default_rng(20260813)
new_vecs = vecs.copy()
pos = nv - vtarget
for fam, sz in enumerate(vsizes):
    center = vecs[vtpl_idx[fam]]
    cn = np.linalg.norm(center)
    noise = rng.standard_normal((sz, vecs.shape[1])).astype(np.float32)
    noise *= 0.15 * cn / np.maximum(
        np.linalg.norm(noise, axis=1, keepdims=True), 1e-9)
    members = center[None, :] + noise
    members *= cn / np.maximum(
        np.linalg.norm(members, axis=1, keepdims=True), 1e-9)
    new_vecs[pos:pos + sz] = members
    pos += sz

pq.write_table(pa.table({
    "vec_id": emb["vec_id"],
    "embedding": pa.array(list(new_vecs), pa.list_(pa.float32())),
    "label": emb["label"],
}, schema=emb.schema), f"{OUT}/embeddings.parquet")

# --- link the rest --------------------------------------------------- #
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events"]:
    dst = f"{OUT}/{t}.parquet"
    if not os.path.exists(dst) and os.path.exists(f"{SRC}/{t}.parquet"):
        os.link(f"{SRC}/{t}.parquet", dst)
print(f"done -> {OUT} (s={S}, frac={FRAC})")
