#!/usr/bin/env python3
"""Generate an sf1-scale slice of the documents/embeddings tables for the
scale-proof smoke (VERDICT r6 item 8). 10x sf0.1: 50,000 documents and
20,000 embeddings, shaped like the driver's synthetic tables (same schema,
vocabulary sampled from the real sf0.1 text, 20 sources x 5 langs,
label-clustered embeddings) plus a controlled duplicate structure so the
dedup family has real work: ~1% exact duplicates and ~2% near-duplicates
(a copy with a few word substitutions).

Driver-side tooling only (pyarrow/duckdb) — never a Scala dependency.
Output is OUTSIDE the repo and the read-only testdata tree:

    python3 tools/gen_sf1.py [out_dir=/tmp/testdata/sf1]
"""
import os
import random
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 1777
N_DOCS = 50_000
N_VECS = 20_000
DIM = 64
N_LABELS = 10
EXACT_DUP_FRAC = 0.01
NEAR_DUP_FRAC = 0.02


def main(out_dir):
    rnd = random.Random(SEED)
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()

    # vocabulary + shape parameters from the real sf0.1 slice
    vocab = [r[0] for r in con.execute("""
        SELECT DISTINCT w FROM (
          SELECT unnest(string_split(text, ' ')) AS w
          FROM read_parquet('/root/testdata/sf0.1/documents.parquet'))
        WHERE w <> '' ORDER BY w""").fetchall()]
    langs = ["en", "en", "en", "de", "es", "fr", "zh"]  # en-heavy like sf0.1
    sources = [f"src{i}" for i in range(20)]

    n_base = int(N_DOCS * (1 - EXACT_DUP_FRAC - NEAR_DUP_FRAC))
    texts, rows = [], []
    for i in range(n_base):
        words = [rnd.choice(vocab) for _ in range(rnd.randint(12, 80))]
        texts.append(" ".join(words))
    # exact duplicates: verbatim copies of earlier docs
    for _ in range(int(N_DOCS * EXACT_DUP_FRAC)):
        texts.append(texts[rnd.randrange(n_base)])
    # near duplicates: copy with ~5% of words substituted (high-jaccard pairs
    # for dd03/dd04/dd05 to find, below the exact-dup fast path)
    for _ in range(N_DOCS - len(texts)):
        w = texts[rnd.randrange(n_base)].split(" ")
        for _ in range(max(1, len(w) // 20)):
            w[rnd.randrange(len(w))] = rnd.choice(vocab)
        texts.append(" ".join(w))
    order = list(range(len(texts)))
    rnd.shuffle(order)  # dups spread across doc_id space, not clustered at the end
    for doc_id, j in enumerate(order):
        t = texts[j]
        rows.append((doc_id, t, rnd.choice(langs), rnd.choice(sources), len(t)))

    docs = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "source": pa.array([r[3] for r in rows], pa.string()),
        "n_chars": pa.array([r[4] for r in rows], pa.int64()),
    })
    # small row groups: a single-row-group file cannot split, serializing every
    # scan on one core — unlike real multi-row-group (or multi-file) data
    pq.write_table(docs, os.path.join(out_dir, "documents.parquet"), row_group_size=2048)

    # label-clustered embeddings: centroid + noise, like the driver slice
    centroids = [[rnd.gauss(0, 1) for _ in range(DIM)] for _ in range(N_LABELS)]
    vec_ids, embs, labels = [], [], []
    for vid in range(N_VECS):
        lab = rnd.randrange(N_LABELS)
        vec_ids.append(vid)
        labels.append(lab)
        embs.append([centroids[lab][d] + rnd.gauss(0, 0.35) for d in range(DIM)])
    vecs = pa.table({
        "vec_id": pa.array(vec_ids, pa.int64()),
        "embedding": pa.array(embs, pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    })
    pq.write_table(vecs, os.path.join(out_dir, "embeddings.parquet"), row_group_size=2048)
    print(f"wrote {docs.num_rows} documents, {vecs.num_rows} embeddings -> {out_dir}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata/sf1")
