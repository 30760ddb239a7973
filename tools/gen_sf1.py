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

    # events: 500k rows over 30 days with a ZIPF-skewed user distribution
    # (hot users stress the per-user session/range windows the way a hot key
    # would at 100 TB) — schema matches the REGENERATED driver slice
    # (ts timestamp[us], no tz -> Spark TimestampNTZ)
    n_events = 500_000
    n_users = 20_000
    # zipf-ish: user u gets weight 1/(rank+10); hottest user lands ~2% of rows
    weights = [1.0 / (u + 10) for u in range(n_users)]
    tot_w = sum(weights)
    cum, acc = [], 0.0
    for w in weights:
        acc += w / tot_w
        cum.append(acc)
    import bisect
    ev_ids, ev_ts, ev_user, ev_type, ev_val, ev_props = [], [], [], [], [], []
    span_ms = 30 * 24 * 3600 * 1000
    types = ["click", "view", "view", "purchase", "error"]
    for i in range(n_events):
        u = bisect.bisect_left(cum, rnd.random())
        ev_ids.append(i)
        # same 2024-01-01 epoch the orders below use, so the as-of join
        # actually matches (1704067200000 = 2024-01-01T00:00Z in ms)
        ev_ts.append((1704067200000 + rnd.randrange(span_ms)) * 1_000)
        ev_user.append(u)
        ev_type.append(rnd.choice(types))
        ev_val.append(round(rnd.uniform(0, 100), 3))
        ev_props.append('{"k":%d}' % rnd.randrange(50))
    events = pa.table({
        "event_id": pa.array(ev_ids, pa.int64()),
        "ts": pa.array(ev_ts, pa.timestamp("us")),
        "user_id": pa.array(ev_user, pa.int64()),
        "event_type": pa.array(ev_type, pa.string()),
        "value": pa.array(ev_val, pa.float64()),
        "props": pa.array(ev_props, pa.string()),
    })
    pq.write_table(events, os.path.join(out_dir, "events.parquet"), row_group_size=8192)

    # orders: minimal right side for the as-of family (aj01) — 100k orders
    # over the same user key space and time span
    n_orders = 100_000
    import datetime
    epoch = datetime.datetime(2024, 1, 1)
    # o_orderstatus/o_orderpriority power the q22 pivot in the smoke
    statuses = ["F", "O", "P"]
    priorities = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    o_key, o_cust, o_date, o_price, o_stat, o_prio = [], [], [], [], [], []
    for i in range(n_orders):
        o_key.append(i)
        o_cust.append(bisect.bisect_left(cum, rnd.random()))
        o_date.append(epoch + datetime.timedelta(milliseconds=rnd.randrange(span_ms)))
        o_price.append(round(rnd.uniform(10, 5000), 2))
        o_stat.append(statuses[rnd.randrange(len(statuses))])
        o_prio.append(priorities[rnd.randrange(len(priorities))])
    orders = pa.table({
        "o_orderkey": pa.array(o_key, pa.int64()),
        "o_custkey": pa.array(o_cust, pa.int64()),
        "o_orderdate": pa.array(o_date, pa.timestamp("us")),
        "o_totalprice": pa.array(o_price, pa.float64()),
        "o_orderstatus": pa.array(o_stat, pa.string()),
        "o_orderpriority": pa.array(o_prio, pa.string()),
    })
    pq.write_table(orders, os.path.join(out_dir, "orders.parquet"), row_group_size=8192)
    print(f"wrote {docs.num_rows} documents, {vecs.num_rows} embeddings, "
          f"{events.num_rows} events, {orders.num_rows} orders -> {out_dir}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata/sf1")
