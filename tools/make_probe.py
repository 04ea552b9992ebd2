#!/usr/bin/env python3
"""Build the large-scale probe dataset: N key-shifted replicas of the
sf0.1 documents/embeddings/events tables (the tables the dedup /
similarity / text / event-window operators read).

Usage: python3 tools/make_probe.py [copies] [outDir]
Defaults: 100 copies (= sf10-equivalent row counts) -> /tmp/sfbig2

Key scheme: ids shift by copy * (max+1); `source` gets a per-copy
suffix so (source, shingle) posting-list df stays at its sf0.1 level
(the probe measures the engine's scaling, not a cap-saturated
degenerate corpus — the df-cap behavior has its own planted spec).
Embedding VALUES are preserved, so every vector gains N-1 exact
duplicates: cosine ~1.0 pairs the scaled sim_join_lsh must find.
"""
import sys
import duckdb

copies = int(sys.argv[1]) if len(sys.argv) > 1 else 100
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfbig2"
src = "/root/testdata/sf0.1"

con = duckdb.connect()
con.execute(f"CREATE TABLE ks AS SELECT unnest(range({copies})) AS k")

import os
os.makedirs(out, exist_ok=True)

n_docs = con.sql(f"SELECT max(doc_id)+1 FROM '{src}/documents.parquet'").fetchone()[0]
con.execute(f"""
  COPY (SELECT doc_id + {n_docs}*k AS doc_id, text, lang,
               source || CASE WHEN k=0 THEN '' ELSE '_c'||k END AS source,
               n_chars
        FROM '{src}/documents.parquet', ks)
  TO '{out}/documents.parquet' (FORMAT PARQUET)""")

n_vec = con.sql(f"SELECT max(vec_id)+1 FROM '{src}/embeddings.parquet'").fetchone()[0]
con.execute(f"""
  COPY (SELECT vec_id + {n_vec}*k AS vec_id, embedding, label
        FROM '{src}/embeddings.parquet', ks)
  TO '{out}/embeddings.parquet' (FORMAT PARQUET)""")

n_ev, n_usr = con.sql(
    f"SELECT max(event_id)+1, max(user_id)+1 FROM '{src}/events.parquet'").fetchone()
con.execute(f"""
  COPY (SELECT event_id + {n_ev}*k AS event_id, ts,
               user_id + {n_usr}*k AS user_id, event_type, value, props
        FROM '{src}/events.parquet', ks)
  TO '{out}/events.parquet' (FORMAT PARQUET)""")

for t in ["documents", "embeddings", "events"]:
    print(t, con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0])
