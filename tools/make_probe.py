#!/usr/bin/env python3
"""Build the large-scale probe dataset: N key-shifted replicas of the
sf0.1 documents/embeddings/events tables (the tables the dedup /
similarity / text / event-window operators read).

Usage: python3 tools/make_probe.py [copies] [outDir] [--perturb]
Defaults: 100 copies (= sf10-equivalent row counts) -> /tmp/sfbig2

Key scheme: ids shift by copy * (max+1); `source` gets a per-copy
suffix so (source, shingle) posting-list df stays at its sf0.1 level
(the probe measures the engine's scaling, not a cap-saturated
degenerate corpus — the df-cap behavior has its own planted spec).
Embedding VALUES are preserved, so every vector gains N-1 exact
duplicates: cosine ~1.0 pairs the scaled sim_join_lsh must find.

--perturb: copies k>0 are NEAR-duplicates instead of exact replicas —
~1/7 of token TYPES per copy are rewritten to a copy tag (deterministic
hash choice), and embeddings get a small per-copy uniform shift. Use
this corpus when replica-exactness makes a query degenerate (e.g.
screen_apply returns 0 rows on exact replicas because every doc's
copies sit in the reference set; line_dedup's content lines all reach
the df cutoff). Default outDir then: /tmp/sfpert
"""
import sys
import duckdb

args = [a for a in sys.argv[1:] if a != "--perturb"]
perturb = "--perturb" in sys.argv[1:]
copies = int(args[0]) if len(args) > 0 else 100
out = args[1] if len(args) > 1 else ("/tmp/sfpert" if perturb else "/tmp/sfbig2")
src = "/root/testdata/sf0.1"

con = duckdb.connect()
con.execute(f"CREATE TABLE ks AS SELECT unnest(range({copies})) AS k")

import os
os.makedirs(out, exist_ok=True)

text_expr = "text"
emb_expr = "embedding"
if perturb:
    # rewrite ~1/7 of token TYPES per copy (hash-chosen, deterministic),
    # preserving token count and order — copies become near-duplicates
    # with shingle jaccard well above dedup thresholds but below 1.0,
    # and no doc equals any other copy byte-for-byte
    text_expr = """CASE WHEN k = 0 THEN text ELSE
      array_to_string(list_transform(string_split(text, ' '),
        x -> CASE WHEN hash(x || 'p') % 7 = k % 7
             THEN 'pk' || (k % 89)::VARCHAR ELSE x END), ' ') END"""
    # small uniform shift: byte-distinct, direction barely moves
    # (exact-dup paths see distinct vectors; cosine stays near 1)
    emb_expr = """CASE WHEN k = 0 THEN embedding ELSE
      list_transform(embedding,
        x -> x + ((k % 13) + 1) * 0.0001)::FLOAT[] END"""

n_docs = con.sql(f"SELECT max(doc_id)+1 FROM '{src}/documents.parquet'").fetchone()[0]
con.execute(f"""
  COPY (SELECT doc_id + {n_docs}*k AS doc_id, {text_expr} AS text, lang,
               source || CASE WHEN k=0 THEN '' ELSE '_c'||k END AS source,
               n_chars
        FROM '{src}/documents.parquet', ks)
  TO '{out}/documents.parquet' (FORMAT PARQUET)""")

n_vec = con.sql(f"SELECT max(vec_id)+1 FROM '{src}/embeddings.parquet'").fetchone()[0]
con.execute(f"""
  COPY (SELECT vec_id + {n_vec}*k AS vec_id, {emb_expr} AS embedding, label
        FROM '{src}/embeddings.parquet', ks)
  TO '{out}/embeddings.parquet' (FORMAT PARQUET)""")

n_ev, n_usr = con.sql(
    f"SELECT max(event_id)+1, max(user_id)+1 FROM '{src}/events.parquet'").fetchone()
con.execute(f"""
  COPY (SELECT event_id + {n_ev}*k AS event_id, ts,
               user_id + {n_usr}*k AS user_id, event_type, value, props
        FROM '{src}/events.parquet', ks)
  TO '{out}/events.parquet' (FORMAT PARQUET)""")

# Pre-encoded media fixture: replicate the engine-built sf0.1 media
# cache (JDK-encoded PNG/WAV blobs) with shifted doc_ids, so the
# probe's multimodal_decode row reads bytes that already exist — the
# production shape — instead of timing fixture synthesis. Falls back
# silently if the cache was never built (the engine then builds its
# own per-dir cache on first decode, the pre-r12 behavior).
import glob
media_src = sorted(glob.glob("/tmp/graft_media_cache/sf0.1-*"))
if media_src:
    con.execute(f"""
      COPY (SELECT doc_id + {n_docs}*k AS doc_id, fmt, content
            FROM parquet_scan('{media_src[0]}/*.parquet'), ks)
      TO '{out}/media.parquet' (FORMAT PARQUET)""")
else:
    print("media: sf0.1 fixture cache missing (run any sf0.1 "
          "multimodal query once to build it); probe will re-encode")

for t in ["documents", "embeddings", "events"] + (
        ["media"] if media_src else []):
    print(t, con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0])
