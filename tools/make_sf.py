"""Scale-rehearsal dataset builder: replicate the driver's sf0.1 tables K×
with shifted keys into a throwaway dir (default tmpfs) — the sandbox has no
sf1 testdata and /root/testdata is read-only.  Deterministic (pure key
arithmetic, no RNG); used by the sf1 rehearsal recorded in BENCH.md.

Usage: python tools/make_sf.py [K] [out_dir] [src_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

K = int(sys.argv[1]) if len(sys.argv) > 1 else 10
OUT = sys.argv[2] if len(sys.argv) > 2 else "/dev/shm/sf_rehearsal"
SRC = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()
con.sql(f"CREATE VIEW ks AS SELECT unnest(range({K})) AS k")

REPL = {
    # table: (pk shifts, other key shifts) — replica k shifts every key by
    # k * (max+1) so ids stay dense, unique, and foreign keys line up
    "events": """
        SELECT event_id + k*100000000 AS event_id,
               ts + to_microseconds(k*40000000000) AS ts,
               user_id + k*1500 AS user_id, event_type, value, props
        FROM '{src}/events.parquet', ks""",
    "documents": """
        SELECT doc_id + k*5000 AS doc_id, text, lang, source, n_chars
        FROM '{src}/documents.parquet', ks""",
    "embeddings": """
        SELECT vec_id + k*2000 AS vec_id, embedding, label
        FROM '{src}/embeddings.parquet', ks""",
}

for table, sql in REPL.items():
    q = sql.format(src=SRC)
    con.sql(
        f"COPY ({q}) TO '{OUT}/{table}.parquet' (FORMAT parquet, "
        f"ROW_GROUP_SIZE 200000)"
    )
    n = con.sql(f"SELECT count(*) FROM '{OUT}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows -> {OUT}/{table}.parquet")

# small dimension tables: gate queries don't use them, but copy so the dir
# is a drop-in SPARK_GRAFT_SF_DIR
for t in "region nation customer supplier part orders lineitem".split():
    src = f"{SRC}/{t}.parquet"
    if os.path.exists(src):
        con.sql(f"COPY (SELECT * FROM '{src}') TO '{OUT}/{t}.parquet' (FORMAT parquet)")
print("done")
