#!/usr/bin/env python3
"""Generate an sf1 fixture set (~6M lineitem) as a 10x fan-out of the
driver's read-only sf0.1 tables, for the ORDER-OF-MAGNITUDE scaling bench
recorded in SCALE.md (BENCH_SF1). Correctness stays gated on the driver's
sf0.01/sf0.1 fixtures — this set exists only to measure s(sf1)/s(sf0.1)
runtime ratios, so the generation rule favors faithfulness of JOIN
TOPOLOGY over novel content:

 - every copy i in 0..9 shifts each table's primary key AND the foreign
   keys that reference it by i * (that table's sf0.1 key range), so the
   join fan-in/fan-out per key is IDENTICAL to sf0.1 (copy 0 is sf0.1
   verbatim);
 - region/nation are fixed dimensions (they do not scale in TPC-H);
 - timestamps are left unshifted: the event/order time RANGE stays the
   same with 10x density, which is how a real deployment's day looks at
   10x traffic (windows get denser, not longer);
 - document text is made COPY-DISTINCT (every token of copy i>0 gets a
   one-char copy suffix, n_chars recomputed) and embedding vectors are
   dimension-ROTATED per copy (norms and per-dim distributions preserved,
   cross-copy cosine decorrelated). The first cut repeated content
   verbatim, which made every shingle's document frequency 10x and blew
   pair-generation up ~100x (q164: 5.5s -> 265s) — a duplicate-pressure
   artifact, not how a real 10x corpus grows. Within-copy duplicate
   structure is still exactly sf0.1's, so dedup operators keep realistic
   (linear-in-copies) duplicate pressure.

Usage: python3 tools/gen_sf1.py [out_dir]   (default testdata_sf1/)
"""
import os, sys
import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "testdata_sf1"
COPIES = 10

# table -> list of (column, offset-per-copy); None = copy verbatim
SHIFTS = {
    "region": None,
    "nation": None,
    "customer": [("c_custkey", 15000)],
    "supplier": [("s_suppkey", 1000)],
    "part": [("p_partkey", 20000)],
    "orders": [("o_orderkey", 150000), ("o_custkey", 15000)],
    "lineitem": [("l_orderkey", 150000), ("l_partkey", 20000), ("l_suppkey", 1000)],
    "events": [("event_id", 100000), ("user_id", 1500)],
    "documents": [("doc_id", 5000)],
    "embeddings": [("vec_id", 2000)],
}


def main():
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for t, shifts in SHIFTS.items():
        src = f"read_parquet('{SRC}/{t}.parquet')"
        if shifts is None:
            sel = f"SELECT * FROM {src}"
        else:
            cols = con.sql(f"SELECT * FROM {src} LIMIT 0").columns
            shifted = dict(shifts)

            def expr(c):
                if c in shifted:
                    return f"{c} + i.i * {shifted[c]} AS {c}"
                if t == "documents" and c == "text":
                    # copy-distinct vocab: suffix every token with chr(97+i)
                    return ("CASE WHEN i.i = 0 THEN text ELSE array_to_string("
                            "list_transform(str_split(text, ' '), "
                            "x -> x || chr(CAST(97 + i.i AS INT))), ' ') END AS text")
                if t == "documents" and c == "n_chars":
                    return ("CAST(length(CASE WHEN i.i = 0 THEN text ELSE "
                            "array_to_string(list_transform(str_split(text, ' '), "
                            "x -> x || chr(CAST(97 + i.i AS INT))), ' ') END) AS BIGINT) AS n_chars")
                if t == "embeddings" and c == "embedding":
                    # per-copy dimension rotation: same norm, decorrelated
                    return ("CASE WHEN i.i = 0 THEN embedding ELSE "
                            "embedding[i.i + 1:] || embedding[:i.i] END AS embedding")
                return c

            exprs = ", ".join(expr(c) for c in cols)
            sel = (f"SELECT {exprs} FROM {src} "
                   f"CROSS JOIN (SELECT unnest(range({COPIES})) AS i) i")
        con.execute(f"COPY ({sel}) TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM read_parquet('{OUT}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
