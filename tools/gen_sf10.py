#!/usr/bin/env python3
"""Generate a PARTIAL sf10 fixture set (documents + lineitem only) as a 10x
fan-out of testdata_sf1, for the SECOND measured decade of the scaling bench
(VERDICT r8 task 7: q56/q280/q111/q273/q164 — four documents-tier queries
plus the lineitem-derived triangle graph). Full sf10 would be ~10 GB across
all tables; the riskiest-five queries only read these two, so only these two
are generated (the written fixture-size rationale the task allows).

Same generation discipline as gen_sf1.py:
 - keys shift by copy * (sf1 key range) so join topology per key is
   IDENTICAL to sf1 (copy 0 is sf1 verbatim);
 - document text stays COPY-DISTINCT: sf1 already gave each inner copy a
   1-char token suffix; each outer copy i>0 appends a second, UPPER-case
   char chr(65+i), so no token collides across any of the 100 total copies
   and shingle document frequencies stay flat (the duplicate-pressure
   artifact gen_sf1.py documents);
 - n_chars is recomputed from the rewritten text.

Usage: python3 tools/gen_sf10.py [out_dir]   (default testdata_sf10/)
"""
import os, sys
import duckdb

SRC = "testdata_sf1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "testdata_sf10"
COPIES = 10

SHIFTS = {
    "documents": [("doc_id", 50000)],
    "lineitem": [("l_orderkey", 1500000), ("l_partkey", 200000),
                 ("l_suppkey", 10000)],
}


def main():
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    # The copy-distinct rewrite appends a suffix char per space-split token,
    # which assumes STRICTLY single-spaced text: a run of two spaces, a
    # leading/trailing space, or any tab/newline whitespace would yield an
    # empty split token -> a bare suffix char, corrupting the shingle-
    # frequency guarantee. Assert the sf1 corpus is exactly its own
    # single-space-normalized form (advice r9 + r10).
    n_bad = con.sql(
        f"SELECT count(*) FROM read_parquet('{SRC}/documents.parquet') "
        "WHERE text != trim(regexp_replace(text, '[ \\t\\n\\r]+', ' ', 'g'))"
    ).fetchone()[0]
    assert n_bad == 0, (
        f"{n_bad} sf1 documents are not single-space-normalized (runs of "
        "whitespace, leading/trailing space, or tab/newline) - the "
        "token-suffix rewrite would corrupt them; fix the source corpus")
    for t, shifts in SHIFTS.items():
        src = f"read_parquet('{SRC}/{t}.parquet')"
        cols = con.sql(f"SELECT * FROM {src} LIMIT 0").columns
        shifted = dict(shifts)

        def expr(c):
            if c in shifted:
                return f"{c} + i.i * {shifted[c]} AS {c}"
            if t == "documents" and c == "text":
                return ("CASE WHEN i.i = 0 THEN text ELSE array_to_string("
                        "list_transform(str_split(text, ' '), "
                        "x -> x || chr(CAST(65 + i.i AS INT))), ' ') END AS text")
            if t == "documents" and c == "n_chars":
                return ("CAST(length(CASE WHEN i.i = 0 THEN text ELSE "
                        "array_to_string(list_transform(str_split(text, ' '), "
                        "x -> x || chr(CAST(65 + i.i AS INT))), ' ') END) AS BIGINT)"
                        " AS n_chars")
            return c

        exprs = ", ".join(expr(c) for c in cols)
        sel = (f"SELECT {exprs} FROM {src} "
               f"CROSS JOIN (SELECT unnest(range({COPIES})) AS i) i")
        con.execute(f"COPY ({sel}) TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM read_parquet('{OUT}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
