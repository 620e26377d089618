#!/usr/bin/env python3
"""Local correctness harness mirroring the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir> [query ...]

Reads each <out_dir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from <out_dir>/oracle_sql.json in DuckDB with the fixture
tables registered as views, and diffs: column names (sorted), column TYPES
(DuckDB type of the spark parquet column vs the oracle result column — the
driver hashes typed values, so an int64/HUGEINT divergence is a real failure
even when the printed values agree), row counts, and values (rows sorted by
all columns, doubles compared exactly after the queries' own round(·,4))."""
import sys, json, math, glob, os
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def canon(rows):
    # every cell becomes a string so mixed float/None columns stay sortable
    out = []
    for r in rows:
        rr = []
        for v in r:
            if isinstance(v, float):
                if math.isnan(v): rr.append("NaN")
                else: rr.append(repr(round(v, 6) + 0.0))
            elif v is None: rr.append("\x00NULL")
            else: rr.append(str(v))
        out.append(tuple(rr))
    return sorted(out)

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    n_pass = n_fail = n_skip = 0
    for name in sorted(oracle):
        if only and name not in only: continue
        pq = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(pq, "*.parquet"))
        if not files:
            print(f"MISSING  {name} (no spark output)"); n_fail += 1; continue
        try:
            spark_rel = con.sql(f"SELECT * FROM read_parquet('{pq}/*.parquet')")
            spark_cols = [c.lower() for c in spark_rel.columns]
            spark_types = [str(t) for t in spark_rel.types]
            spark_rows = spark_rel.fetchall()
            duck_rel = con.sql(oracle[name])
            duck_cols = [c.lower() for c in duck_rel.columns]
            duck_types = [str(t) for t in duck_rel.types]
            duck_rows = duck_rel.fetchall()
        except Exception as e:
            print(f"ERROR    {name}: {str(e)[:200]}"); n_fail += 1; continue
        if sorted(spark_cols) != sorted(duck_cols):
            print(f"COLS     {name}: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
            n_fail += 1; continue
        # reorder spark rows into duck column order
        idx = [spark_cols.index(c) for c in duck_cols]
        spark_rows = [tuple(r[i] for i in idx) for r in spark_rows]
        # typed compare, same fidelity as the driver's typed value-hash:
        # both sides are DuckDB relations, so compare DuckDB types per column.
        # Catches e.g. sum(BIGINT)->HUGEINT in an oracle (hash-diverges in the
        # driver even though stringified values agree).
        type_diffs = [
            (duck_cols[k], spark_types[idx[k]], duck_types[k])
            for k in range(len(duck_cols)) if spark_types[idx[k]] != duck_types[k]
        ]
        if type_diffs:
            print(f"TYPES    {name}: (col, spark, duck) {type_diffs}")
            n_fail += 1; continue
        bad_duck = [(duck_cols[k], duck_types[k]) for k in range(len(duck_cols))
                    if "HUGEINT" in duck_types[k] or duck_types[k].startswith("DECIMAL")]
        if bad_duck:
            print(f"ORATYPE  {name}: oracle emits non-parquet-native types {bad_duck}")
            n_fail += 1; continue
        # the driver sorts results in pandas, where LIST/STRUCT/MAP cells are
        # unhashable numpy objects and crash sort_values (hit: q88/q107 in r02)
        nested = [(duck_cols[k], spark_types[idx[k]]) for k in range(len(duck_cols))
                  if any(t in spark_types[idx[k]] for t in ("[]", "STRUCT", "MAP"))]
        if nested:
            print(f"NESTED   {name}: output has nested cols (driver sort crashes) {nested}")
            n_fail += 1; continue
        cs, cd = canon(spark_rows), canon(duck_rows)
        if len(cs) != len(cd):
            print(f"ROWS     {name}: spark={len(cs)} duck={len(cd)}"); n_fail += 1; continue
        if cs != cd:
            bad = [(a, b) for a, b in zip(cs, cd) if a != b][:3]
            print(f"VALUES   {name}: first diffs {bad}"); n_fail += 1; continue
        print(f"PASS     {name} ({len(cs)} rows)"); n_pass += 1
    # queries without oracle
    for d in sorted(os.listdir(out_dir)):
        if d not in oracle and os.path.isdir(os.path.join(out_dir, d)):
            files = glob.glob(os.path.join(out_dir, d, "*.parquet"))
            if files:
                rel = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{d}/*.parquet')")
                n = len(rel.fetchall())
                nested = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
                          if any(s in str(t) for s in ("[]", "STRUCT", "MAP"))]
                if nested:
                    print(f"NESTED   {d}: rows-only output has nested cols {nested}")
                    n_fail += 1; continue
                status = "ROWSONLY" if n > 0 else "EMPTY   "
                print(f"{status} {d} ({n} rows)")
                if n == 0: n_fail += 1
                else: n_skip += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
