#!/usr/bin/env python3
"""sf1 oracle sweep (VERDICT r7 task 5): compare graft.Verify output at sf1
against the DuckDB oracle with a PER-QUERY timeout budget, and emit
CORRECTNESS_SF1.json.

The sf0.01/sf0.1 driver gate stays the correctness authority; this sweep
exists to prove the same plans stay correct at the 10x (6 M lineitem) step.
DuckDB is the bottleneck at this scale (single recursive CTEs can exceed any
reasonable budget), so each query's oracle runs in its own subprocess under a
wall-clock timeout; queries that exceed it are recorded as
skip-with-reason rows, never silently dropped.

Usage:
  outer: python3 tools/check_oracle_sf1.py <verify_out_dir> <sf1_dir> <names_file> [timeout_s]
  inner: python3 tools/check_oracle_sf1.py --one <verify_out_dir> <sf1_dir> <name>
"""
import sys, json, math, glob, os, subprocess, time

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def canon(rows):
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

def one(out_dir, sf_dir, name):
    import duckdb
    res = {"query": name}
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    pq = os.path.join(out_dir, name)
    files = glob.glob(os.path.join(pq, "*.parquet"))
    if not files:
        res.update(status="missing", reason="no spark output parquet"); return res
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    spark_rel = con.sql(f"SELECT * FROM read_parquet('{pq}/*.parquet')")
    spark_cols = [c.lower() for c in spark_rel.columns]
    spark_types = [str(t) for t in spark_rel.types]
    spark_rows = spark_rel.fetchall()
    if name not in oracle:
        res.update(status="rows_only", rows=len(spark_rows),
                   reason="no oracle by design (approx/throughput class)")
        return res
    t0 = time.time()
    duck_rel = con.sql(oracle[name])
    duck_cols = [c.lower() for c in duck_rel.columns]
    duck_types = [str(t) for t in duck_rel.types]
    duck_rows = duck_rel.fetchall()
    res["duck_s"] = round(time.time() - t0, 1)
    if sorted(spark_cols) != sorted(duck_cols):
        res.update(status="fail", reason=f"cols spark={sorted(spark_cols)} duck={sorted(duck_cols)}"); return res
    idx = [spark_cols.index(c) for c in duck_cols]
    spark_rows = [tuple(r[i] for i in idx) for r in spark_rows]
    type_diffs = [(duck_cols[k], spark_types[idx[k]], duck_types[k])
                  for k in range(len(duck_cols)) if spark_types[idx[k]] != duck_types[k]]
    if type_diffs:
        res.update(status="fail", reason=f"types {type_diffs}"); return res
    cs, cd = canon(spark_rows), canon(duck_rows)
    if len(cs) != len(cd):
        res.update(status="fail", reason=f"rows spark={len(cs)} duck={len(cd)}"); return res
    if cs != cd:
        bad = [(a, b) for a, b in zip(cs, cd) if a != b][:2]
        res.update(status="fail", reason=f"values first diffs {bad}"); return res
    res.update(status="pass", rows=len(cs))
    return res

def main():
    if sys.argv[1] == "--one":
        print(json.dumps(one(sys.argv[2], sys.argv[3], sys.argv[4])))
        return
    out_dir, sf_dir, names_file = sys.argv[1], sys.argv[2], sys.argv[3]
    timeout = int(sys.argv[4]) if len(sys.argv) > 4 else 300
    names = [n for n in open(names_file).read().replace("\n", ",").split(",") if n]
    rows = []
    for i, name in enumerate(names):
        t0 = time.time()
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", out_dir, sf_dir, name],
                capture_output=True, text=True, timeout=timeout)
            if p.returncode != 0:
                row = {"query": name, "status": "error",
                       "reason": (p.stderr or p.stdout).strip()[-300:]}
            else:
                row = json.loads(p.stdout.strip().splitlines()[-1])
        except subprocess.TimeoutExpired:
            row = {"query": name, "status": "skip",
                   "reason": f"oracle exceeded {timeout}s DuckDB budget at sf1"}
        row["wall_s"] = round(time.time() - t0, 1)
        rows.append(row)
        print(f"[{i+1}/{len(names)}] {row['status']:9s} {name} "
              f"({row.get('rows','-')} rows, {row['wall_s']}s)", flush=True)
    counts = {}
    for r in rows:
        counts[r["status"]] = counts.get(r["status"], 0) + 1
    out = {"sf": 1.0, "n": len(rows), "counts": counts,
           "timeout_s": timeout, "results": rows}
    json.dump(out, open("CORRECTNESS_SF1.json", "w"), indent=1)
    print(json.dumps(counts))

if __name__ == "__main__":
    main()
