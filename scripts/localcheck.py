#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Runs graft.Verify output (parquet per query + oracle_sql.json) against
DuckDB on the same sf dir, sorts columns by name and rows by value,
and compares. Usage:
    python3 scripts/localcheck.py <verify_out_dir> <sf_dir>
"""
import json, sys, glob, os
import duckdb

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out

def norm(v):
    if isinstance(v, float):
        return v  # exact compare — we engineered determinism
    return v

def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = n_noora = 0
    for qdir in sorted(glob.glob(f"{outdir}/*/")):
        name = qdir.rstrip("/").split("/")[-1]
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"NOROWS  {name} (no parquet written)"); n_fail += 1; continue
        got = con.execute(f"SELECT * FROM '{qdir}/*.parquet'")
        gcols = [d[0] for d in got.description]; grows = got.fetchall()
        if name not in oracles:
            print(f"ROWSONLY {name}: {len(grows)} rows"); n_noora += 1
            if len(grows) == 0: print(f"  WARN: zero rows")
            continue
        try:
            exp = con.execute(oracles[name])
            ecols = [d[0] for d in exp.description]; erows = exp.fetchall()
        except Exception as e:
            print(f"ORAFAIL {name}: {e}"); n_fail += 1; continue
        gc, gr = canon(grows, gcols)
        ec, er = canon(erows, ecols)
        if gc != ec:
            print(f"SCHEMA  {name}: spark={gc} oracle={ec}"); n_fail += 1; continue
        if len(gr) != len(er):
            print(f"ROWS    {name}: spark={len(gr)} oracle={len(er)}"); n_fail += 1; continue
        if gr != er:
            bad = [i for i, (a, b) in enumerate(zip(gr, er)) if a != b][:3]
            print(f"VALUES  {name}: first diffs at rows {bad}")
            for i in bad:
                print(f"  spark : {gr[i]}\n  oracle: {er[i]}")
            n_fail += 1; continue
        print(f"PASS    {name} ({len(gr)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noora} rows-only")
    sys.exit(1 if n_fail else 0)

main()
