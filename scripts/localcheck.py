#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Runs graft.Verify output (parquet per query + oracle_sql.json) against
DuckDB on the same sf dir, sorts columns by name and rows by value,
and compares. Usage:
    python3 scripts/localcheck.py <verify_out_dir> <sf_dir>
"""
import json, sys, glob, os
import decimal
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

def find_decimal(rows):
    """The driver's hash is type-sensitive; Python's Decimal == float is
    True, so a DECIMAL-producing oracle (un-cast `x * 40.0` etc.) passes
    here while failing the driver (round-8 m2). Reject Decimals outright."""
    for r in rows[:1000]:
        for i, v in enumerate(r):
            if isinstance(v, decimal.Decimal):
                return i
    return None

def cells_type_equal(a, b):
    """Type-sensitive cell compare mirroring the driver's hash: value AND
    python type must agree (int vs float vs Decimal all distinct)."""
    return type(a) is type(b) and a == b

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
        dec = find_decimal(er)
        if dec is not None:
            print(f"DECIMAL {name}: oracle column '{ec[dec]}' yields Decimal "
                  f"— cast to ::DOUBLE/::BIGINT in the oracle SQL"); n_fail += 1; continue
        dec = find_decimal(gr)
        if dec is not None:
            print(f"DECIMAL {name}: spark column '{gc[dec]}' yields Decimal"); n_fail += 1; continue
        if gc != ec:
            print(f"SCHEMA  {name}: spark={gc} oracle={ec}"); n_fail += 1; continue
        if len(gr) != len(er):
            print(f"ROWS    {name}: spark={len(gr)} oracle={len(er)}"); n_fail += 1; continue
        mismatch = any(
            not all(cells_type_equal(x, y) for x, y in zip(a, b))
            for a, b in zip(gr, er))
        if mismatch:
            bad = [i for i, (a, b) in enumerate(zip(gr, er))
                   if not all(cells_type_equal(x, y) for x, y in zip(a, b))][:3]
            print(f"VALUES  {name}: first diffs at rows {bad}")
            for i in bad:
                print(f"  spark : {gr[i]}\n  oracle: {er[i]}")
            n_fail += 1; continue
        print(f"PASS    {name} ({len(gr)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noora} rows-only")
    sys.exit(1 if n_fail else 0)

main()
