#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Runs graft.Verify output (parquet per query + oracle_sql.json) against
DuckDB on the same sf dir, sorts columns by name and rows by value,
and compares. Usage:
    python3 scripts/localcheck.py <verify_out_dir> <sf_dir>

Type checking happens at the DuckDB level, not the Python-cell level:
`DESCRIBE <oracle sql>` must equal `DESCRIBE SELECT * FROM '<spark
parquet>'` column-for-column (name + DuckDB type). Python's duckdb
client renders HUGEINT and BIGINT both as `int`, and Decimal == float
is True, so cell-level checks are blind to exactly the class of skew
(round-8 m2 ts_ms DECIMAL, round-9 m2 frame_sum HUGEINT) that the
driver's type-sensitive hash rejects.

An optional third arg caps each ORACLE query's runtime in seconds
(`localcheck.py <out> <sf> [timeout]`): at the sf1 gate scale some
oracle replays are quadratic where the engine is not (e21's mutual
kNN in pure SQL), and a compare that hangs reports nothing. A timed-
out oracle prints ORATIME and counts separately — it is a statement
about the TEST HARNESS at that scale, not about the engine.
"""
import json, sys, glob, os, threading
import duckdb


def run_capped(con, sql, timeout):
    """fetchall with a wall-clock cap via duckdb's interrupt (None =
    uncapped, the driver's mode)."""
    if not timeout:
        r = con.execute(sql)
        return [d[0] for d in r.description], r.fetchall()
    done = threading.Event()
    def watchdog():
        if not done.wait(timeout):
            con.interrupt()
    t = threading.Thread(target=watchdog, daemon=True)
    t.start()
    try:
        r = con.execute(sql)
        return [d[0] for d in r.description], r.fetchall()
    finally:
        done.set()

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out

def describe(con, sql):
    """name -> DuckDB type for the result of `sql` (sorted by name)."""
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return sorted((r[0], r[1]) for r in rows)

def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    timeout = float(sys.argv[3]) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):
            # Spark-written table (a directory of part files) — the
            # BuildScaled sf1-gate dirs have this shape; driver
            # testdata tables are single files
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = n_noora = n_slow = 0
    # A query Verify declared (it dumps oracle_sql.json from the full
    # queries map) but did NOT dump is a FAILURE, not a silent skip —
    # Verify swallows per-query exceptions, and without this check a
    # query that throws vanishes from the count (round 11: 17 r-ingest
    # queries StackOverflowed and preflight still printed '0 fail').
    dumped = {d.rstrip("/").split("/")[-1] for d in glob.glob(f"{outdir}/*/")}
    for name in sorted(set(oracles) - dumped):
        print(f"MISSING {name} (declared but not dumped — query threw?)")
        n_fail += 1
    for qdir in sorted(glob.glob(f"{outdir}/*/")):
        name = qdir.rstrip("/").split("/")[-1]
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"NOROWS  {name} (no parquet written)"); n_fail += 1; continue
        spark_sql = f"SELECT * FROM '{qdir}/*.parquet'"
        got = con.execute(spark_sql)
        gcols = [d[0] for d in got.description]; grows = got.fetchall()
        if name not in oracles:
            print(f"ROWSONLY {name}: {len(grows)} rows"); n_noora += 1
            if len(grows) == 0: print(f"  WARN: zero rows")
            continue
        try:
            ecols, erows = run_capped(con, oracles[name], timeout)
        except duckdb.InterruptException:
            print(f"ORATIME {name}: oracle exceeded {timeout}s at this scale")
            n_slow += 1; continue
        except Exception as e:
            if timeout and "INTERRUPT" in str(e).upper():
                print(f"ORATIME {name}: oracle exceeded {timeout}s at this scale")
                n_slow += 1; continue
            print(f"ORAFAIL {name}: {e}"); n_fail += 1; continue
        # DuckDB-native type equality: catches HUGEINT/DECIMAL/unsigned
        # skew invisible at the Python cell level.
        gtypes = describe(con, spark_sql)
        try:
            etypes = describe(con, oracles[name])
        except Exception as e:
            print(f"ORAFAIL {name}: DESCRIBE: {e}"); n_fail += 1; continue
        if gtypes != etypes:
            # align by column NAME (a positional zip misreports when
            # the column sets themselves differ)
            gm, em = dict(gtypes), dict(etypes)
            print(f"TYPES   {name}:")
            shown = 0
            for cname in sorted(set(gm) | set(em)):
                if gm.get(cname) != em.get(cname) and shown < 8:
                    print(f"  {cname}: spark={gm.get(cname)}  oracle={em.get(cname)}")
                    shown += 1
            n_fail += 1; continue
        gc, gr = canon(grows, gcols)
        ec, er = canon(erows, ecols)
        if gc != ec:
            print(f"SCHEMA  {name}: spark={gc} oracle={ec}"); n_fail += 1; continue
        if len(gr) != len(er):
            print(f"ROWS    {name}: spark={len(gr)} oracle={len(er)}"); n_fail += 1; continue
        mismatch = any(a != b for a, b in zip(gr, er))
        if mismatch:
            bad = [i for i, (a, b) in enumerate(zip(gr, er)) if a != b][:3]
            print(f"VALUES  {name}: first diffs at rows {bad}")
            for i in bad:
                print(f"  spark : {gr[i]}\n  oracle: {er[i]}")
            n_fail += 1; continue
        print(f"PASS    {name} ({len(gr)} rows)"); n_pass += 1
    tail = f", {n_slow} oracle-timeout" if n_slow else ""
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noora} rows-only{tail}")
    sys.exit(1 if n_fail else 0)

main()
