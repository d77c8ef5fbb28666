#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Runs graft.Verify output (parquet per query + oracle_sql.json) against
DuckDB on the same sf dir, sorts columns by name and rows by value,
and compares. Usage:
    python3 scripts/localcheck.py <verify_out_dir> <sf_dir> [timeout]
        [--scale-contracts] [--force-contracts=q1,q2]

Type checking happens at the DuckDB level, not the Python-cell level:
`DESCRIBE <oracle sql>` must equal `DESCRIBE SELECT * FROM '<spark
parquet>'` column-for-column (name + DuckDB type). Python's duckdb
client renders HUGEINT and BIGINT both as `int`, and Decimal == float
is True, so cell-level checks are blind to exactly the class of skew
(round-8 m2 ts_ms DECIMAL, round-9 m2 frame_sum HUGEINT) that the
driver's type-sensitive hash rejects.

An optional third arg caps each ORACLE query's runtime in seconds:
at the sf1 gate scale some oracle replays are quadratic where the
engine is not (e21's mutual kNN in pure SQL), and a compare that
hangs reports nothing. A timed-out oracle prints ORATIME and counts
separately — it is a statement about the TEST HARNESS at that scale,
not about the engine.

--scale-contracts (the sf1 gate mode): when the FULL compare fails
(ORATIME / ROWS / VALUES / TYPES / SCHEMA) and Verify dumped a scale
contract for the query (scale_contracts.json + _aux/ sidecars), the
contract's checks run instead and a passing query prints SCALED. The
flag exists so local sf0.01 preflights keep full-fail semantics: a
contract must never mask a fresh full-oracle regression at the scale
where the full oracle is supposed to pass. --force-contracts skips
the full compare for the named queries (contract iteration aid).

Contract check kinds (see graft.QueryModule.ScaleCheck):
  exact  — both sides' result sets compared with the same canon/type
           machinery as the full gate;
  recall — spark side returns (n_got, n_matched), oracle (n_exact);
           passes iff n_matched == n_got and n_matched >= bound*n_exact.
Placeholders substituted in both sides: {q} = this query's dump dir,
{aux} = the _aux sidecar dir, {qof:NAME} = another query's dump dir.
"""
import json, sys, glob, os, re, threading
import duckdb


def run_capped(con, sql, timeout):
    """fetchall with a wall-clock cap via duckdb's interrupt (None =
    uncapped, the driver's mode)."""
    if not timeout:
        r = con.execute(sql)
        return [d[0] for d in r.description], r.fetchall()
    done = threading.Event()
    timed_out = threading.Event()
    def watchdog():
        if not done.wait(timeout):
            # re-check right before interrupting: if the query finished
            # in the window between wait() expiry and interrupt(), the
            # interrupt would land on the idle shared connection and
            # abort the NEXT query instead (mislabeling a healthy
            # oracle as ORATIME/ORAFAIL)
            if not done.is_set():
                timed_out.set()
                con.interrupt()
    t = threading.Thread(target=watchdog, daemon=True)
    t.start()
    try:
        r = con.execute(sql)
        return [d[0] for d in r.description], r.fetchall()
    except duckdb.InterruptException:
        if timed_out.is_set():
            raise
        # stale interrupt from a previous query's watchdog landing on
        # the idle connection — this query never actually timed out;
        # retry it once
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


def subst(sql, outdir, name):
    """Expand {q}/{aux}/{qof:NAME} path placeholders."""
    sql = sql.replace("{q}", f"{outdir}/{name}")
    # aux sidecars live in a SIBLING dir since r17 (they used to live
    # under outdir/_aux, which the driver's correctness enumeration
    # picked up as a phantom query); fall back to the old location so
    # pre-r17 dumps stay checkable
    auxdir = f"{outdir.rstrip('/')}_aux"
    if not os.path.isdir(auxdir) and os.path.isdir(f"{outdir}/_aux"):
        auxdir = f"{outdir}/_aux"
    sql = sql.replace("{aux}", auxdir)
    return re.sub(r"\{qof:([A-Za-z0-9_]+)\}",
                  lambda m: f"{outdir}/{m.group(1)}", sql)


def compare_sets(con, spark_sql, oracle_sql, timeout):
    """Full canon/type compare of two DuckDB queries. Returns
    (ok, detail)."""
    gcols_rows = run_capped(con, spark_sql, timeout)
    ecols_rows = run_capped(con, oracle_sql, timeout)
    gtypes = describe(con, f"({spark_sql})")
    etypes = describe(con, f"({oracle_sql})")
    if gtypes != etypes:
        gm, em = dict(gtypes), dict(etypes)
        diffs = [f"{c}: spark={gm.get(c)} oracle={em.get(c)}"
                 for c in sorted(set(gm) | set(em)) if gm.get(c) != em.get(c)]
        return False, "TYPES " + "; ".join(diffs[:6])
    gc, gr = canon(gcols_rows[1], gcols_rows[0])
    ec, er = canon(ecols_rows[1], ecols_rows[0])
    if gc != ec:
        return False, f"SCHEMA spark={gc} oracle={ec}"
    if len(gr) != len(er):
        return False, f"ROWS spark={len(gr)} oracle={len(er)}"
    bad = [i for i, (a, b) in enumerate(zip(gr, er)) if a != b][:3]
    if bad:
        detail = "; ".join(f"row{i} spark={gr[i]} oracle={er[i]}" for i in bad)
        return False, f"VALUES {detail}"
    return True, f"{len(gr)} rows"


def run_contract(con, name, checks, outdir, timeout):
    """Run a query's scale contract. Returns (ok, summary)."""
    details = []
    for c in checks:
        cname, kind = c["name"], c.get("kind", "exact")
        s_sql = subst(c["spark"], outdir, name)
        o_sql = subst(c["oracle"], outdir, name)
        try:
            if kind == "exact":
                ok, detail = compare_sets(con, s_sql, o_sql, timeout)
                if not ok:
                    return False, f"check '{cname}': {detail}"
                details.append(f"{cname}[{detail}]")
            elif kind == "recall":
                _, srows = run_capped(con, s_sql, timeout)
                _, orows = run_capped(con, o_sql, timeout)
                n_got, n_matched = int(srows[0][0]), int(srows[0][1])
                n_exact = int(orows[0][0])
                bound = float(c.get("bound", 0.0))
                if n_matched != n_got:
                    return False, (f"check '{cname}': {n_got - n_matched} of "
                                   f"{n_got} emitted rows are NOT true pairs")
                if n_exact <= 0:
                    return False, f"check '{cname}': exact set is empty"
                recall = n_matched / n_exact
                if recall < bound:
                    return False, (f"check '{cname}': recall {recall:.4f} "
                                   f"< bound {bound} ({n_matched}/{n_exact})")
                details.append(f"{cname}[recall {recall:.4f} >= {bound}]")
            else:
                return False, f"check '{cname}': unknown kind '{kind}'"
        except duckdb.InterruptException:
            return False, f"check '{cname}': exceeded {timeout}s"
        except Exception as e:
            return False, f"check '{cname}': {e}"
    return True, ", ".join(details)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = [a for a in sys.argv[1:] if a.startswith("--")]
    outdir, sfdir = args[0], args[1]
    timeout = float(args[2]) if len(args) > 2 else None
    use_contracts = "--scale-contracts" in flags
    force = set()
    for f in flags:
        if f.startswith("--force-contracts="):
            force = set(f.split("=", 1)[1].split(","))
            use_contracts = True
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
    contracts = {}
    cpath = f"{outdir}/scale_contracts.json"
    if use_contracts and os.path.exists(cpath):
        contracts = json.load(open(cpath))
    n_pass = n_fail = n_noora = n_slow = n_scaled = 0
    # A query Verify declared (it dumps oracle_sql.json from the full
    # queries map) but did NOT dump is a FAILURE, not a silent skip —
    # Verify swallows per-query exceptions, and without this check a
    # query that throws vanishes from the count (round 11: 17 r-ingest
    # queries StackOverflowed and preflight still printed '0 fail').
    dumped = {d.rstrip("/").split("/")[-1] for d in glob.glob(f"{outdir}/*/")}
    dumped = {d for d in dumped if not d.startswith("_")}
    for name in sorted(set(oracles) - dumped):
        print(f"MISSING {name} (declared but not dumped — query threw?)")
        n_fail += 1

    def try_contract(name, reason):
        """Contract fallback after a full-compare failure. Returns True
        when the contract exists and passes."""
        nonlocal n_scaled, n_fail
        checks = contracts.get(name)
        if not checks:
            return False
        ok, summary = run_contract(con, name, checks, outdir, timeout)
        if ok:
            print(f"SCALED  {name}: full compare: {reason}; "
                  f"contract PASS ({len(checks)} checks: {summary})")
            n_scaled += 1
            return True
        print(f"SCALEDF {name}: full compare: {reason}; contract FAIL: {summary}")
        n_fail += 1
        return True

    for qdir in sorted(glob.glob(f"{outdir}/*/")):
        name = qdir.rstrip("/").split("/")[-1]
        if name.startswith("_"):
            continue
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
        if name in force and contracts.get(name):
            if not try_contract(name, "skipped (--force-contracts)"):
                print(f"ORAFAIL {name}: --force-contracts but no contract")
                n_fail += 1
            continue
        try:
            ecols, erows = run_capped(con, oracles[name], timeout)
        except duckdb.InterruptException:
            if try_contract(name, f"oracle exceeded {timeout}s"):
                continue
            print(f"ORATIME {name}: oracle exceeded {timeout}s at this scale")
            n_slow += 1; continue
        except Exception as e:
            if timeout and "INTERRUPT" in str(e).upper():
                if try_contract(name, f"oracle exceeded {timeout}s"):
                    continue
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
            if try_contract(name, "type mismatch"):
                continue
            n_fail += 1; continue
        gc, gr = canon(grows, gcols)
        ec, er = canon(erows, ecols)
        if gc != ec:
            if try_contract(name, f"schema spark={gc} oracle={ec}"):
                continue
            print(f"SCHEMA  {name}: spark={gc} oracle={ec}"); n_fail += 1; continue
        if len(gr) != len(er):
            if try_contract(name, f"rows spark={len(gr)} oracle={len(er)}"):
                continue
            print(f"ROWS    {name}: spark={len(gr)} oracle={len(er)}"); n_fail += 1; continue
        mismatch = any(a != b for a, b in zip(gr, er))
        if mismatch:
            bad = [i for i, (a, b) in enumerate(zip(gr, er)) if a != b][:3]
            if try_contract(name, f"value diffs at rows {bad}"):
                continue
            print(f"VALUES  {name}: first diffs at rows {bad}")
            for i in bad:
                print(f"  spark : {gr[i]}\n  oracle: {er[i]}")
            n_fail += 1; continue
        print(f"PASS    {name} ({len(gr)} rows)"); n_pass += 1
    tail = f", {n_slow} oracle-timeout" if n_slow else ""
    scl = f", {n_scaled} scaled-contract" if n_scaled else ""
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noora} rows-only{scl}{tail}")
    sys.exit(1 if n_fail else 0)

main()
