#!/usr/bin/env python3
"""Publish an agreeing bench pair WITH its per-query evidence.

Reads the last two runs from bench_runs.jsonl (each line is a full
Bench stamp: totals, steal fields, per-query warm map, per-query
steal shares), checks the publication gate the round-14 verdict asked
for, and writes a pair artifact:

  python3 scripts/publish_pair.py [out.json] [--annotate]

`--annotate` publishes a pair the gate would refuse, carrying the
gate's verdict verbatim in the artifact (for rounds where the host
never offers a quiet window — the reader sees exactly why the pair
is not certification-grade instead of getting no per-query data).

Gate (refuses to publish otherwise, exit 1):
  - both runs quiet by their own fields (mean steal <= 1%,
    worst 10s window <= 5%)
  - no query left in contended_queries in either run
  - warm-total spread < 10%

The artifact carries BOTH full per-query maps plus the per-query
spread distribution (max/p99/median and every query whose two
timings differ by >15% with its seconds), so "the pair brackets every
query" is checkable from the artifact alone, not asserted.
"""
import json, sys


def main():
    args = [a for a in sys.argv[1:] if a != "--annotate"]
    annotate = "--annotate" in sys.argv
    out = args[0] if args else "bench_pair.json"
    runs = [json.loads(l) for l in open("bench_runs.jsonl") if l.strip()]
    if len(runs) < 2:
        print(f"need two stamped runs in bench_runs.jsonl, have {len(runs)}")
        sys.exit(1)
    a, b = runs[-2], runs[-1]
    problems = []
    for tag, r in (("A", a), ("B", b)):
        # warm_quiet certifies the published (accepted warm) windows;
        # older stamps lack it — fall back to the run-level field
        if not r.get("warm_quiet", r.get("quiet")):
            problems.append(
                f"run {tag} not warm-quiet: steal_share={r['steal_share']}, "
                f"worst_10s_steal={r['worst_10s_steal']}")
        if r.get("contended_queries"):
            problems.append(f"run {tag} contended_queries="
                            f"{r['contended_queries']}")
    # differing query sets can reach the per-query loop under
    # --annotate (the exact case --annotate exists to publish) —
    # compare over the intersection and record the difference
    only_a = sorted(set(a["queries"]) - set(b["queries"]))
    only_b = sorted(set(b["queries"]) - set(a["queries"]))
    if only_a or only_b:
        problems.append(f"query sets differ between the runs "
                        f"(only_a={only_a}, only_b={only_b})")
    ta, tb = a["warm_total"], b["warm_total"]
    spread = abs(ta - tb) / max(min(ta, tb), 1e-9)
    if spread >= 0.10:
        problems.append(f"warm-total spread {spread:.1%} >= 10%")
    if problems and not annotate:
        print("REFUSING to publish a non-quiet / non-agreeing pair:")
        for p in problems:
            print(f"  - {p}")
        sys.exit(1)
    per = {}
    wide = []
    for q in sorted(set(a["queries"]) & set(b["queries"])):
        x, y = a["queries"][q], b["queries"][q]
        d = abs(x - y) / max(min(x, y), 0.01)
        per[q] = d
        if d > 0.15 and max(x, y) > 0.2:
            wide.append({"query": q, "run_a_sec": x, "run_b_sec": y,
                         "spread": round(d, 3)})
    ds = sorted(per.values()) or [0.0]
    wide.sort(key=lambda w: -w["spread"])
    artifact = {
        "protocol": "two consecutive Bench runs, idle box, steal-gated "
                    "(see Bench.scala); published only if both runs are "
                    "quiet by their own fields and agree within 10%",
        "gate": "PASSED" if not problems else
                "REFUSED (published --annotate): " + "; ".join(problems),
        "warm_total_a": ta, "warm_total_b": tb,
        "spread": round(spread, 4),
        "qcount": a["qcount"],
        "steal_a": {"share": a["steal_share"], "worst_10s": a["worst_10s_steal"]},
        "steal_b": {"share": b["steal_share"], "worst_10s": b["worst_10s_steal"]},
        "reruns_a": a.get("reruns", 0), "reruns_b": b.get("reruns", 0),
        "queries_only_in_a": only_a,
        "queries_only_in_b": only_b,
        "per_query_spread": {
            "max": round(ds[-1], 3),
            "p99": round(ds[int(len(ds) * 0.99)], 3),
            "median": round(ds[len(ds) // 2], 3),
            "over_15pct_and_200ms": wide,
        },
        "queries_a": a["queries"],
        "queries_b": b["queries"],
        "q_steal_a": a.get("q_steal", {}),
        "q_steal_b": b.get("q_steal", {}),
        "sg_op_a": a.get("sg_op", {}),
        "sg_op_b": b.get("sg_op", {}),
        "sf": a["sf"],
    }
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"published {out}: warm {ta}/{tb} s ({spread:.1%} spread), "
          f"{a['qcount']} queries, per-query max spread {ds[-1]:.0%}, "
          f"{len(wide)} queries over 15%/200ms")


main()
