#!/usr/bin/env python3
"""Host-steal monitor (round-13 verdict ask #1): samples /proc/stat
once per second for the duration of a wrapped command (or until
killed) and prints a one-line JSON summary of CPU-time shares, so
"hypervisor steal" is a measurement instead of a hypothesis next to
any bench/probe number recorded while it ran.

Usage:
    python3 scripts/stealmon.py <out.json> &   # sample until killed
    python3 scripts/stealmon.py <out.json> -- cmd args...  # wrap cmd

The summary reports total jiffy deltas per category, the steal share
(steal / total), and the worst 10-second steal window — a quiet box
shows steal_share ~0; the historical stall windows would show
double-digit percent during the stalled reps.
"""
import json
import os
import signal
import subprocess
import sys
import time

FIELDS = ["user", "nice", "system", "idle", "iowait", "irq", "softirq",
          "steal", "guest", "guest_nice"]


def read_cpu():
    with open("/proc/stat") as f:
        for line in f:
            if line.startswith("cpu "):
                vals = [int(x) for x in line.split()[1:]]
                vals += [0] * (len(FIELDS) - len(vals))
                return dict(zip(FIELDS, vals))
    raise RuntimeError("no cpu line in /proc/stat")


def main():
    out = sys.argv[1]
    cmd = None
    if "--" in sys.argv:
        cmd = sys.argv[sys.argv.index("--") + 1:]

    samples = [(time.time(), read_cpu())]
    stop = {"flag": False}

    def handler(_sig, _frm):
        stop["flag"] = True

    signal.signal(signal.SIGTERM, handler)
    signal.signal(signal.SIGINT, handler)

    proc = subprocess.Popen(cmd) if cmd else None
    # In wrap mode the summary must cover the WHOLE wrapped run — a
    # signal forwards a terminate to the child and sampling continues
    # until it actually exits (a summary covering only a prefix of the
    # bench it claims to contextualize is the exact gap this tool
    # exists to close). Without a child, a signal ends sampling.
    while True:
        if stop["flag"]:
            if proc is None:
                break
            if proc.poll() is None:
                proc.terminate()
        time.sleep(1.0)
        samples.append((time.time(), read_cpu()))
        if proc is not None and proc.poll() is not None:
            break

    first, last = samples[0][1], samples[-1][1]
    delta = {k: last[k] - first[k] for k in FIELDS}
    total = sum(delta.values()) or 1
    # worst 10-sample steal window
    worst = 0.0
    for i in range(len(samples) - 10):
        a, b = samples[i][1], samples[i + 10][1]
        wtot = sum(b[k] - a[k] for k in FIELDS) or 1
        worst = max(worst, (b["steal"] - a["steal"]) / wtot)
    summary = {
        "seconds": round(samples[-1][0] - samples[0][0], 1),
        "jiffies": delta,
        "steal_share": round(delta["steal"] / total, 5),
        "iowait_share": round(delta["iowait"] / total, 5),
        "busy_share": round(
            (delta["user"] + delta["nice"] + delta["system"]) / total, 5),
        "worst_10s_steal_share": round(worst, 5),
        "cmd_rc": proc.returncode if proc is not None else None,
    }
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))
    if proc is not None and proc.returncode:
        sys.exit(proc.returncode)


if __name__ == "__main__":
    main()
