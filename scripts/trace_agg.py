"""Aggregate a jax.profiler chrome-trace into a per-op table.

Usage: python scripts/trace_agg.py [trace_root=/tmp/jaxtrace] [n_steps=5] [top=40]

Finds the newest `plugins/profile/*/ *.trace.json.gz` under the trace root,
keeps device-side complete events (TPU op executions), groups by op name,
and prints total-ms/step ranked. Group labels collapse fusion suffixes so
e.g. `fusion.123` variants aggregate; the `src` column shows the op_name
metadata tail (source attribution) when present in args.

This is THE tool for the perf loop (CLAUDE.md round-3b): trace first,
optimize what the table names.
"""
import gzip
import json
import os
import re
import sys


def newest_trace(root):
    base = os.path.join(root, "plugins", "profile")
    runs = sorted(os.listdir(base))
    if not runs:
        raise FileNotFoundError(f"no profile runs under {base}")
    d = os.path.join(base, runs[-1])
    for f in os.listdir(d):
        if f.endswith(".trace.json.gz"):
            return os.path.join(d, f)
    raise FileNotFoundError(f"no trace.json.gz in {d}")


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace"
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    top = int(sys.argv[3]) if len(sys.argv) > 3 else 40
    path = newest_trace(root)
    with gzip.open(path) as f:
        data = json.load(f)
    ev = data.get("traceEvents", [])

    # device pids: process names containing "TPU" / "/device:"
    dev_pids = set()
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            nm = e.get("args", {}).get("name", "")
            if "TPU" in nm or "/device" in nm.lower():
                dev_pids.add(e["pid"])
    # fall back: pid with the most X events that have 'dur'
    rows = {}
    total = 0.0
    for e in ev:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e["name"]
        # collapse autotuned variant suffixes: fusion.123 -> fusion — but
        # keep generic fusions apart by their source attribution (grouping
        # ALL of them under one 45 ms "fusion" row hides exactly the
        # breakdown this tool exists for)
        base = re.sub(r"\.\d+$", "", name)
        src = ""
        args = e.get("args") or {}
        for k in ("tf_op", "source", "op_name", "long_name"):
            if k in args:
                src = str(args[k])[:90]
                break
        dur = e["dur"] / 1e3  # us -> ms
        total += dur
        if base.endswith("fusion") or base == "fusion":
            if os.environ.get("TRACE_AGG_FINE"):
                base = name  # keep each fusion.NNNN separate
            else:
                key_src = re.sub(r"[0-9]+", "N", src)  # layer_0/11 merge
                base = f"{base}  @{key_src[:70]}"
        r = rows.setdefault(base, [0.0, 0, src])
        r[0] += dur
        r[1] += 1
        if not r[2]:
            r[2] = src
    print(f"# {path}")
    print(f"# total device time: {total:.2f} ms over ~{n_steps} steps "
          f"({total / n_steps:.2f} ms/step)")
    print(f"{'ms/step':>9}  {'%':>5}  {'n':>5}  name / src")
    for name, (ms, n, src) in sorted(rows.items(), key=lambda kv: -kv[1][0])[:top]:
        print(f"{ms / n_steps:9.3f}  {100 * ms / total:5.1f}  {n:5d}  {name}"
              + (f"  [{src}]" if src else ""))


if __name__ == "__main__":
    main()
