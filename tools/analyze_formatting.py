"""Attribute the 'data formatting' trace category op-by-op.

The round-4 flagship trace showed ~11-12 ms/step of 'data formatting'
(reshape/transpose/copy HLOs) with only the 3x134 MB one-hot-dot relayout
copies (~3 ms) explained in writing. This tool reads a raw jax.profiler
trace directory and groups every data-formatting (and copy) event by
(HLO op, source line, tf_op), so each remaining contributor can be named
and either recovered or justified (docs/kernels.md "Layout-copy
residual").

Usage:
    python tools/analyze_formatting.py --trace_dir /tmp/ssd3d_trace \
        [--execs 6] [--out benchmarks/formatting_breakdown.json]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace_dir", default="/tmp/ssd3d_trace")
    ap.add_argument("--execs", type=int, default=None,
                    help="executions traced (divides totals into ms/step); "
                    "default: count distinct occurrences of the most "
                    "frequent top-level op")
    ap.add_argument("--categories", nargs="*",
                    default=["data formatting", "copy-start", "copy-done"])
    ap.add_argument("--out", default=None)
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    files = sorted(glob.glob(
        os.path.join(args.trace_dir, "**", "*.trace.json.gz"),
        recursive=True))
    assert files, f"no trace files under {args.trace_dir}"
    data = json.load(gzip.open(files[-1]))

    per_op = collections.defaultdict(
        lambda: {"ms": 0.0, "count": 0, "source": "", "tf_op": "",
                 "bytes": 0, "shape": ""})
    name_counts = collections.Counter()
    total_all = 0.0
    for e in data.get("traceEvents", []):
        if e.get("ph") != "X":
            continue
        a = e.get("args", {})
        cat = a.get("hlo_category")
        if cat is None:
            continue
        total_all += e["dur"] / 1000.0
        name_counts[e["name"]] += 1
        if cat not in args.categories:
            continue
        rec = per_op[e["name"]]
        rec["ms"] += e["dur"] / 1000.0
        rec["count"] += 1
        rec["source"] = a.get("source", "")
        rec["tf_op"] = a.get("tf_op", "")[:120]
        rec["bytes"] = int(a.get("raw_bytes_accessed", 0) or 0)
        rec["shape"] = a.get("shape_with_layout", "")[:80]

    execs = args.execs or max(name_counts.values() or [1])
    rows = sorted(per_op.items(), key=lambda kv: -kv[1]["ms"])
    fmt_total = sum(r["ms"] for _, r in rows)
    print(f"executions assumed: {execs}; total device {total_all/execs:.1f} "
          f"ms/step; {'+'.join(args.categories)} "
          f"{fmt_total/execs:.2f} ms/step")
    out_rows = []
    for name, r in rows[:args.top]:
        ms_step = r["ms"] / execs
        print(f"{ms_step:7.3f} ms/step  {name:24s} "
              f"{r['bytes']/1e6:8.1f} MB  {r['shape']:40s} "
              f"{r['source']:46s} {r['tf_op']}")
        out_rows.append({
            "op": name, "ms_per_step": round(ms_step, 3),
            "bytes": r["bytes"], "shape": r["shape"],
            "source": r["source"], "tf_op": r["tf_op"],
        })
    if args.out:
        with open(args.out, "w") as f:
            json.dump({
                "trace_dir": args.trace_dir,
                "executions": execs,
                "total_device_ms_per_step": round(total_all / execs, 2),
                "category_ms_per_step": round(fmt_total / execs, 2),
                "categories": args.categories,
                "rows": out_rows,
            }, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
