"""Per-op device-time table from a jax.profiler trace (the roofline tool).

Parses the ``*.trace.json.gz`` the profiler writes, aggregates complete
events on the TPU device track by op name across repeated iterations, and
prints total/average device time per op — the raw material for the per-op
roofline accounting in PERF.md.

Usage:
    python tools/trace_ops.py /tmp/ext_trace [--top 30] [--iters N]

``--iters`` divides the aggregate by the number of traced iterations so the
table reads as ms/iteration.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os


def load_events(trace_dir: str):
    paths = sorted(
        glob.glob(
            os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")
        )
    )
    if not paths:
        raise SystemExit(f"no trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    pids = {
        e["pid"]: e["args"]["name"]
        for e in tr["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dev_pids = {p for p, n in pids.items() if "TPU" in n or "device" in n}
    return [
        e
        for e in tr["traceEvents"]
        if e.get("ph") == "X" and e.get("pid") in dev_pids
    ]


def op_table(events, iters: int = 1):
    """Aggregate per-op (us, flops, bytes, category, label), skipping the
    outer program event (it spans whole iterations and would double-count
    its children; recognized by its ``run_id`` arg)."""
    agg = collections.defaultdict(lambda: [0.0, 0, 0.0, 0.0, "", ""])
    total = 0.0
    for e in events:
        name = e["name"]
        a = e.get("args", {})
        if "run_id" in a:  # the outer jit program event
            total += e["dur"]
            continue
        r = agg[name]
        r[0] += e["dur"]
        r[1] += 1
        r[2] += float(a.get("model_flops", 0))
        r[3] += float(a.get("bytes_accessed", 0))
        r[4] = a.get("hlo_category", "")
        r[5] = a.get("tf_op", "").split("/")[-2:-1] or [""]
    n = max(iters, 1)
    rows = sorted(
        (
            (v[0] / n, v[1] // n, v[2] / n, v[3] / n, v[4], v[5][0], k)
            for k, v in agg.items()
        ),
        reverse=True,
    )
    return rows, total / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--iters", type=int, default=1)
    ap.add_argument(
        "--peak-tf", type=float, default=None,
        help="measured MXU peak (TF/s) for the roofline floor column",
    )
    ap.add_argument(
        "--peak-gbs", type=float, default=None,
        help="measured HBM rate (GB/s) for the roofline floor column",
    )
    args = ap.parse_args()
    events = load_events(args.trace_dir)
    rows, prog_us = op_table(events, args.iters)
    tot_f = sum(r[2] for r in rows)
    tot_b = sum(r[3] for r in rows)
    print(
        f"program device time: {prog_us / 1e3:.1f} ms/iter | "
        f"{tot_f / 1e12:.2f} TFLOP | {tot_b / 1e9:.1f} GB accessed | "
        f"{tot_f / prog_us / 1e6:.1f} eff TF/s | "
        f"{tot_b / prog_us / 1e3:.0f} eff GB/s"
    )
    hdr = f"{'ms/it':>7} {'TF/s':>6} {'GB/s':>5}"
    if args.peak_tf and args.peak_gbs:
        hdr += f" {'floor':>6} {'x':>5}"
    print(hdr + "  op  [category | module]")
    for us, cnt, fl, by, cat, mod, name in rows[: args.top]:
        line = (
            f"{us / 1e3:7.2f} {fl / us / 1e6:6.1f} {by / us / 1e3:5.0f}"
        )
        if args.peak_tf and args.peak_gbs:
            floor_us = max(
                fl / args.peak_tf / 1e6, by / args.peak_gbs / 1e3
            )
            line += f" {floor_us / 1e3:6.2f} {us / max(floor_us, 1e-9):5.2f}"
        print(f"{line}  {name}  [{cat} | {mod}]")
    rest = sum(r[0] for r in rows[args.top :])
    print(f"{rest / 1e3:7.2f}  (everything else, {len(rows)} ops total)")


if __name__ == "__main__":
    main()
