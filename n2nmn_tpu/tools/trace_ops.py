"""Aggregate a captured device trace into per-op time attribution.

The reference has no profiling story at all (SURVEY.md §5); this tool
closes the loop on ours: `profile_eval --trace_dir d` (or any
`profiling.trace` context) writes a Chrome-trace JSON per host
(`plugins/profile/<run>/<host>.trace.json.gz`), and this script folds
the TPU device process rows into "time by op category / by op name"
tables — the attribution step between "phase X is N× its roofline" and
an actionable fix.

Usage:
    python -m n2nmn_tpu.tools.trace_ops <trace_dir> [--top 25]
    # host-side view (dispatch overhead) instead of device ops:
    python -m n2nmn_tpu.tools.trace_ops <trace_dir> --host
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os


def _load_events(path):
    with gzip.open(path, "rt") as f:
        return json.load(f)["traceEvents"]


def _process_names(events):
    return {e["pid"]: e["args"].get("name", "")
            for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}


def _thread_names(events):
    return {(e["pid"], e["tid"]): e["args"].get("name", "")
            for e in events
            if e.get("ph") == "M" and e.get("name") == "thread_name"}


def _self_times(events):
    """Per-event self time (duration minus nested children) for one
    thread track. Device tracks nest loop envelopes (while.N) over
    their body ops; summing raw durations double-counts, so attribute
    each interval only the time not covered by events nested inside it."""
    evs = sorted(((e["ts"], e["ts"] + e.get("dur", 0.0),
                   e.get("name", "?")) for e in events),
                 key=lambda x: (x[0], -(x[1] - x[0])))
    out = collections.defaultdict(float)
    stack = []   # (start, end, name, child_time)
    for ts, te, name in evs:
        while stack and stack[-1][1] <= ts:
            s0, e0, n0, ch = stack.pop()
            out[n0] += (e0 - s0) - ch
            if stack:
                stack[-1][3] += e0 - s0
        stack.append([ts, te, name, 0.0])
    while stack:
        s0, e0, n0, ch = stack.pop()
        out[n0] += (e0 - s0) - ch
        if stack:
            stack[-1][3] += e0 - s0
    return out


def _is_device(pname):
    low = pname.lower()
    return ("tpu" in low or "gpu" in low or "/device:" in low) \
        and "host" not in low


_CATEGORIES = (
    ("convolution", ("convolution", "conv.")),
    ("dot/matmul", ("dot", "gemm", "matmul", "einsum")),
    ("scatter/gather", ("scatter", "gather", "dynamic-update",
                        "dynamic_update", "dynamic-slice")),
    ("copy/transpose", ("copy", "transpose", "bitcast")),
    ("reduce", ("reduce",)),
    ("collective", ("all-reduce", "all-gather", "collective", "permute")),
    ("infeed/outfeed", ("infeed", "outfeed")),
    ("fusion", ("fusion", "fused")),
)


def categorize(name):
    low = name.lower()
    for cat, keys in _CATEGORIES:
        if any(k in low for k in keys):
            return cat
    return "other"


def summarize(trace_dir, top=25, host=False):
    paths = sorted(glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True))
    if not paths:
        raise SystemExit(f"no *.trace.json.gz under {trace_dir}")
    by_op = collections.defaultdict(float)
    by_source = collections.defaultdict(float)
    op_source = {}
    planes = set()
    for p in paths:
        events = _load_events(p)
        pnames = _process_names(events)
        tnames = _thread_names(events)
        want = {pid for pid, n in pnames.items()
                if (_is_device(n) != host)}
        planes.update(pnames[pid] for pid in want)
        tracks = collections.defaultdict(list)
        for e in events:
            if e.get("ph") == "X" and e.get("pid") in want:
                tid = (e["pid"], e.get("tid"))
                # module-envelope rows duplicate the op rows below them
                if "modules" in tnames.get(tid, "").lower():
                    continue
                tracks[tid].append(e)
                src = e.get("args", {}).get("source")
                if src and e["name"] not in op_source:
                    op_source[e["name"]] = src
        for tid, track in tracks.items():
            for name, us in _self_times(track).items():
                # ts/dur are microseconds in Chrome trace format
                by_op[name] += us * 1e-6
    for name, secs in by_op.items():
        by_source[op_source.get(name, "(no source attributed)")] += secs
    total = sum(by_op.values())
    by_cat = collections.defaultdict(float)
    for name, secs in by_op.items():
        by_cat[categorize(name)] += secs
    return {
        "trace_dir": trace_dir,
        "view": "host" if host else "device",
        "planes": sorted(planes),
        "total_op_s": round(total, 6),
        "by_category_ms": {k: round(v * 1e3, 3) for k, v in
                           sorted(by_cat.items(), key=lambda kv: -kv[1])},
        # jax op -> emitting framework line (from XLA's source metadata;
        # fused ops report their root's source, so this is indicative)
        "by_source_ms": {k: round(v * 1e3, 3) for k, v in
                         sorted(by_source.items(),
                                key=lambda kv: -kv[1])[:20]},
        "top_ops": [
            {"name": n, "ms": round(s * 1e3, 3),
             "pct": round(100 * s / total, 1) if total else 0.0}
            for n, s in sorted(by_op.items(), key=lambda kv: -kv[1])[:top]
        ],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--host", action="store_true",
                    help="aggregate host rows (dispatch) instead of "
                         "device op rows")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    report = summarize(args.trace_dir, args.top, host=args.host)
    text = json.dumps(report, indent=2)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")


if __name__ == "__main__":
    main()
