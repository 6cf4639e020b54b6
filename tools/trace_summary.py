#!/usr/bin/env python
"""Summarize an xprof trace written by tools/profile_net.py.

Parses the Chrome-trace JSON (<out>/plugins/profile/*/…trace.json.gz — the
axon tunnel records real device traces that parse with ordinary json) and
prints device-op time grouped by category plus the top individual ops.
This replaces eyeballing 100k-event traces when hunting a regression
(reference had only wall-clock timers, lib/utils/timer.py).

Usage: python tools/trace_summary.py /tmp/detectron_tpu_profile \
           [--steps 3] [--top 30] [--like roi]
"""

import argparse
import collections
import glob
import gzip
import json
import os


CATEGORIES = (
    ("convolution", ("convolution", "conv")),
    ("pallas/custom-call", ("custom-call", "roi_window", "nms_kernel",
                            "tpu_custom_call")),
    ("matmul", ("dot", "einsum")),
    ("sort/top-k", ("sort", "top-k", "topk")),
    ("scatter/dus", ("scatter", "dynamic-update-slice", "dynamic_update")),
    ("gather/ds", ("gather", "dynamic-slice", "dynamic_slice")),
    ("copy/transpose", ("copy", "transpose", "bitcast")),
    ("reduce", ("reduce",)),
    ("fusion/elementwise", ("fusion", "add", "multiply", "select",
                            "convert", "broadcast")),
)


def categorize(name):
    low = name.lower()
    for cat, keys in CATEGORIES:
        if any(k in low for k in keys):
            return cat
    return "other"


def load_events(out_dir):
    paths = sorted(glob.glob(
        os.path.join(out_dir, "plugins", "profile", "*", "*trace.json.gz")))
    if not paths:
        paths = sorted(glob.glob(
            os.path.join(out_dir, "**", "*trace.json.gz"), recursive=True))
    assert paths, "no trace.json.gz under " + out_dir
    path = paths[-1]  # latest run
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    return path, data.get("traceEvents", [])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("out_dir")
    p.add_argument("--steps", type=int, default=3,
                   help="number of profiled steps (durations are reported "
                        "per step)")
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--like", default=None,
                   help="also list every op whose name contains this "
                        "substring")
    args = p.parse_args()

    path, events = load_events(args.out_dir)
    # Device lanes: pid/tid names containing TPU / device; fall back to
    # "every complete event with a dur that is not a python/host thread".
    thread_names = {}
    proc_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            thread_names[(e.get("pid"), e.get("tid"))] = \
                e.get("args", {}).get("name", "")
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e.get("pid")] = e.get("args", {}).get("name", "")

    def is_device(e):
        pn = proc_names.get(e.get("pid"), "").lower()
        tn = thread_names.get((e.get("pid"), e.get("tid")), "").lower()
        lane = pn + " " + tn
        if any(k in lane for k in ("tpu", "device", "xla", "accelerator")):
            return not any(k in lane for k in ("host", "python"))
        return False

    any_device_meta = any(is_device(e) for e in events
                          if e.get("ph") == "X")
    # SELF time (duration minus nested children): trace spans nest (a cond
    # span contains the sweeps it dispatches; the jit_* root contains the
    # whole step), so inclusive sums double-count. Build per-lane interval
    # stacks by start time.
    lanes = collections.defaultdict(list)
    for e in events:
        if e.get("ph") != "X" or "dur" not in e or "ts" not in e:
            continue
        if any_device_meta and not is_device(e):
            continue
        lanes[(e.get("pid"), e.get("tid"))].append(e)

    by_op = collections.Counter()
    by_cat = collections.Counter()
    total = 0.0
    for lane_events in lanes.values():
        lane_events.sort(key=lambda e: (e["ts"], -e["dur"]))
        stack = []  # (end_ts, name, child_time_accum index)
        child_time = []
        for e in lane_events:
            ts, dur = e["ts"], e["dur"]
            name = e.get("name", "?")
            while stack and ts >= stack[-1][0] - 1e-9:
                end, pname, idx = stack.pop()
                self_ms = (child_time[idx][0] - child_time[idx][1]) / 1000.0
                by_op[pname] += self_ms
                by_cat[categorize(pname)] += self_ms
                total += self_ms
            if stack:
                child_time[stack[-1][2]][1] += dur
            stack.append((ts + dur, name, len(child_time)))
            child_time.append([dur, 0.0])
        while stack:
            end, pname, idx = stack.pop()
            self_ms = (child_time[idx][0] - child_time[idx][1]) / 1000.0
            by_op[pname] += self_ms
            by_cat[categorize(pname)] += self_ms
            total += self_ms

    per = 1.0 / max(args.steps, 1)
    print("trace:", path)
    print("device op time: {:.1f} ms total, {:.1f} ms/step over {} steps"
          .format(total, total * per, args.steps))
    print("\nby category (ms/step):")
    for cat, ms in by_cat.most_common():
        print("  {:<22s} {:>9.2f}  ({:4.1f}%)".format(
            cat, ms * per, 100.0 * ms / max(total, 1e-9)))
    print("\ntop {} ops (ms/step):".format(args.top))
    for name, ms in by_op.most_common(args.top):
        print("  {:>8.2f}  {}".format(ms * per, name[:110]))
    if args.like:
        print("\nops matching {!r} (ms/step):".format(args.like))
        for name, ms in sorted(by_op.items(), key=lambda kv: -kv[1]):
            if args.like.lower() in name.lower():
                print("  {:>8.2f}  {}".format(ms * per, name[:110]))


if __name__ == "__main__":
    main()
