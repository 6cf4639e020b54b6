#!/usr/bin/env python
"""Summarize an xprof trace written by tools/profile_net.py.

Parses the Chrome-trace JSON (<out>/plugins/profile/*/…trace.json.gz — the
axon tunnel records real device traces that parse with ordinary json) and
prints device-op SELF time grouped three ways:

  1. by the trace's own `hlo_category` arg (convolution fusion, custom-call,
     loop fusion, data formatting, ...) — authoritative where present;
  2. by STAGE: the deepest repo frame of each op's `source_stack`
     (models/resnet.py, ops/windowed_roi.py, ...) — the per-stage budget
     PERF.md tracks;
  3. the top individual ops, annotated with category, TFLOP/s (from
     `model_flops`) and GB/s (from `raw_bytes_accessed`) so MXU/HBM
     utilization is read off directly.

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


NAME_CATEGORIES = (
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


def categorize(e):
    args = e.get("args") or {}
    cat = args.get("hlo_category")
    if cat:
        return cat
    low = e.get("name", "?").lower()
    for cat, keys in NAME_CATEGORIES:
        if any(k in low for k in keys):
            return cat
    return "other"


def stage_of(e):
    """Deepest repo frame of the op's source stack, e.g. 'models/fpn.py'."""
    args = e.get("args") or {}
    stack = args.get("source_stack") or args.get("source") or ""
    for line in stack.splitlines():
        if "/detectron_tpu/" in line:
            frag = line.split("/detectron_tpu/", 1)[1].split(":", 1)[0]
            return frag
    if "/tools/" in stack or "profile_net" in stack:
        return "(driver)"
    return "(no source)"


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
    # SELF time (duration minus nested children): trace spans nest (the
    # jit_* module root span contains the whole step in its lane), so
    # inclusive sums double-count. Build per-lane interval stacks.
    lanes = collections.defaultdict(list)
    for e in events:
        if e.get("ph") != "X" or "dur" not in e or "ts" not in e:
            continue
        if any_device_meta and not is_device(e):
            continue
        lanes[(e.get("pid"), e.get("tid"))].append(e)

    by_op = collections.Counter()
    by_cat = collections.Counter()
    by_stage = collections.Counter()
    op_meta = {}  # merge key -> (category, model_flops, bytes, stage, name)
    n_instances = collections.Counter()
    total = 0.0

    def merge_key(e):
        """Canonical per-step identity: some traces renumber instances each
        step (step 1's fusion.885 is step 2's fusion.902), splitting one
        logical op's time across N names so multi-step top-op averages
        under-attribute (TODO.md infra). Strip the trailing .NNN and key on
        (base, category, flops, bytes, stage) — identical cost signatures
        at the same source site ARE the same logical op."""
        name = e.get("name", "?")
        base, dot, suf = name.rpartition(".")
        if dot and suf.isdigit():
            name = base
        a = e.get("args") or {}
        return (name, categorize(e), a.get("model_flops"),
                a.get("raw_bytes_accessed"), stage_of(e))

    def account(e, self_ms):
        nonlocal total
        name = e.get("name", "?")
        # Module root spans (jit_<fn>) cover the whole step in their own
        # lane; excluding them from totals keeps self-time sums = step time.
        if name.startswith("jit_") and "(" in name:
            return
        # Some traces name the per-step module root by its bare program id
        # ("2", "5", ...) with no hlo_category — same whole-step wrapper
        # (seen on train-step traces; duration == the whole step).
        if name.isdigit() and not (e.get("args") or {}).get("hlo_category"):
            return
        key = merge_key(e)
        by_op[key] += self_ms
        n_instances[key] += 1
        by_cat[categorize(e)] += self_ms
        by_stage[stage_of(e)] += self_ms
        total += self_ms
        if key not in op_meta:
            a = e.get("args") or {}
            op_meta[key] = (
                categorize(e),
                float(a.get("model_flops", 0) or 0),
                float(a.get("raw_bytes_accessed", 0) or 0),
                stage_of(e), name)

    for lane_events in lanes.values():
        lane_events.sort(key=lambda e: (e["ts"], -e["dur"]))
        stack = []  # (end_ts, event, child_time_accum index)
        child_time = []
        for e in lane_events:
            ts, dur = e["ts"], e["dur"]
            while stack and ts >= stack[-1][0] - 1e-9:
                end, pe, idx = stack.pop()
                self_ms = (child_time[idx][0] - child_time[idx][1]) / 1000.0
                account(pe, self_ms)
            if stack:
                child_time[stack[-1][2]][1] += dur
            stack.append((ts + dur, e, len(child_time)))
            child_time.append([dur, 0.0])
        while stack:
            end, pe, idx = stack.pop()
            self_ms = (child_time[idx][0] - child_time[idx][1]) / 1000.0
            account(pe, self_ms)

    per = 1.0 / max(args.steps, 1)
    print("trace:", path)
    print("device op time: {:.1f} ms total, {:.1f} ms/step over {} steps"
          .format(total, total * per, args.steps))
    print("\nby hlo category (ms/step):")
    for cat, ms in by_cat.most_common():
        print("  {:<26s} {:>9.2f}  ({:4.1f}%)".format(
            cat, ms * per, 100.0 * ms / max(total, 1e-9)))
    print("\nby stage (deepest repo frame, ms/step):")
    for st, ms in by_stage.most_common():
        print("  {:<42s} {:>9.2f}  ({:4.1f}%)".format(
            st, ms * per, 100.0 * ms / max(total, 1e-9)))

    def oprow(key, ms):
        cat, flops, nbytes, stage, name = op_meta.get(
            key, ("?", 0, 0, "?", key[0]))
        # flops/bytes are PER INSTANCE; with instance-merged keys the rates
        # use per-instance time (self-time / merged instance count), so
        # they stay exact for once-per-step ops and remain a per-instance
        # mean for intra-step repeats.
        n = max(n_instances.get(key, 1), 1)
        dt = ms / n / 1000.0
        perf = ""
        if flops and dt > 0:
            perf += " {:6.1f} TF/s".format(flops / dt / 1e12)
        if nbytes and dt > 0:
            perf += " {:6.1f} GB/s".format(nbytes / dt / 1e9)
        label = name if n <= args.steps else \
            "{} [x{}]".format(name, (n + args.steps - 1) // args.steps)
        return "  {:>8.2f}  {:<32s} {:<24s}{}  {}".format(
            ms * per, label[:32], stage[:24], perf, cat)

    print("\ntop {} ops (ms/step, instance-merged; TF/s and GB/s are "
          "per-instance means):".format(args.top))
    for key, ms in by_op.most_common(args.top):
        print(oprow(key, ms))
    if args.like:
        print("\nops matching {!r} (ms/step):".format(args.like))
        for key, ms in sorted(by_op.items(), key=lambda kv: -kv[1]):
            if args.like.lower() in key[0].lower():
                print(oprow(key, ms))


if __name__ == "__main__":
    main()
