#!/usr/bin/env python
"""Aggregate TPU op durations from a jax.profiler trace directory.

Parses the .xplane.pb with tensorflow's bundled xplane_pb2 (the
tensorboard_plugin_profile converters in this image are stale — this is
the working path to per-op timings; see .claude/skills/verify).

Two modes:
  * default: raw per-line sums (every event counted — container events
    like the decode while_loop OVERLAP their children, so totals
    double-count; use for a quick look only)
  * --self: nesting-aware SELF-time aggregation over the TensorCore
    "XLA Ops" line — events on that line nest by timestamp containment,
    so self = duration - sum(children). Ops bucket by name with .N /
    .remat suffixes stripped; --steps N divides into ms/step. This is
    what produced the docs/PERF.md serving-step breakdown.

Usage: python tools/parse_xplane.py /tmp/profdir [top_n] [--self]
       [--steps 300]
"""
import argparse
import collections
import re
from pathlib import Path


def load_plane(root: Path):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    pbs = sorted(root.rglob("*.xplane.pb"))
    if not pbs:
        raise SystemExit(f"no .xplane.pb under {root}")
    space = xplane_pb2.XSpace()
    space.ParseFromString(pbs[-1].read_bytes())
    for plane in space.planes:
        if "TPU" in plane.name or "tpu" in plane.name:
            yield plane


def bucket(name: str) -> str:
    name = name.split(" = ")[0].lstrip("%")
    name = re.sub(r"\.remat\d*$", "", name)
    return re.sub(r"\.\d+", "", name)


def self_times(plane):
    """Self-time per op bucket on the 'XLA Ops' line (nesting-aware)."""
    meta = plane.event_metadata
    lines = [l for l in plane.lines if l.name == "XLA Ops"]
    if not lines:
        return None, None
    evs = [(ev.offset_ps, ev.duration_ps, meta[ev.metadata_id].name)
           for ev in lines[0].events]
    evs.sort(key=lambda e: (e[0], -e[1]))
    self_t: collections.Counter = collections.Counter()
    cnt: collections.Counter = collections.Counter()
    stack = []  # (end_ps, name)
    for off, dur, name in evs:
        while stack and off >= stack[-1][0]:
            stack.pop()
        if stack:
            self_t[stack[-1][1]] -= dur   # child time leaves the parent
        self_t[name] += dur
        cnt[name] += 1
        stack.append((off + dur, name))
    bs: collections.Counter = collections.Counter()
    bc: collections.Counter = collections.Counter()
    for n, v in self_t.items():
        bs[bucket(n)] += v
    for n, v in cnt.items():
        bc[bucket(n)] += v
    return bs, bc


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("root", type=Path)
    ap.add_argument("top_n", type=int, nargs="?", default=30)
    ap.add_argument("--self", dest="self_mode", action="store_true",
                    help="nesting-aware self-time aggregation (XLA Ops line)")
    ap.add_argument("--steps", type=int, default=None,
                    help="divide totals into ms/step (e.g. 300 decode steps)")
    args = ap.parse_args()

    for plane in load_plane(args.root):
        if args.self_mode:
            bs, bc = self_times(plane)
            if bs is None:
                continue
            total = sum(bs.values())
            hdr = f"== plane: {plane.name}  self-time total {total/1e9:.1f} ms"
            if args.steps:
                hdr += f"  ({total/1e9/args.steps:.3f} ms/step)"
            print(hdr)
            for n, v in bs.most_common(args.top_n):
                row = f"  {v/1e9:9.1f} ms  x{bc[n]:<7}"
                if args.steps:
                    row += f" {v/1e9/args.steps:8.4f} ms/step "
                print(f"{row} {n[:100]}")
            continue
        ev_meta = plane.event_metadata
        by_name: collections.Counter = collections.Counter()
        counts: collections.Counter = collections.Counter()
        total = 0
        for line in plane.lines:
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                dur = ev.duration_ps / 1e9   # ms
                by_name[name] += dur
                counts[name] += 1
                total += dur
        print(f"== plane: {plane.name}  (sum {total:.1f} ms over all lines; "
              f"container events overlap children — prefer --self)")
        for name, ms in by_name.most_common(args.top_n):
            print(f"  {ms:10.1f} ms  x{counts[name]:<6} {name[:110]}")


if __name__ == "__main__":
    main()
