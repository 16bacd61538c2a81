#!/usr/bin/env python
"""Aggregate TPU op durations from a jax.profiler trace directory.

Parses the .xplane.pb with tensorflow's bundled xplane_pb2 (the
tensorboard_plugin_profile converters in this image are stale — this is
the working path to per-op timings; see .claude/skills/verify).

Usage: python tools/parse_xplane.py /tmp/profdir [top_n]
"""
import collections
import sys
from pathlib import Path


def main() -> None:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    root = Path(sys.argv[1])
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    pbs = sorted(root.rglob("*.xplane.pb"))
    if not pbs:
        sys.exit(f"no .xplane.pb under {root}")
    space = xplane_pb2.XSpace()
    space.ParseFromString(pbs[-1].read_bytes())

    for plane in space.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        ev_meta = plane.event_metadata
        by_name = collections.Counter()
        counts = collections.Counter()
        total = 0
        for line in plane.lines:
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                dur = ev.duration_ps / 1e9   # ms
                by_name[name] += dur
                counts[name] += 1
                total += dur
        print(f"== plane: {plane.name}  (sum {total:.1f} ms over all lines)")
        for name, ms in by_name.most_common(top_n):
            print(f"  {ms:10.1f} ms  x{counts[name]:<6} {name[:110]}")


if __name__ == "__main__":
    main()
