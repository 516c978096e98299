"""Summarize a jax.profiler xplane trace: per-op device self-time.

Usage: python tools/parse_trace.py /tmp/train_trace [top_n]
Finds the newest *.xplane.pb under the dir, aggregates event durations on
the device plane(s) by event name, prints the top-N with totals. Used for
the BENCH_NOTES per-op breakdowns (works through the axon tunnel).
"""
from __future__ import annotations

import collections
import glob
import os
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def main():
    root = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    paths = sorted(glob.glob(os.path.join(root, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        raise SystemExit(f"no *.xplane.pb under {root}")
    path = paths[-1]
    xspace = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xspace.ParseFromString(f.read())

    for plane in xspace.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        totals = collections.Counter()
        counts = collections.Counter()
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            # XLA Ops / XLA Modules lines carry the per-op events
            if line.name not in ("XLA Ops", "XLA Modules", "Steps") and "XLA Ops" not in line.name:
                continue
            if "Modules" in line.name or line.name == "Steps":
                continue
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                totals[name] += ev.duration_ps / 1e9  # -> ms
                counts[name] += 1
        if not totals:
            continue
        grand = sum(totals.values())
        print(f"== plane: {plane.name}  (total op time {grand:.1f} ms)")
        for name, ms in totals.most_common(top_n):
            print(f"{ms:9.2f} ms  x{counts[name]:<4d} {name[:110]}")


if __name__ == "__main__":
    main()
