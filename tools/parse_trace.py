"""Summarize a jax.profiler xplane trace: per-op device self-time.

Usage: python tools/parse_trace.py /tmp/train_trace [top_n]
Finds the newest *.xplane.pb under the dir, aggregates event durations on
the device plane(s) by event name, prints the top-N with totals. Used for
the BENCH_NOTES per-op breakdowns (works through the axon tunnel).

Only the SYNC "XLA Ops" line is aggregated per-op: events on the
"Async XLA Ops" line (copy-start/copy-done pairs, e.g. host-offload
traffic) have durations that span until completion, so they overlap each
other and compute — summing them wildly overstates cost (a B=64 train
step showed 3.3 s/iter of async spans inside a 441 ms/iter wall). The
async line is reported as one summary row instead; device busy fraction =
sync total / wall is the number to reason with.
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
        async_total = 0.0
        async_count = 0
        span = 0.0
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if line.name == "Async XLA Ops":
                async_total += sum(ev.duration_ps for ev in line.events) / 1e9
                async_count += len(line.events)
                continue
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                totals[name] += ev.duration_ps / 1e9  # -> ms
                counts[name] += 1
            if line.events:
                t0 = min(ev.offset_ps for ev in line.events)
                t1 = max(ev.offset_ps + ev.duration_ps for ev in line.events)
                span = (t1 - t0) / 1e9
        if not totals:
            continue
        grand = sum(totals.values())
        print(f"== plane: {plane.name}  (sync op time {grand:.1f} ms over a "
              f"{span:.1f} ms span -> {100 * grand / span if span else 0:.0f}% busy; "
              f"async spans {async_total:.1f} ms x{async_count}, overlapped)")
        for name, ms in totals.most_common(top_n):
            print(f"{ms:9.2f} ms  x{counts[name]:<4d} {name[:110]}")


if __name__ == "__main__":
    main()
