"""Parse an xplane profile dir: aggregate device op time by category.

Usage: python scripts/profile_parse.py <logdir> [iters] [--async]

By default async ``*-start`` events (copy-start/slice-start/...) are
EXCLUDED: their durations span the full async window including overlap
with compute, so summing them wildly over-counts (a [96]-element weight
prefetch can show a 12 ms span on a 79 ms step). Pass --async to see
them. Recipe notes in PERF_NOTES.md; works through the axon tunnel.
"""
import glob, os, sys
from collections import defaultdict
from tensorflow.tsl.profiler.protobuf import xplane_pb2

logdir = sys.argv[1]
iters = int(sys.argv[2]) if len(sys.argv) > 2 and sys.argv[2].isdigit() else 1
keep_async = "--async" in sys.argv
pbs = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
xs = xplane_pb2.XSpace()
xs.ParseFromString(open(pbs[0], "rb").read())
cat = defaultdict(float)
ops = defaultdict(float)
total = 0.0
for plane in xs.planes:
    if "TPU" not in plane.name and "Device" not in plane.name:
        continue
    ev_names = {i: m.name for i, m in plane.event_metadata.items()}
    for line in plane.lines:
        if "XLA Ops" not in line.name and "Ops" != line.name.strip():
            continue
        for ev in line.events:
            name = ev_names.get(ev.metadata_id, "?")
            if not keep_async and "-start" in name.split(" ")[0]:
                continue
            dur = ev.duration_ps / 1e9  # ms
            total += dur
            ops[name] += dur
            base = name.split(".")[0].split("-")[0].rstrip("0123456789")
            cat[base] += dur
print(f"device op time: {total:.2f} ms -> {total/iters:.2f} ms/iter")
print("\n== by category (ms/iter) ==")
for k, v in sorted(cat.items(), key=lambda kv: -kv[1])[:18]:
    print(f"{v/iters:8.2f}  {k[:90]}")
print("\n== top ops (ms/iter) ==")
for k, v in sorted(ops.items(), key=lambda kv: -kv[1])[:30]:
    print(f"{v/iters:8.3f}  {k[:110]}")
