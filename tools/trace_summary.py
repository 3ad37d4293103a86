"""Summarize a jax.profiler trace: top XLA ops by device time.

The reference has no profiling story (SURVEY.md §5.1); here `bench.py
--profile DIR` and `utils/profiling.py` capture xprof traces, and this tool
turns one into an actionable table without a TensorBoard UI:

    python bench.py --profile /tmp/xprof
    python tools/trace_summary.py /tmp/xprof [--top 25]

Parses the XSpace protos (tensorflow.core.profiler) from
`plugins/profile/<run>/*.xplane.pb`, aggregates device-plane events by op
name, and prints total/self time, occurrences, and share of device time.
"""

import argparse
import collections
import glob
import os
import sys


def find_xplanes(trace_dir: str):
    pats = [
        os.path.join(trace_dir, "**", "*.xplane.pb"),
    ]
    files = []
    for p in pats:
        files.extend(glob.glob(p, recursive=True))
    return sorted(files)


def load_xspace(path: str):
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:  # proto moved around across tf versions
        from tensorflow.core.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def summarize(trace_dir: str, top: int = 25, line_filter: str = None):
    files = find_xplanes(trace_dir)
    if not files:
        print(f"no *.xplane.pb under {trace_dir}", file=sys.stderr)
        return 1

    # op name -> [total_ps, count]
    agg = collections.defaultdict(lambda: [0, 0])
    device_total_ps = 0
    plane_names = []
    for path in files:
        xs = load_xspace(path)
        for plane in xs.planes:
            # device planes: "/device:TPU:0" (real chip) or "/device:CPU:0"
            # XLA op lines; skip host threads plane ("/host:...")
            if not plane.name.startswith("/device:"):
                continue
            plane_names.append(plane.name)
            stats_meta = {k: v.name for k, v in plane.stat_metadata.items()}
            for line in plane.lines:
                lname = line.name or ""
                if line_filter and line_filter not in lname:
                    continue
                # XLA Ops line carries per-op events; "Steps"/"XLA Modules"
                # lines would double-count
                if lname not in ("XLA Ops", "XLA TraceMe", "Ops"):
                    continue
                for ev in line.events:
                    name = plane.event_metadata[ev.metadata_id].name
                    agg[name][0] += ev.duration_ps
                    agg[name][1] += 1
                    device_total_ps += ev.duration_ps

    if not agg:
        print(
            "no device-plane op events found "
            f"(planes seen: {sorted(set(plane_names))})",
            file=sys.stderr,
        )
        return 1

    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
    tot_ms = device_total_ps / 1e9
    print(f"device op time total: {tot_ms:.3f} ms  "
          f"({len(rows)} distinct ops; planes {sorted(set(plane_names))})")
    print(f"{'ms':>9} {'%':>6} {'count':>7}  op")
    for name, (ps, n) in rows[:top]:
        ms = ps / 1e9
        print(f"{ms:9.3f} {100 * ps / device_total_ps:6.2f} {n:7d}  {name[:110]}")
    return 0


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("trace_dir")
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--line", default=None, help="only lines whose name contains this")
    args = p.parse_args()
    sys.exit(summarize(args.trace_dir, args.top, args.line))
