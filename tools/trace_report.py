"""Summarise a jax.profiler xplane capture: per-op self-time on the TPU
device plane, aggregated by op name. Run with
PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python (the installed plugin protos
predate the fast-proto runtime).

Usage: python tools/trace_report.py /tmp/jax_trace [top_n]
"""
from __future__ import annotations

import collections
import glob
import re
import sys


def main() -> None:
    outdir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 45
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(f"{outdir}/**/*.xplane.pb", recursive=True)
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(sorted(paths)[-1], "rb").read())
    for plane in xs.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        print(f"== plane: {plane.name}")
        ev_meta = plane.event_metadata
        total = collections.Counter()
        count = collections.Counter()
        for line in plane.lines:
            # sync compute ops only: "Async XLA Ops" durations span waits
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                total[name] += ev.duration_ps
                count[name] += 1
        if not total:
            continue
        # collapse instances: aggregate by "<output signature> <op kind>"
        agg = collections.Counter()
        aggn = collections.Counter()
        for name, ps in total.items():
            stripped = re.sub(r"\{[^}]*\}", "", name)
            m = re.match(r"%([a-z_\-]+)[\w.\-]* = (\(?[^(]*\)?)\s*"
                         r"([a-z\-]+)\(", stripped)
            if m:
                base = f"{m.group(3)} {m.group(2).strip()} [{m.group(1)}]"
            else:
                base = re.sub(r"\.?\d+$", "", stripped)[:110]
            agg[base] += ps
            aggn[base] += count[name]
        grand = sum(agg.values())
        print(f"   total device ps: {grand} ({grand / 1e9:.3f} ms)")
        for name, ps in agg.most_common(top_n):
            print(f"   {ps / 1e9 / 3:9.3f} ms/iter  x{aggn[name]:4d}  {name}")


if __name__ == "__main__":
    main()
