"""Parse /tmp/xprof xplane.pb: per-line totals + categorized op breakdown.

``python parse_xplane.py events [N]`` instead prints the top-N individual
ops with their FULL HLO names (%fusion.123 ids) so they can be looked up
in an ``--xla_dump_to`` HLO text dump for source attribution.
"""
import collections
import glob
import re
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

N_STEPS = 3


def categorize(name: str) -> str:
    if name.startswith("%copy-start") or name.startswith("%copy-done"):
        m = re.search(r"copy-(start|done)[^=]*= \(?([a-z0-9]+\[[^\]]*\])", name)
        return f"copy {m.group(2) if m else '?'}"
    if "custom-call" in name:
        m = re.search(r"= ([a-z0-9]+\[[^\]]*\])", name)
        return f"custom-call(pallas) {m.group(1) if m else ''}"
    if "convolution" in name:
        m = re.search(r"= ([a-z0-9]+\[[^\]]*\])", name)
        return f"conv {m.group(1) if m else ''}"
    if "fusion" in name:
        m = re.search(r"= \(?([a-z0-9]+\[[^\]]*\])", name)
        return f"fusion {m.group(1) if m else ''}"
    if "all-reduce" in name or "all-gather" in name:
        return "collective"
    return name.split(" ")[0][:60]


def main_events(top_n: int = 60):
    """Aggregate per-op (full HLO name) device time; print the top entries.

    The leading ``%name.123 = ...`` token is the key to find the fusion
    body (and its ``metadata.op_name`` JAX source attribution) in an
    ``--xla_dump_to`` text dump.
    """
    paths = glob.glob("/tmp/xprof/**/*.xplane.pb", recursive=True)
    for p in paths:
        xs = xplane_pb2.XSpace()
        xs.ParseFromString(open(p, "rb").read())
        for plane in xs.planes:
            if "TPU" not in plane.name:
                continue
            evmeta = plane.event_metadata
            for line in plane.lines:
                if "Ops" not in line.name:
                    continue
                per_op = collections.Counter()
                counts = collections.Counter()
                for ev in line.events:
                    name = evmeta[ev.metadata_id].name
                    key = name.split(" = ")[0]
                    shape = ""
                    if " = " in name:
                        m = re.match(r"\(?([a-z0-9]+\[[^\]]*\])", name.split(" = ", 1)[1])
                        shape = m.group(1) if m else ""
                    per_op[(key, shape)] += ev.duration_ps / 1e9
                    counts[(key, shape)] += 1
                total = sum(per_op.values())
                print(f"== line '{line.name}': top {top_n} ops "
                      f"(ms/step over {N_STEPS}; total {total/N_STEPS:.1f}) ==")
                for (key, shape), ms in per_op.most_common(top_n):
                    print(f"  {ms/N_STEPS:8.3f} ms x{counts[(key, shape)]:3d}  "
                          f"{key:<40} {shape}")


def main():
    paths = glob.glob("/tmp/xprof/**/*.xplane.pb", recursive=True)
    for p in paths:
        xs = xplane_pb2.XSpace()
        xs.ParseFromString(open(p, "rb").read())
        for plane in xs.planes:
            print(f"PLANE: {plane.name}")
            evmeta = plane.event_metadata
            for line in plane.lines:
                tot = sum(ev.duration_ps for ev in line.events) / 1e9
                print(f"  line '{line.name}': {len(line.events)} events, {tot:.1f} ms total")
            if "TPU" not in plane.name:
                continue
            for line in plane.lines:
                if "XLA Ops" not in line.name and "Ops" not in line.name:
                    continue
                cats = collections.Counter()
                counts = collections.Counter()
                for ev in line.events:
                    name = evmeta[ev.metadata_id].name
                    c = categorize(name)
                    cats[c] += ev.duration_ps / 1e9
                    counts[c] += 1
                total = sum(cats.values())
                print(f"\n  == line '{line.name}' categorized (ms/step over {N_STEPS}) ==")
                for c, ms in cats.most_common(40):
                    print(f"  {ms/N_STEPS:9.3f} ms {ms/total*100:5.1f}% x{counts[c]:4d}  {c[:110]}")
                print(f"  LINE TOTAL {total/N_STEPS:.1f} ms/step")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "events":
        main_events(int(sys.argv[2]) if len(sys.argv) > 2 else 60)
    else:
        main()
