"""Parse /tmp/xprof xplane.pb: per-line totals + categorized op breakdown."""
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
    main()
