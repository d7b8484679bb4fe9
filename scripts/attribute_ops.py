"""Join an xplane profile with an HLO dump: device ms/step per JAX source op.

Reads /tmp/xprof (from profile_step.py) and /tmp/step_hlo_<v>.txt (from
dump_step_hlo.py), maps every executed HLO op to its ``metadata.op_name``
source attribution, and prints time aggregated by (grouped) op_name —
turning "20 ms of bf16[64] fusions" into "b256/conv1 dgrad: N ms".

usage: python scripts/attribute_ops.py [hlo_variant] [group_depth]
"""
import collections
import glob
import re
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

N_STEPS = 3


def load_opnames(hlo_path):
    names = {}
    pat = re.compile(r"^\s+(%[^ ]+) = .*?op_name=\"([^\"]+)\"")
    for line in open(hlo_path):
        m = pat.match(line)
        if m:
            names[m.group(1)] = m.group(2)
    return names


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "00"
    names = load_opnames(f"/tmp/step_hlo_{variant}.txt")
    per_src = collections.Counter()
    counts = collections.Counter()
    unattributed = collections.Counter()
    for p in glob.glob("/tmp/xprof/**/*.xplane.pb", recursive=True):
        xs = xplane_pb2.XSpace()
        xs.ParseFromString(open(p, "rb").read())
        for plane in xs.planes:
            if "TPU" not in plane.name:
                continue
            evmeta = plane.event_metadata
            for line in plane.lines:
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    full = evmeta[ev.metadata_id].name
                    key = "%" + full.split(" = ")[0].lstrip("%")
                    ms = ev.duration_ps / 1e9
                    src = names.get(key)
                    if src is None:
                        unattributed[key.split(".")[0]] += ms
                        continue
                    # strip jit wrapper; group e.g. transpose(jvp(synthesis))/b256
                    src = src.replace("jit(<unknown>)/", "")
                    per_src[src] += ms
                    counts[src] += 1

    # roll up: phase / layer-block
    block = collections.Counter()
    for src, ms in per_src.items():
        m = re.match(r"((?:transpose\()?jvp\(([^)]*)\)\)?)/((?:[a-z0-9]+)(?:/[a-z0-9_]+)?)", src)
        if m:
            kind = "bwd" if src.startswith("transpose") else "fwd"
            net = m.group(2) or "aug"
            blk = m.group(3).split("/")[0]
            block[f"{net:13s} {kind} {blk}"] += ms
        else:
            block[src[:56]] += ms

    total = sum(per_src.values()) + sum(unattributed.values())
    print(f"== by network/direction/block (ms/step; attributed total "
          f"{sum(per_src.values())/N_STEPS:.1f} + unattributed "
          f"{sum(unattributed.values())/N_STEPS:.1f} = {total/N_STEPS:.1f}) ==")
    for b, ms in block.most_common(40):
        print(f"  {ms/N_STEPS:8.3f} ms  {b}")
    print("\n== top exact source ops ==")
    for src, ms in per_src.most_common(30):
        print(f"  {ms/N_STEPS:8.3f} ms x{counts[src]//N_STEPS:3d}  {src[:110]}")
    print("\n== unattributed (no op_name metadata) ==")
    for k, ms in unattributed.most_common(12):
        print(f"  {ms/N_STEPS:8.3f} ms  {k}")


if __name__ == "__main__":
    main()
