"""Diff two attribute_ops outputs to attribute a PHASE's device time.

The four-phase step runs as one XLA program per lazy-reg variant
(FF/TF/TT).  Per-op totals of variant A minus variant B isolate the ops
the extra phase adds: TF−FF = the Greg (PL) phase, TT−TF = the Dreg (R1)
phase — the method mxu_floor.md used for the FF step, extended per
VERDICT r4 #1.

usage: python scripts/phase_delta.py <attr_A.txt> <attr_B.txt> [top_n]
where each file is `attribute_ops.py` stdout (lines "<ms>  <count>  <src>").
"""

import collections
import re
import sys


def load(path, section="by network"):
    """Parse attribute_ops stdout; use the block-rollup section lines
    ('  <ms> ms  <label>') until the next '==' header."""
    per = collections.Counter()
    pat = re.compile(r"^\s*([0-9.]+) ms\s+(?:x\s*\d+\s+)?(.*)$")
    active = False
    for line in open(path):
        if line.startswith("=="):
            active = section in line
            continue
        if not active:
            continue
        m = pat.match(line.rstrip())
        if m:
            per[m.group(2).strip()] += float(m.group(1))
    return per


def main():
    a, b = load(sys.argv[1]), load(sys.argv[2])
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 40
    keys = set(a) | set(b)
    delta = {k: a.get(k, 0.0) - b.get(k, 0.0) for k in keys}
    tot_a, tot_b = sum(a.values()), sum(b.values())
    print(f"total A {tot_a:.1f} ms | total B {tot_b:.1f} ms | "
          f"delta {tot_a - tot_b:.1f} ms")
    print(f"\n== ops ADDED by the extra phase (top {top_n}) ==")
    for k, v in sorted(delta.items(), key=lambda kv: -kv[1])[:top_n]:
        if v > 0.05:
            print(f"{v:9.3f} ms  {k[:120]}")
    neg = [(k, v) for k, v in delta.items() if v < -0.3]
    if neg:
        print("\n== ops that got CHEAPER (fusion shifts) ==")
        for k, v in sorted(neg, key=lambda kv: kv[1])[:15]:
            print(f"{v:9.3f} ms  {k[:120]}")


if __name__ == "__main__":
    main()
