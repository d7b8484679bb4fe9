"""Summarize the 500-kimg flagship trajectory run into evidence tables.

Stitches the stats.jsonl of the original run and the post-crash resume,
prints: sec/kimg distribution (with the host-contention ticks called
out), ADA-p trajectory, loss ranges, the fid10k curve, and the resume
seam (continuity of kimg / losses / ADA-p across the crash boundary).

usage: python scripts/summarize_run500.py <run_dir1> <run_dir2> ...
"""

import json
import os
import sys

import numpy as np


def load(run_dir):
    rows = []
    with open(os.path.join(run_dir, "stats.jsonl")) as f:
        for line in f:
            rows.append(json.loads(line))
    fids = []
    fp = os.path.join(run_dir, "metric-fid10k.jsonl")
    if os.path.exists(fp):
        with open(fp) as f:
            for line in f:
                fids.append(json.loads(line))
    return rows, fids


def main():
    dirs = sys.argv[1:]
    segs = []
    for d in dirs:
        try:
            rows, fids = load(d)
        except FileNotFoundError:
            continue
        if rows:
            segs.append((d, rows, fids))
    # Clip each segment's rows at the successor's start kimg (a resume
    # re-covers the span from its checkpoint; the later run supersedes).
    all_rows, all_fids = [], []
    for i, (d, rows, fids) in enumerate(segs):
        nxt = segs[i + 1][1][0]["Progress/kimg"] if i + 1 < len(segs) else 1e18
        rows = [r for r in rows if r["Progress/kimg"] <= nxt]
        for r in rows:
            r["run"] = d
        all_rows += rows
        all_fids += fids
    all_rows.sort(key=lambda r: r["Progress/kimg"])

    kimg = np.array([r["Progress/kimg"] for r in all_rows])
    spk = np.array([r.get("Timing/sec_per_kimg", np.nan) for r in all_rows])
    p = np.array([r.get("Progress/augment", np.nan) for r in all_rows])
    gl = np.array([r.get("Loss/G/loss", np.nan) for r in all_rows])
    dl = np.array([r.get("Loss/D/loss", np.nan) for r in all_rows])

    print(f"ticks: {len(all_rows)}  kimg {kimg.min():.0f}..{kimg.max():.0f}")
    ok = np.isfinite(spk) & (kimg > 4)
    print(f"sec/kimg: median {np.nanmedian(spk[ok]):.2f}  "
          f"p10 {np.nanpercentile(spk[ok], 10):.2f}  "
          f"p90 {np.nanpercentile(spk[ok], 90):.2f}  "
          f"ticks >8s: {(spk[ok] > 8).sum()}/{ok.sum()}")
    print("\nADA-p trajectory (kimg: p):")
    for t in range(0, int(kimg.max()) + 1, 40):
        i = int(np.argmin(np.abs(kimg - t)))
        print(f"  {kimg[i]:6.1f}: {p[i]:.3f}", end="")
        if (t // 40) % 4 == 3:
            print()
    print()
    print(f"\nG_loss range [{np.nanmin(gl):.2f}, {np.nanmax(gl):.2f}] "
          f"final {gl[-1]:.2f}; D_loss final {dl[-1]:.2f}")
    print(f"all losses finite: {np.isfinite(gl).all() and np.isfinite(dl).all()}")

    if all_fids:
        print("\nfid10k (relative, random-projection detector):")
        for r in all_fids:
            kk = r.get("kimg", "?")
            val = r["results"]["fid10k"]
            print(f"  kimg {kk}: {val:.2f}")

    # resume seam: largest kimg gap between consecutive ticks
    gaps = np.diff(kimg)
    j = int(np.argmax(gaps))
    print(f"\nmax kimg gap between ticks: {gaps[j]:.2f} at kimg {kimg[j]:.1f} "
          f"(tick cadence 4.0 — a larger gap would mark lost work)")
    boundary = [i for i in range(1, len(all_rows))
                if all_rows[i]["run"] != all_rows[i - 1]["run"]]
    for i in boundary:
        a, b = all_rows[i - 1], all_rows[i]
        print(f"resume seam at kimg {b['Progress/kimg']:.1f}: "
              f"Δkimg {b['Progress/kimg'] - a['Progress/kimg']:.2f}, "
              f"G_loss {a.get('Loss/G/loss', float('nan')):.3f} -> "
              f"{b.get('Loss/G/loss', float('nan')):.3f}, "
              f"ADA-p {a.get('Progress/augment', float('nan')):.3f} -> "
              f"{b.get('Progress/augment', float('nan')):.3f}")


if __name__ == "__main__":
    main()
