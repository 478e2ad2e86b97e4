"""Merge egs/mini_grammar.sh RESULTS.seed* files into one markdown table.

  python tools/summarize_grammar.py /tmp/pika_gsplit

Rows are the recipe's stages; columns one per seed plus mean±spread, so
the stage deltas can be judged against the seed spread (VERDICT r2
item 3's acceptance bar).
"""

from __future__ import annotations

import glob
import re
import sys

STAGES = ["base", "base_fst", "base_fst_pt", "mbr", "mbr_fst", "mbr_fst_pt",
          "mbr_las", "mbr_las_fst", "mbr_fst_pt_las"]


def main():
    work = sys.argv[1]
    seeds = {}
    for path in sorted(glob.glob(f"{work}/RESULTS.seed*")):
        seed = path.rsplit("seed", 1)[1]
        wers = {}
        for line in open(path):
            m = re.match(r"(\w+) %WER ([0-9.]+)", line)
            if m and m.group(1) in STAGES:
                wers[m.group(1)] = float(m.group(2))
        if wers:
            seeds[seed] = wers

    if not seeds:
        raise SystemExit(f"no RESULTS.seed* with stage WERs under {work}")

    cols = sorted(seeds)
    print("| Stage | " + " | ".join(f"seed {s}" for s in cols)
          + " | mean | spread |")
    print("|---" * (len(cols) + 3) + "|")
    for st in STAGES:
        vals = [seeds[s][st] for s in cols if st in seeds[s]]
        cells = [f"{seeds[s][st]:.2f}" if st in seeds[s] else "—" for s in cols]
        if vals:
            mean = sum(vals) / len(vals)
            spread = max(vals) - min(vals)
            print(f"| {st} | " + " | ".join(cells)
                  + f" | {mean:.2f} | {spread:.2f} |")
        else:
            print(f"| {st} | " + " | ".join(cells) + " | — | — |")


if __name__ == "__main__":
    main()
