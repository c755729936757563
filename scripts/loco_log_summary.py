"""Summarize emmax_loco per-chromosome pipeline logs into a
baseline_r4.json record (salvage path for a run that exceeded its
session budget: every completed chromosome is still a measurement).

Usage: python scripts/loco_log_summary.py <logfile> [phase_name]
"""

import json
import os
import re
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    path = sys.argv[1]
    phase = sys.argv[2] if len(sys.argv) > 2 else \
        "loco_resident_1M_22chrom_partial"
    text = open(path).read()
    prep = [(float(a), float(b)) for a, b in re.findall(
        r"loco prep \[\d+,\d+\): gram\+fetch ([\d.]+)s, "
        r"algebra\+eigh ([\d.]+)s", text)]
    chrom = [(float(a), float(b)) for a, b in re.findall(
        r"loco chrom \d+: waited-on-eigh ([\d.]+)s, "
        r"fit\+scan ([\d.]+)s", text)]
    if not chrom:
        print("no per-chromosome records in", path)
        return 1
    walls = [a + b for a, b in chrom]
    rec = {
        "phase": phase, "ts": "",
        "n": 10240, "M": 1048576,
        "chromosomes_completed": len(chrom),
        "per_chrom_wall_s": [round(w, 1) for w in walls],
        "per_chrom_median_s": round(float(np.median(walls)), 1),
        "per_chrom_p10_p90_s": [round(float(np.percentile(walls, q)), 1)
                                for q in (10, 90)],
        "gram_fetch_median_s": round(float(np.median(
            [a for a, _ in prep])), 1) if prep else None,
        "algebra_eigh_median_s": round(float(np.median(
            [b for _, b in prep])), 1) if prep else None,
        "note": "per-chromosome walls measured on the live pipeline; "
                "the 22-chromosome wall is startup + the sum of these "
                "(linearity: one fixed-n eigh per chromosome)",
    }
    import time

    rec["ts"] = time.strftime("%F %T")
    p = os.path.join(REPO, "docs", "baseline_r4.json")
    d = json.load(open(p)) if os.path.exists(p) else []
    d.append(rec)
    json.dump(d, open(p, "w"), indent=2)
    print(json.dumps(rec, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
