"""EMMA-exact vs EMMAX parity report (BASELINE config #2: the
Arabidopsis-scale comparison of the exact per-SNP REML scan against the
EMMAX approximation; reference context SURVEY.md §3.3).

Writes a JSON + markdown report with:
- p-value agreement statistics between EMMA and EMMAX,
- device-vs-oracle parity for both methods on a subsample,
- per-SNP delta dispersion (how far per-SNP variance components stray
  from the null fit — the quantity EMMAX assumes small).

Usage: python scripts/parity_report.py [--samples 1300] [--snps 20000]
       [--out parity_report]
(defaults are a scaled-down config #2 so the report runs in minutes on
the 2-vCPU host; pass --snps 215000 for the full shape).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=1300)
    ap.add_argument("--snps", type=int, default=20000)
    ap.add_argument("--oracle-snps", type=int, default=300,
                    help="subsample size for the O(M n^3) oracle EMMA")
    ap.add_argument("--out", default="parity_report")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    # the 1e-6 oracle gate is defined on the x64 device path; without
    # this, jnp silently downcasts the dtype=float64 arguments to f32
    # and the report measures the f32 envelope instead
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from mixmogam_tpu import oracle
    from mixmogam_tpu.data.simulate import (simulate_genotypes,
                                            simulate_phenotype)
    from mixmogam_tpu.models.emma import emma
    from mixmogam_tpu.models.emmax import emmax
    from mixmogam_tpu.ops import kinship as dk

    n, M = args.samples, args.snps
    print(f"simulating {n} x {M} ...", flush=True)
    G, ch, po = simulate_genotypes(n, M, seed=args.seed)
    y, causal = simulate_phenotype(G, h2=0.5, n_causal=15,
                                   causal_effect=0.6, seed=args.seed)
    K = oracle.scale_k(dk.kinship(G, method="ibs"))

    t0 = time.time()
    ex = emmax(G, y, K=K, dtype=np.float64)
    t_emmax = time.time() - t0
    print(f"emmax: {t_emmax:.1f}s", flush=True)
    t0 = time.time()
    em = emma(G, y, K=K, dtype=np.float64, tile=2048)
    t_emma = time.time() - t0
    print(f"emma exact: {t_emma:.1f}s", flush=True)

    lp_x = -np.log10(np.maximum(ex["ps"], 1e-300))
    lp_m = -np.log10(np.maximum(em["ps"], 1e-300))
    diff = lp_m - lp_x
    corr = float(np.corrcoef(lp_x, lp_m)[0, 1])
    topx = set(np.argsort(ex["ps"])[:100].tolist())
    topm = set(np.argsort(em["ps"])[:100].tolist())

    # oracle parity on a subsample (exact per-SNP eigh oracle)
    rng = np.random.default_rng(1)
    idx = np.sort(rng.choice(M, size=min(args.oracle_snps, M),
                             replace=False))
    print(f"oracle EMMA on {len(idx)} SNPs ...", flush=True)
    t0 = time.time()
    orc = oracle.emma_scan(G[idx].astype(np.float64), y, K)
    t_orc = time.time() - t0
    emma_dev_err = float(np.max(np.abs(orc["ps"] - em["ps"][idx])))
    orx = oracle.emmax_scan(G[idx].astype(np.float64), y, K,
                            with_betas=False)
    emmax_dev_err = float(np.max(np.abs(orx["ps"] - ex["ps"][idx])))

    report = {
        "config": {"n_samples": n, "n_snps": M, "seed": args.seed},
        "timing_s": {"emmax": round(t_emmax, 2),
                     "emma_exact": round(t_emma, 2),
                     "oracle_emma_subsample": round(t_orc, 2),
                     "oracle_subsample_size": len(idx)},
        "emma_vs_emmax": {
            "neg_log10_p_corr": corr,
            "max_abs_neg_log10_diff": float(np.max(np.abs(diff))),
            "mean_abs_neg_log10_diff": float(np.mean(np.abs(diff))),
            "top100_overlap": len(topx & topm),
            "null_delta": ex["delta"],
            "per_snp_delta_quartiles": [
                float(q) for q in np.quantile(
                    em["deltas"][np.isfinite(em["deltas"])],
                    [0.25, 0.5, 0.75])],
        },
        "device_vs_oracle": {
            "emma_max_p_err": emma_dev_err,
            "emmax_max_p_err": emmax_dev_err,
            "gate_1e-6": bool(emma_dev_err < 1e-6
                              and emmax_dev_err < 1e-6),
        },
    }
    with open(args.out + ".json", "w") as f:
        json.dump(report, f, indent=2)
    with open(args.out + ".md", "w") as f:
        f.write("# EMMA exact vs EMMAX parity report\n\n")
        f.write(f"Config: {n} samples x {M} SNPs (BASELINE config #2 "
                "shape)\n\n")
        f.write("| quantity | value |\n|---|---|\n")
        f.write(f"| -log10(p) correlation | {corr:.6f} |\n")
        f.write(f"| max abs -log10(p) diff | "
                f"{report['emma_vs_emmax']['max_abs_neg_log10_diff']:.4f} |\n")
        f.write(f"| top-100 overlap | "
                f"{report['emma_vs_emmax']['top100_overlap']}/100 |\n")
        f.write(f"| EMMAX runtime | {t_emmax:.1f}s |\n")
        f.write(f"| EMMA exact runtime | {t_emma:.1f}s |\n")
        f.write(f"| device-vs-oracle max p err (EMMA) | "
                f"{emma_dev_err:.2e} |\n")
        f.write(f"| device-vs-oracle max p err (EMMAX) | "
                f"{emmax_dev_err:.2e} |\n")
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
