"""Round 5 (VERDICT r4 #8): BASELINE config #4 at full scale WITH
missing phenotypes — 50 traits x 1,048,576 SNPs x 10,240 samples
through the pattern-grouped packed-gather path (the r4 feature), ~10%
missing samples in 3 of 4 missingness patterns.

Pattern structure mirrors real multi-phenotype files (few DISTINCT
patterns, many traits per pattern): traits 0-13 fully observed (ride
the shared cached eigenbasis), and three 12-trait groups each missing
a different ~10% sample subset (each group = one kinship sub-block +
one fresh host eigh + one device column-gather scan off packed HBM).

Writes docs/multitrait_r5.json: wall, tests/s, phase split, and f32
device-vs-f64-oracle parity for one missing-pattern trait on a
2,048-SNP subsample (the x64 <=1e-6 oracle gate for this entry point is
in docs/parity_r5.md).

Usage: timeout 3600 python scripts/multitrait_r5.py
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CACHE = os.path.expanduser("~/.cache/mixmogam_bench")
N = 10_240
M = 1_048_576
T = 50


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from mixmogam_tpu import oracle
    from mixmogam_tpu.models.multitrait import emmax_multi_trait
    from mixmogam_tpu.models.resident import ResidentGenome

    log(f"backend={jax.default_backend()}")
    t0 = time.time()
    np.asarray(jnp.zeros(8))
    log(f"claim: {time.time()-t0:.1f}s")

    G = np.load(os.path.join(CACHE, f"simbig_{N}x{M}.npy"), mmap_mode="r")
    K = np.load(os.path.join(CACHE, f"K_{N}x{M}.npy"))
    with np.load(os.path.join(CACHE, f"eig_{N}x{M}.npz")) as z:
        phi, U = z["phi"], z["U"]

    # ---- 50 traits with h2 ~ 0.5 from memmap causal rows ----
    rng = np.random.default_rng(7)
    Y = np.empty((T, N))
    for t in range(T):
        causal = rng.choice(M, 20, replace=False)
        rows = np.asarray(G[np.sort(causal)], dtype=np.float64)
        beta = rng.normal(size=20) * 0.35
        g = beta @ rows
        Y[t] = g + rng.normal(size=N) * np.std(g)
    # 4 distinct missingness patterns: none + three ~10% subsets
    pat_miss = [rng.choice(N, N // 10, replace=False) for _ in range(3)]
    for gidx, miss in enumerate(pat_miss):
        for t in range(14 + gidx * 12, 14 + (gidx + 1) * 12):
            Y[t, miss] = np.nan
    n_missing = int(np.isnan(Y).sum())
    log(f"traits: {T}, missing values: {n_missing:,} "
        f"({n_missing/Y.size:.1%}), distinct patterns: 4")

    t0 = time.time()
    rg = ResidentGenome.from_source(
        G, cache_path=os.path.join(CACHE, f"packed_{N}x{M}.bin"),
        trust_cache=True)
    t_upload = time.time() - t0
    log(f"packed upload: {t_upload:.1f}s")

    t0 = time.time()
    res = emmax_multi_trait(rg, Y, K=K, eig_k=(phi, U))
    wall = time.time() - t0
    rate = T * M / wall
    log(f"multi-trait 50 x 1M with missing: {wall:.1f}s end-to-end "
        f"= {rate:,.0f} SNP-trait-tests/s/chip")
    assert res["ps"].shape == (T, M)
    finite = np.isfinite(res["ps"]).all()
    log(f"all p finite: {finite}; per-trait min p range "
        f"[{res['ps'].min(axis=1).min():.2e}, "
        f"{res['ps'].min(axis=1).max():.2e}]")

    # ---- parity: one missing-pattern trait, 2,048-SNP subsample,
    # f32 device vs f64 oracle on the observed sample subset ----
    t0 = time.time()
    t_probe = 14                      # first trait of pattern A
    obs = ~np.isnan(Y[t_probe])
    K_sub = K[np.ix_(np.flatnonzero(obs), np.flatnonzero(obs))]
    G_sub = np.asarray(G[:2048], dtype=np.float64)[:, obs]
    orc = oracle.emmax_scan(G_sub, Y[t_probe][obs], K_sub)
    dp = float(np.max(np.abs(res["ps"][t_probe][:2048] - orc["ps"])))
    log(f"device(f32) vs oracle(f64), missing-pattern trait, 2048 SNPs: "
        f"max |dp| = {dp:.2e} ({time.time()-t0:.0f}s)")
    d_delta = abs(float(res["deltas"][t_probe]) - orc["delta"]) \
        / orc["delta"]
    log(f"delta rel err: {d_delta:.2e}")

    out = {
        "config": f"{T} traits x {M} SNPs x {N} samples, "
                  "~10% missing in 3 of 4 patterns",
        "wall_s": round(wall, 1),
        "upload_s": round(t_upload, 1),
        "snp_trait_tests_per_s_chip": round(rate),
        "n_missing_values": n_missing,
        "parity_f32_vs_oracle_max_dp_2048snps": dp,
        "parity_delta_rel_err": d_delta,
    }
    with open(os.path.join(REPO, "docs", "multitrait_r5.json"), "w") as f:
        json.dump(out, f, indent=1)
    log("wrote docs/multitrait_r5.json")
    log(json.dumps(out))


if __name__ == "__main__":
    main()
