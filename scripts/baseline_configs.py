"""Measure BASELINE configs #2-#5 for REAL on the TPU (VERDICT r1 items
1, 2, 4, 5): replaces every extrapolated north-star number with a
measurement.

  #2  1,344 x 215k   EMMA exact vs EMMAX parity + wall times
  #3  10,240 x 1M    int8 streamed kinship + host eigh(10k) + streamed
                     scan (int8x3 full run w/ checkpoints; exact and
                     int8x2 rates on a 131k slice)
  #4  10,240 x 1M x 50 traits, shared eigenbasis, streamed
  #5  stepwise MLMM, 10 fwd steps + backward, 262k x 10,240, stored
                     device rotation (rotate once, scan many)

Results append incrementally to docs/baseline_r2.json (one JSON object
per phase; a crash in one phase doesn't lose earlier ones). Logs to
stderr. Usage:

  python scripts/baseline_configs.py            # all phases, full scale
  python scripts/baseline_configs.py 3 4        # selected phases
  MM_SCALE=small python scripts/baseline_configs.py   # pipeline check

Run ONE at a time (this image's TPU pool drops concurrent claims)."""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
CACHE = os.path.expanduser("~/.cache/mixmogam_bench")
OUT = os.path.join(REPO, "docs", "baseline_r2.json")
SMALL = os.environ.get("MM_SCALE", "full") == "small"


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, file=sys.stderr, flush=True)


def record(phase: str, payload: dict):
    payload = {"phase": phase, "scale": "small" if SMALL else "full",
               "ts": time.strftime("%Y-%m-%d %H:%M:%S"), **payload}
    rows = []
    if os.path.exists(OUT):
        with open(OUT) as f:
            rows = json.load(f)
    rows = [r for r in rows
            if not (r.get("phase") == phase
                    and r.get("scale") == payload["scale"])]
    rows.append(payload)
    with open(OUT, "w") as f:
        json.dump(rows, f, indent=2, default=float)
    log(f"recorded phase {phase}: {json.dumps(payload, default=float)}")


def claim_device(timeout_s: float = 1500.0) -> float:
    """Pay the TPU pool-claim latency explicitly, with a watchdog."""
    import threading

    import jax
    import jax.numpy as jnp

    t0 = time.time()
    ok = threading.Event()

    def _go():
        np.asarray(jnp.zeros(8))
        ok.set()

    threading.Thread(target=_go, daemon=True).start()
    if not ok.wait(timeout_s):
        raise TimeoutError(f"TPU claim not granted in {timeout_s:.0f}s")
    dt = time.time() - t0
    log(f"device claim: {dt:.1f}s; backend={jax.default_backend()}")
    return dt


def big_dataset(n: int, M: int, seed: int = 7):
    """(G int8 memmap (M, n) fully observed, y) — cached on disk."""
    from mixmogam_tpu.data.simulate import simulate_genotypes

    os.makedirs(CACHE, exist_ok=True)
    gpath = os.path.join(CACHE, f"simbig_{n}x{M}.npy")
    ypath = os.path.join(CACHE, f"simbig_{n}x{M}_y.npz")
    if not (os.path.exists(gpath) and os.path.exists(ypath)):
        t0 = time.time()
        G, ch, po = simulate_genotypes(n, M, seed=seed)
        np.save(gpath, G)
        log(f"simulated {M}x{n}: {time.time()-t0:.0f}s")
        rng = np.random.default_rng(seed + 1)
        causal = np.sort(rng.choice(M, size=50, replace=False))
        beta = rng.normal(size=50)
        fixed = G[causal].astype(np.float64).T @ beta
        # polygenic background from a SNP subsample (full 1M pass is
        # minutes of pure host time; 32k SNPs give the same u)
        sub = np.sort(rng.choice(M, size=min(32768, M), replace=False))
        w = rng.normal(size=len(sub)) / np.sqrt(len(sub))
        u = G[sub].astype(np.float64).T @ w
        u = (u - u.mean()) / (u.std() or 1.0)
        h2 = 0.5
        e = rng.normal(size=n)
        fx = (fixed - fixed.mean()) / (fixed.std() or 1.0)
        y = 0.5 * fx + np.sqrt(h2) * u + np.sqrt(1 - h2) * e
        np.savez(ypath, y=y, causal=causal)
        del G
    G = np.load(gpath, mmap_mode="r")
    with np.load(ypath) as z:
        y, causal = z["y"], z["causal"]
    return G, y, causal


# ---------------------------------------------------------------------------


def phase2():
    """Config #2: EMMA exact vs EMMAX parity at reference scale."""
    from mixmogam_tpu.data.simulate import simulate_genotypes, simulate_phenotype
    from mixmogam_tpu.models import emmax
    from mixmogam_tpu.models.emma import emma
    from mixmogam_tpu.ops.kinship import kinship
    from mixmogam_tpu.oracle.kinship import scale_k

    n, M = (256, 8192) if SMALL else (1344, 215_040)
    cache = os.path.join(CACHE, f"sim_{n}x{M}.npz")
    if os.path.exists(cache):
        with np.load(cache) as z:
            G, y = z["G"], z["y"]
    else:
        G, _, _ = simulate_genotypes(n, M, seed=3)
        y, _ = simulate_phenotype(G, h2=0.6, n_causal=8, seed=3)
        os.makedirs(CACHE, exist_ok=True)
        np.savez(cache, G=G, y=y)
    t0 = time.time()
    K = scale_k(kinship(G, method="ibs"))
    t_kin = time.time() - t0

    t0 = time.time()
    ex = emmax(G, y, K=K.astype(np.float32), dtype=np.float32, stream=False)
    t_emmax = time.time() - t0
    log(f"#2 emmax: {t_emmax:.1f}s ({M/t_emmax:,.0f} tests/s)")

    t0 = time.time()
    em = emma(G, y, K=K.astype(np.float32), dtype=np.float32)
    t_emma = time.time() - t0
    log(f"#2 emma exact: {t_emma:.1f}s ({M/t_emma:,.0f} tests/s)")

    lx = -np.log10(np.maximum(ex["ps"], 1e-300))
    lm = -np.log10(np.maximum(em["ps"], 1e-300))
    corr = float(np.corrcoef(lx, lm)[0, 1])
    k = 100
    tx = set(np.argsort(ex["ps"])[:k].tolist())
    tm = set(np.argsort(em["ps"])[:k].tolist())
    dp = np.abs(lx - lm)
    record("config2_emma_vs_emmax", {
        "n": n, "M": M, "kinship_s": t_kin,
        "emmax_s": t_emmax, "emmax_tests_per_s": M / t_emmax,
        "emma_s": t_emma, "emma_tests_per_s": M / t_emma,
        "neglogp_corr": corr, "top100_overlap": len(tx & tm),
        "dlogp_quantiles": {str(q): float(np.quantile(dp, q))
                            for q in (0.5, 0.9, 0.99, 1.0)},
        "delta_null_emmax": ex["delta"],
    })


def phase3():
    """Config #3: 10k x 1M kinship + eigh + streamed scan."""
    import jax

    from mixmogam_tpu.models.streaming import emmax_streamed
    from mixmogam_tpu.ops.eigen import eigen_k
    from mixmogam_tpu.ops.kinship import kinship
    from mixmogam_tpu.oracle.kinship import scale_k

    n, M = (1024, 65_536) if SMALL else (10_240, 1_048_576)
    G, y, causal = big_dataset(n, M)
    out = {"n": n, "M": M}

    # kinship: integer-exact int8 MXU path, streamed from the memmap
    kpath = os.path.join(CACHE, f"K_{n}x{M}.npy")
    t0 = time.time()
    if os.path.exists(kpath):
        K = np.load(kpath)
        out["kinship_s"] = None
        log("#3 kinship loaded from cache")
    else:
        K = scale_k(kinship(G, method="ibs", chunk=32_768))
        out["kinship_s"] = time.time() - t0
        out["kinship_snps_per_s"] = M / out["kinship_s"]
        np.save(kpath, K)
        log(f"#3 kinship: {out['kinship_s']:.0f}s "
            f"= {out['kinship_snps_per_s']:,.0f} SNPs/s")

    # host eigh at n=10k — the unmeasured BASELINE metric
    t0 = time.time()
    phi, U = eigen_k(K.astype(np.float32), host=True)
    out["eigh_host_s"] = time.time() - t0
    log(f"#3 host eigh n={n}: {out['eigh_host_s']:.0f}s")
    eig = (phi, U)

    # full streamed scan, int8x3 (fp32-grade), checkpointed
    ck = os.path.join(CACHE, f"ck_{n}x{M}")
    t0 = time.time()
    st = emmax_streamed(G, y, eig_k=eig, tile=32_768, inflight=4,
                        checkpoint_dir=ck, dtype=np.float32,
                        rotate_in_bf16="int8x3")
    out["scan_int8x3_s"] = time.time() - t0
    out["scan_int8x3_tests_per_s"] = M / out["scan_int8x3_s"]
    out["delta"] = st["delta"]
    out["h2"] = st["pseudo_heritability"]
    top = np.argsort(st["ps"])[:100]
    out["causal_in_top100"] = int(len(set(top.tolist())
                                      & set(causal.tolist())))
    out["min_p"] = float(st["ps"].min())
    log(f"#3 scan int8x3 FULL: {out['scan_int8x3_s']:.0f}s = "
        f"{out['scan_int8x3_tests_per_s']:,.0f} tests/s/chip; "
        f"causal in top100: {out['causal_in_top100']}/50")

    # tier rates on a slice (exact fp32 and int8x2)
    Ms = min(131_072, M)
    for tier, key in ((False, "exact"), ("int8x2", "int8x2")):
        t0 = time.time()
        emmax_streamed(G[:Ms], y, eig_k=eig, tile=32_768, inflight=4,
                       dtype=np.float32, rotate_in_bf16=tier)
        dt = time.time() - t0
        out[f"scan_{key}_slice_s"] = dt
        out[f"scan_{key}_tests_per_s"] = Ms / dt
        log(f"#3 scan {key} slice {Ms}: {dt:.0f}s = {Ms/dt:,.0f} tests/s")
    record("config3_10k_x_1M", out)
    return K, eig


def phase3b():
    """Config #3 rerun with the round-2 transport stack: 2-bit packed
    tiles + prefetch-threaded host prep (before/after vs phase3)."""
    from mixmogam_tpu.models.streaming import emmax_streamed
    from mixmogam_tpu.ops.eigen import eigen_k
    from mixmogam_tpu.ops.kinship import kinship
    from mixmogam_tpu.oracle.kinship import scale_k

    n, M = (1024, 65_536) if SMALL else (10_240, 1_048_576)
    G, y, causal = big_dataset(n, M)
    out = {"n": n, "M": M}
    t0 = time.time()
    K = scale_k(kinship(G, method="ibs", chunk=32_768, pack_transfer=True))
    out["kinship_packed_s"] = time.time() - t0
    out["kinship_packed_snps_per_s"] = M / out["kinship_packed_s"]
    log(f"#3b kinship (2-bit transport): {out['kinship_packed_s']:.0f}s "
        f"= {out['kinship_packed_snps_per_s']:,.0f} SNPs/s")
    kpath = os.path.join(CACHE, f"K_{n}x{M}.npy")
    if os.path.exists(kpath):
        Kref = np.load(kpath)
        out["kinship_max_abs_diff_vs_phase3"] = float(
            np.abs(K - Kref).max())
    phi, U = eigen_k(K.astype(np.float32), host=True)
    ck = os.path.join(CACHE, f"ck2_{n}x{M}")
    for tier, key in (("int8x3", "int8x3"), ("int8x2", "int8x2")):
        t0 = time.time()
        st = emmax_streamed(G, y, eig_k=(phi, U), tile=32_768, inflight=4,
                            checkpoint_dir=(ck if tier == "int8x3"
                                            else None),
                            dtype=np.float32, rotate_in_bf16=tier,
                            rescore_top=(1024 if tier == "int8x2" else 0),
                            pack_transfer=True)
        dt = time.time() - t0
        out[f"scan_{key}_packed_s"] = dt
        out[f"scan_{key}_packed_tests_per_s"] = M / dt
        log(f"#3b scan {tier} (packed+prefetch) FULL: {dt:.0f}s = "
            f"{M/dt:,.0f} tests/s/chip"
            + (f"; rescored {len(st['rescored_idx'])} top hits exact"
               if tier == "int8x2" else ""))
        top = np.argsort(st["ps"])[:100]
        out[f"causal_in_top100_{key}"] = int(
            len(set(top.tolist()) & set(causal.tolist())))
    record("config3b_packed_transport", out)


def phase4(K=None, eig=None):
    """Config #4: 50 traits x 1M x 10k, shared eigenbasis, streamed."""
    from mixmogam_tpu.models.multitrait import emmax_multi_trait
    from mixmogam_tpu.ops.eigen import eigen_k

    n, M = (1024, 65_536) if SMALL else (10_240, 1_048_576)
    T = 10 if SMALL else 50
    G, y, causal = big_dataset(n, M)
    if K is None:
        K = np.load(os.path.join(CACHE, f"K_{n}x{M}.npy"))
    if eig is None:
        eig = eigen_k(K.astype(np.float32), host=True)
    rng = np.random.default_rng(11)
    Y = np.stack([y] + [
        0.4 * y + rng.normal(size=n) for _ in range(T - 1)])
    t0 = time.time()
    mt = emmax_multi_trait(G, Y, K=K.astype(np.float32), eig_k=eig,
                           dtype=np.float32, stream_budget_bytes=1 << 30)
    dt = time.time() - t0
    record("config4_multitrait", {
        "n": n, "M": M, "T": T, "wall_s": dt,
        "trait_tests_per_s": T * M / dt,
        "snp_rate_vs_single_scan": M / dt,
        "deltas_q": {str(q): float(np.quantile(mt["deltas"], q))
                     for q in (0.0, 0.5, 1.0)},
    })
    log(f"#4 multitrait T={T}: {dt:.0f}s = {T*M/dt:,.0f} trait-tests/s")


def phase5():
    """Config #5: stepwise MLMM, 10 steps, 262k x 10k, stored rotation."""
    from mixmogam_tpu.models.stepwise import emmax_step_wise
    from mixmogam_tpu.ops.eigen import eigen_k

    nfull, Mfull = (1024, 65_536) if SMALL else (10_240, 1_048_576)
    M5 = min(262_144, Mfull)
    G, y, causal = big_dataset(nfull, Mfull)
    K = np.load(os.path.join(CACHE, f"K_{nfull}x{Mfull}.npy"))
    eig = eigen_k(K.astype(np.float32), host=True)
    t0 = time.time()
    sw = emmax_step_wise(G[:M5], y, eig_k=eig, max_steps=10,
                         dtype=np.float32, tile=32_768,
                         rot_budget_bytes=12 << 30)
    dt = time.time() - t0
    fwd = [s for s in sw["steps"] if s["phase"] == "forward"
           and np.isfinite(s.get("min_p", np.nan))]
    record("config5_stepwise", {
        "n": nfull, "M": M5, "steps_forward": len(fwd),
        "total_steps_recorded": len(sw["steps"]), "wall_s": dt,
        "per_scan_s": dt / max(len(sw["steps"]), 1),
        "selected_mbonf_cofactors":
            sw["selected"]["mbonf"]["cofactors"],
        "cofactors_in_causal": int(len(
            set(sw["selected"]["mbonf"]["cofactors"])
            & set(causal[causal < M5].tolist()))),
        "h2_trace": [s["pseudo_heritability"] for s in sw["steps"]][:12],
    })
    log(f"#5 stepwise: {dt:.0f}s total, {len(sw['steps'])} scans")


def main():
    phases = [a for a in sys.argv[1:] if a in ("2", "3", "3b", "4", "5")] \
        or ["2", "3", "4", "5"]
    claim_device()
    K = eig = None
    for p in phases:
        t0 = time.time()
        try:
            if p == "2":
                phase2()
            elif p == "3":
                K, eig = phase3()
            elif p == "3b":
                phase3b()
            elif p == "4":
                phase4(K, eig)
            elif p == "5":
                phase5()
        except Exception as exc:  # record the failure, keep going
            import traceback

            traceback.print_exc()
            record(f"config{p}_FAILED", {"error": repr(exc),
                                         "after_s": time.time() - t0})


if __name__ == "__main__":
    main()
