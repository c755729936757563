"""Round-3 measurement: BASELINE config #3 (10,240 x 1,048,576)
end-to-end on the DEVICE-RESIDENT 2-bit path (models/resident.py),
plus the device-eigh probe.

Round-2 measured walls to beat (docs/PERFORMANCE.md, streamed):
  kinship 222 s | host eigh 175-260 s | full 1M scan 388 s (int8x3)
  facade emmax(precision='fast') 223 s

Phases (args; default all): upload kinship eigh null scan facade deveigh
Appends to docs/baseline_r3.json. ONE TPU process at a time (CLAUDE.md).
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
CACHE = os.path.expanduser("~/.cache/mixmogam_bench")
OUT = os.path.join(REPO, "docs", "baseline_r3.json")
N, M = 10_240, 1_048_576


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, file=sys.stderr, flush=True)


def record(phase, payload):
    rows = []
    if os.path.exists(OUT):
        with open(OUT) as f:
            rows = json.load(f)
    rows = [r for r in rows if r.get("phase") != phase]
    rows.append({"phase": phase, "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
                 **payload})
    with open(OUT, "w") as f:
        json.dump(rows, f, indent=2, default=float)
    log(f"recorded {phase}: {json.dumps(payload, default=float)}")


def main():
    phases = set(sys.argv[1:]) or {"upload", "kinship", "eigh", "null",
                                   "scan", "facade"}
    from scripts.baseline_configs import big_dataset, claim_device

    import jax
    import jax.numpy as jnp

    from mixmogam_tpu.models.resident import (ResidentGenome,
                                              emmax_resident,
                                              emmax_scan_packed,
                                              kinship_resident)
    from mixmogam_tpu.oracle.kinship import scale_k

    claim_device()
    G, y, causal = big_dataset(N, M)

    # ---- upload: memmap -> 2-bit pack -> ONE device transfer ----
    t0 = time.time()
    rg = ResidentGenome.from_source(
        G, cache_path=os.path.join(CACHE, f"packed_{N}x{M}.bin"))
    t_upload = time.time() - t0
    gb = rg.nbytes_packed / 1e9
    log(f"pack+upload {gb:.2f} GB packed ({M}x{N}): {t_upload:.1f}s "
        f"= {10.7 / t_upload * 1e3:,.0f} MB/s int8-equivalent")
    if "upload" in phases:
        record("resident_upload", {
            "n": N, "M": M, "packed_gb": gb, "upload_s": t_upload,
            "int8_equiv_mb_s": 10.7e3 / t_upload})

    # ---- kinship from HBM ----
    kpath = os.path.join(CACHE, f"K_{N}x{M}.npy")
    if "kinship" in phases:
        t0 = time.time()
        K = scale_k(kinship_resident(rg))
        t_kin = time.time() - t0
        log(f"kinship resident: {t_kin:.1f}s = {M / t_kin:,.0f} SNPs/s")
        extra = {}
        if os.path.exists(kpath):
            extra["max_abs_diff_vs_streamed"] = float(
                np.abs(K - np.load(kpath)).max())
        else:
            np.save(kpath, K)
        record("resident_kinship", {
            "n": N, "M": M, "kinship_s": t_kin,
            "snps_per_s": M / t_kin, **extra})
    else:
        K = np.load(kpath)

    # ---- host eigh (numpy dsyevd after the round-3 switch) ----
    epath = os.path.join(CACHE, f"eig_{N}x{M}.npz")
    if "eigh" in phases or not os.path.exists(epath):
        from mixmogam_tpu.ops.eigen import eigen_k

        t0 = time.time()
        phi, U = eigen_k(K.astype(np.float32), host=True)
        t_eigh = time.time() - t0
        log(f"host eigh (numpy dsyevd) n={N}: {t_eigh:.1f}s")
        np.savez(epath, phi=np.asarray(phi), U=np.asarray(U))
        record("host_eigh_numpy", {"n": N, "eigh_s": t_eigh})
    else:
        with np.load(epath) as z:
            phi, U = z["phi"], z["U"]
        log("eig from cache")
    eig = (np.asarray(phi), np.asarray(U))

    # ---- f32 host eigh (ssyevd; the precision='fast' tier) ----
    if "eigh32" in phases:
        from mixmogam_tpu.ops.eigen import eigen_k

        t0 = time.time()
        phi32, U32 = eigen_k(K.astype(np.float32), host=True,
                             factor_dtype=np.float32)
        t_e32 = time.time() - t0
        log(f"host eigh f32 (ssyevd) n={N}: {t_e32:.1f}s")
        # drift of the null fit vs the f64 decomposition
        from mixmogam_tpu.ops.reml import fit_null_model as _fnm

        d64 = float(_fnm(y.astype(np.float32), np.ones((N, 1), np.float32),
                         eig_k=eig).delta)
        d32 = float(_fnm(y.astype(np.float32), np.ones((N, 1), np.float32),
                         eig_k=(np.asarray(phi32), np.asarray(U32))).delta)
        record("host_eigh_f32", {
            "n": N, "eigh_s": t_e32,
            "delta_f64": d64, "delta_f32": d32,
            "delta_rel_drift": abs(d32 - d64) / max(abs(d64), 1e-30)})
        del phi32, U32

    # ---- null fit: explicit f64 host path (round 3; was a second
    #      projected-spectrum eigh ~200 s) ----
    from mixmogam_tpu.ops.reml import fit_null_model

    if "null" in phases:
        t0 = time.time()
        null = fit_null_model(y.astype(np.float32),
                              np.ones((N, 1), np.float32), eig_k=eig)
        t_null = time.time() - t0
        log(f"explicit null fit: {t_null:.2f}s delta={float(null.delta):.4g} "
            f"h2={float(null.pseudo_heritability):.3f}")
        record("explicit_null_fit", {
            "n": N, "fit_s": t_null, "delta": float(null.delta),
            "h2": float(null.pseudo_heritability)})
    else:
        null = fit_null_model(y.astype(np.float32),
                              np.ones((N, 1), np.float32), eig_k=eig)

    # ---- full-1M scans from HBM ----
    if "scan" in phases:
        from mixmogam_tpu.ops.scan import build_rotated_null

        out = {"n": N, "M": M}
        for tier, rd in [("int8x3", "int8x3"), ("int8x2", "int8x2"),
                         ("bf16", jnp.bfloat16), ("exact", None)]:
            rot = build_rotated_null(null, rotate_dtype=rd)
            t0 = time.time()
            d = emmax_scan_packed(rg.packed, rot, rg.n, rg.tile)
            jax.block_until_ready(d["f_stats"])
            dt = time.time() - t0
            # warm second run (first includes compile)
            t0 = time.time()
            d = emmax_scan_packed(rg.packed, rot, rg.n, rg.tile)
            jax.block_until_ready(d["f_stats"])
            dt2 = time.time() - t0
            out[f"scan_{tier}_s"] = dt2
            out[f"scan_{tier}_cold_s"] = dt
            out[f"scan_{tier}_tests_per_s"] = M / dt2
            log(f"scan {tier} FULL 1M from HBM: {dt2:.2f}s warm "
                f"({dt:.1f}s incl compile) = {M / dt2:,.0f} tests/s/chip")
            del d
        record("resident_scan_1M", out)

    # ---- facade: the one-liner at config #3 ----
    if "facade" in phases:
        from mixmogam_tpu.models.emmax import emmax

        t0 = time.time()
        res = emmax(G, y, eig_k=eig, precision="fast", dtype=np.float32)
        t_fac = time.time() - t0
        top = np.argsort(res["ps"])[:100]
        hits = len(set(top.tolist()) & set(causal.tolist()))
        log(f"facade emmax(precision='fast') incl pack+upload: {t_fac:.1f}s"
            f" tier={res['precision_tier']} causal_top100={hits}/50")
        record("resident_facade_fast", {
            "n": N, "M": M, "wall_s": t_fac,
            "tier": res["precision_tier"],
            "rescored": int(len(res["rescored_idx"])),
            "causal_in_top100": hits, "min_p": float(res["ps"].min())})

    # ---- repeated analysis off the uploaded container: the one-liner
    #      cost AFTER the one-time upload ----
    if "rescan" in phases:
        from mixmogam_tpu.models.emmax import emmax

        t0 = time.time()
        res = emmax(rg, y, eig_k=eig, precision="fast", dtype=np.float32)
        t_re = time.time() - t0
        top = np.argsort(res["ps"])[:100]
        hits = len(set(top.tolist()) & set(causal.tolist()))
        log(f"repeat emmax(precision='fast') on the resident container: "
            f"{t_re:.1f}s end-to-end (tier={res['precision_tier']}, "
            f"{len(res['rescored_idx'])} hits rescored exact, "
            f"causal_top100={hits}/50)")
        record("resident_rescan_fast", {
            "n": N, "M": M, "wall_s": t_re, "tier": res["precision_tier"],
            "causal_in_top100": hits})

    # ---- config #4: 50 traits over the resident container ----
    if "mt50" in phases:
        from mixmogam_tpu.models.multitrait import emmax_multi_trait

        T = 50
        rng = np.random.default_rng(11)
        Y = np.stack([y] + [0.4 * y + rng.normal(size=N)
                            for _ in range(T - 1)])
        t0 = time.time()
        mt = emmax_multi_trait(rg, Y, eig_k=eig, K=K.astype(np.float32),
                               dtype=np.float32)
        dt = time.time() - t0
        log(f"multitrait T={T} FULL {M:,} resident: {dt:.1f}s = "
            f"{T * M / dt:,.0f} trait-tests/s")
        record("resident_multitrait_50", {
            "n": N, "M": M, "T": T, "wall_s": dt,
            "trait_tests_per_s": T * M / dt})

    # ---- config #5: stepwise MLMM over the FULL 1M resident genome
    #      (round 2 capped at 262k by the stored-rotation HBM budget) ----
    if "sw" in phases:
        from mixmogam_tpu.models.stepwise import emmax_step_wise

        t0 = time.time()
        sw = emmax_step_wise(rg, y, eig_k=eig, max_steps=10,
                             dtype=np.float32, rot_budget_bytes=1 << 30)
        dt = time.time() - t0
        nsc = len(sw["steps"])
        cofs = sw["selected"]["mbonf"]["cofactors"]
        hits = len(set(cofs) & set(causal.tolist()))
        log(f"stepwise 10 fwd + backward over FULL {M:,} resident: "
            f"{dt:.1f}s total, {nsc} scans = {dt/nsc:.1f}s/scan; "
            f"mbonf cofactors {len(cofs)} ({hits} causal)")
        record("resident_stepwise_1M", {
            "n": N, "M": M, "wall_s": dt, "scans": nsc,
            "per_scan_s": dt / nsc, "mbonf_cofactors": cofs,
            "cofactors_in_causal": hits})

    # ---- device eigh probe (LAST: remote LAPACK compile can be very
    #      slow; a hang here loses nothing above) ----
    if "deveigh" in phases:
        Kd = jnp.asarray(K.astype(np.float32))
        jax.block_until_ready(Kd)
        t0 = time.time()
        w, v = jnp.linalg.eigh(Kd)
        jax.block_until_ready((w, v))
        t_first = time.time() - t0
        t0 = time.time()
        w, v = jnp.linalg.eigh(Kd)
        jax.block_until_ready((w, v))
        t_run = time.time() - t0
        res4 = float(np.linalg.norm(
            K @ np.asarray(v)[:, -4:].astype(np.float64)
            - np.asarray(v)[:, -4:].astype(np.float64)
            * np.asarray(w)[-4:].astype(np.float64)[None, :]))
        log(f"device eigh f32 n={N}: first {t_first:.1f}s, warm {t_run:.1f}s,"
            f" top-4 residual {res4:.2e}")
        record("device_eigh_f32", {"n": N, "first_s": t_first,
                                   "warm_s": t_run, "residual_top4": res4})


if __name__ == "__main__":
    main()
