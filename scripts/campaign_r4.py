"""Round-4 campaign measurements at BASELINE config #3 (1,048,576 SNPs
x 10,240 samples) off the device-resident container — VERDICT r3 items
#1 (anova/KW resident walls), #4 (22-chromosome LOCO with pipelined f32
eighs), #5 (EMMA exact + permutation >=100 perms, no extrapolation).

ONE TPU process (CLAUDE.md: never run two); each phase appends its
record to docs/baseline_r4.json immediately so partial results survive.
Caches: ~/.cache/mixmogam_bench (packed rows, y, K, eig) — prewarmed by
bench.py runs on this machine.

Usage: python scripts/campaign_r4.py [phase ...]
  phases: anova kw perm emma loco   (default: all, in that order)
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
CACHE = os.path.expanduser("~/.cache/mixmogam_bench")
N, M = 10240, 1048576
N_CHROM = 22


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def record(rec):
    p = os.path.join(REPO, "docs", "baseline_r4.json")
    d = json.load(open(p)) if os.path.exists(p) else []
    d.append(rec)
    json.dump(d, open(p, "w"), indent=2)
    log("RECORDED", json.dumps(rec))


def chrom_blocks(n_chrom=N_CHROM):
    """Contiguous chromosome blocks over the simulated campaign genome
    (block sizes uneven, human-like ratios)."""
    w = np.linspace(1.6, 0.45, n_chrom)
    sizes = np.floor(w / w.sum() * M).astype(np.int64)
    sizes[-1] += M - sizes.sum()
    return np.repeat(np.arange(1, n_chrom + 1), sizes)


def main():
    import logging

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(message)s")
    phases = sys.argv[1:] or ["anova", "kw", "perm", "emma", "loco"]
    import threading

    import jax
    import jax.numpy as jnp

    log(f"backend={jax.default_backend()}")
    t0 = time.time()
    claimed = threading.Event()
    threading.Thread(target=lambda: (np.asarray(jnp.zeros(8)),
                                     claimed.set()), daemon=True).start()
    budget = float(os.environ.get("MIXMOGAM_BENCH_CLAIM_TIMEOUT", 1500))
    if not claimed.wait(budget):
        log("TPU claim timed out; aborting")
        return 1
    log(f"claim+dial: {time.time()-t0:.1f}s")

    from mixmogam_tpu.models.resident import ResidentGenome

    with np.load(os.path.join(CACHE, f"simbig_{N}x{M}_y.npz")) as z:
        y = z["y"]
    t0 = time.time()
    rg = ResidentGenome.from_source(
        None, cache_path=os.path.join(CACHE, f"packed_{N}x{M}.bin"))
    log(f"packed upload: {time.time()-t0:.1f}s  has_missing="
        f"{rg.has_missing} ploidy={rg.ploidy}")
    K = np.load(os.path.join(CACHE, f"K_{N}x{M}.npy"))
    with np.load(os.path.join(CACHE, f"eig_{N}x{M}.npz")) as z:
        phi, U = z["phi"], z["U"]

    if "anova" in phases:
        from mixmogam_tpu.models.linear import anova

        t0 = time.time()
        a = anova(rg, y)
        cold = time.time() - t0
        t0 = time.time()
        a = anova(rg, y)
        warm = time.time() - t0
        record({"phase": "anova_resident_1M", "ts": time.strftime("%F %T"),
                "n": N, "M": M, "cold_s": round(cold, 2),
                "warm_s": round(warm, 2),
                "tests_per_s": round(M / warm),
                "min_p": float(np.min(a["ps"])),
                "n_valid": int((a["ps"] < 1.0).sum())})

    if "kw" in phases:
        from mixmogam_tpu.models.linear import kruskal_wallis

        t0 = time.time()
        k = kruskal_wallis(rg, y)
        cold = time.time() - t0
        t0 = time.time()
        k = kruskal_wallis(rg, y)
        warm = time.time() - t0
        record({"phase": "kw_resident_1M", "ts": time.strftime("%F %T"),
                "n": N, "M": M, "cold_s": round(cold, 2),
                "warm_s": round(warm, 2),
                "tests_per_s": round(M / warm),
                "min_p": float(np.min(k["ps"]))})

    if "perm" in phases:
        from mixmogam_tpu.models.permutation import emmax_perm_test

        n_perm = 128
        t0 = time.time()
        pr = emmax_perm_test(rg, y, K=K, num_perm=n_perm, seed=1,
                             eig_k=(phi, U))
        wall = time.time() - t0
        record({"phase": "perm_resident_1M", "ts": time.strftime("%F %T"),
                "n": N, "M": M, "num_perm": n_perm,
                "wall_s": round(wall, 1),
                "perm_scans_per_s": round(n_perm * M / wall),
                "threshold_p": float(pr["threshold"]),
                "min_p_quantiles": [float(q) for q in np.quantile(
                    pr["min_ps"], [0.05, 0.5, 0.95])]})

    if "emma" in phases:
        from mixmogam_tpu.models.emma import emma

        t0 = time.time()
        em = emma(rg, y, K=K, eig_k=(phi, U))
        wall = time.time() - t0
        record({"phase": "emma_exact_resident_1M",
                "ts": time.strftime("%F %T"), "n": N, "M": M,
                "wall_s": round(wall, 1),
                "tests_per_s": round(M / wall),
                "min_p": float(np.min(em["ps"])),
                "delta_spread": [float(np.quantile(em["deltas"], q))
                                 for q in (0.05, 0.5, 0.95)]})

    if "loco" in phases:
        from mixmogam_tpu.models.loco import emmax_loco, loco_kinships

        ch = chrom_blocks()
        t0 = time.time()
        kin = loco_kinships(rg, ch, method="ibs",
                            K_total=None)  # fused resident grams
        t_kin = time.time() - t0
        log(f"22 LOCO kinships (device grams + host algebra): "
            f"{t_kin:.1f}s")
        t0 = time.time()
        res = emmax_loco(rg, y, chromosomes=ch, kinships=kin,
                         precision="fast")
        t_scan = time.time() - t0
        wall = t_kin + t_scan
        deltas = [round(v["delta"], 4) for v in res["loco"].values()]
        record({"phase": "loco_resident_1M_22chrom",
                "ts": time.strftime("%F %T"), "n": N, "M": M,
                "n_chrom": N_CHROM, "kinships_s": round(t_kin, 1),
                "fit_scan_s": round(t_scan, 1),
                "total_s": round(wall, 1),
                "s_per_chrom": round(t_scan / N_CHROM, 1),
                "precision": "fast (f32 ssyevd eigh, int8x2+rescore "
                             "scan, eigh pipelined depth-1)",
                "min_p": float(np.min(res["ps"])),
                "delta_range": [min(deltas), max(deltas)]})

    lazy = [ph for ph in phases if ph.startswith("loco_lazy")]
    if lazy:
        # round-4 follow-up: kinships=None on a resident source builds
        # each K_loco lazily in the eigh worker — gram D2H + algebra +
        # eigh ALL overlap the scans (expect ~ the per-chrom eigh bill
        # alone). "loco_lazyK" measures K chromosomes over the FULL
        # genome: the pipeline is linear in chromosomes (each pays one
        # eigh at the SAME n), so the 22-chromosome wall is startup +
        # 22 x the measured steady-state per-chromosome time.
        from mixmogam_tpu.models.loco import emmax_loco

        n_chrom = int(lazy[0][len("loco_lazy"):] or N_CHROM)
        ch = chrom_blocks(n_chrom)
        t0 = time.time()
        res = emmax_loco(rg, y, chromosomes=ch, precision="fast")
        wall = time.time() - t0
        deltas = [round(v["delta"], 4) for v in res["loco"].values()]
        record({"phase": f"loco_resident_1M_{n_chrom}chrom_lazy_overlap",
                "ts": time.strftime("%F %T"), "n": N, "M": M,
                "n_chrom": n_chrom, "total_s": round(wall, 1),
                "s_per_chrom": round(wall / n_chrom, 1),
                "precision": "fast (f32 ssyevd eigh; gram+D2H+algebra+"
                             "eigh in worker, overlapped with scans)",
                "min_p": float(np.min(res["ps"])),
                "delta_range": [min(deltas), max(deltas)]})

    if "gxe" in phases:
        import gxe_scale_bench

        gxe_scale_bench.main()

    if "gxe_kernel" in phases:
        # scan-kernel-only GxE walls per tier (the r3 93k/s record was
        # kernel-level; end-to-end walls add a fixed ~14 s per-study
        # REML + p-finalize) — one shared null, warm repeats
        from mixmogam_tpu.models.gxe import _gxe_scan_packed, _sub_tile
        from mixmogam_tpu.ops.eigen import orthonormal_basis
        from mixmogam_tpu.ops.reml import fit_null_model
        from mixmogam_tpu.ops.scan import (normalize_rotate_tier,
                                           quantize_rotation)

        rngl = np.random.default_rng(99)
        env = rngl.normal(size=N)
        X0e = np.column_stack([np.ones(N), env]).astype(np.float32)
        null = fit_null_model(y.astype(np.float32), X0e, eig_k=(phi, U))
        dt = jnp.float32
        phi_d = jnp.asarray(phi, dt)
        U_d = jnp.asarray(U, dt)
        sd = 1.0 / jnp.sqrt(phi_d + jnp.asarray(null.delta, dt))
        ys = (U_d.T @ jnp.asarray(y, dt)) * sd
        X0s = (U_d.T @ jnp.asarray(X0e, dt)) * sd[:, None]
        Q0 = orthonormal_basis(X0s)
        y_res = ys - Q0 @ (Q0.T @ ys)
        sds, Q0s = jnp.stack([sd]), jnp.stack([Q0])
        y_ress = jnp.stack([y_res])
        rss0s = jnp.stack([y_res @ y_res])
        dof_d = jnp.asarray(float(N - 3), dt)
        Ue = jnp.asarray(env, dt)[:, None] * U_d
        st = _sub_tile(rg.tile, 1)
        for tier in (None, "int8x3", "int8x2"):
            rd = normalize_rotate_tier(tier) if tier else None
            RU, rs = quantize_rotation(U_d, rd, sd_dtype=dt)
            We, ws = quantize_rotation(Ue, rd, sd_dtype=dt)
            RUes = jnp.stack([We])
            wss = None if ws is None else jnp.stack([ws])

            def run_once():
                return jax.block_until_ready(_gxe_scan_packed(
                    rg.packed, RU, rs, RUes, wss, sds, Q0s, y_ress,
                    rss0s, dof_d, rg.n, st, False)[1])

            run_once()  # compile
            best = np.inf
            for _ in range(2):
                t0 = time.time()
                run_once()
                best = min(best, time.time() - t0)
            record({"phase": f"gxe_kernel_1M_{tier or 'exact'}",
                    "ts": time.strftime("%F %T"), "n": N, "M": M,
                    "warm_s": round(best, 2),
                    "tests_per_s": round(M / best)})

    if "perm_fused" in phases:
        # round-4 follow-up: the fused single-dispatch perm sweep
        from mixmogam_tpu.models.permutation import emmax_perm_test

        for prec, tag in ((None, "exact"), ("int8x2", "int8x2")):
            t0 = time.time()
            pr = emmax_perm_test(rg, y, K=K, num_perm=128, seed=1,
                                 eig_k=(phi, U), precision=prec)
            wall = time.time() - t0
            record({"phase": f"perm_resident_1M_fused_{tag}",
                    "ts": time.strftime("%F %T"), "n": N, "M": M,
                    "num_perm": 128, "wall_s": round(wall, 1),
                    "perm_scans_per_s": round(128 * M / wall),
                    "threshold_p": float(pr["threshold"])})

    log("campaign_r4 done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
