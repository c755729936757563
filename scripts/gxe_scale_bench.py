"""Whole-genome GxE at BASELINE config #3 scale (1M x 10,240) on the
device-resident container: upload (cached packed rows), null fit on
[1, env] off the cached eigendecomposition, then the packed-HBM GxE
scan (unpack + TWO rotate matmuls per tile -> expect ~2x the plain
resident scan's 3.6 s exact wall). Appends a record to
docs/baseline_r3.json."""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
CACHE = os.path.expanduser("~/.cache/mixmogam_bench")
N, M = 10240, 1048576


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from mixmogam_tpu.models.gxe import _gxe_scan_packed
    from mixmogam_tpu.models.resident import ResidentGenome
    from mixmogam_tpu.models.stepwise import _rot_null_from_delta
    from mixmogam_tpu.ops.reml import fit_null_model
    from mixmogam_tpu.ops.stats import f_sf_host

    np.asarray(jnp.zeros(8))
    log(f"claimed; backend={jax.default_backend()}")

    with np.load(os.path.join(CACHE, f"simbig_{N}x{M}_y.npz")) as z:
        y = z["y"]
    rng = np.random.default_rng(99)
    env = rng.normal(size=N)

    t0 = time.time()
    rg = ResidentGenome.from_source(
        None, cache_path=os.path.join(CACHE, f"packed_{N}x{M}.bin"))
    log(f"packed upload: {time.time()-t0:.1f}s")

    with np.load(os.path.join(CACHE, f"eig_{N}x{M}.npz")) as z:
        phi, U = z["phi"].astype(np.float32), z["U"].astype(np.float32)
    X0e = np.column_stack([np.ones(N), env]).astype(np.float32)
    t0 = time.time()
    null = fit_null_model(y.astype(np.float32), X0e, eig_k=(phi, U))
    log(f"null fit on [1, env]: {time.time()-t0:.1f}s "
        f"delta={float(null.delta):.4g}")

    phi_d = jnp.asarray(phi)
    U_d = jnp.asarray(U)
    y_rot = U_d.T @ jnp.asarray(y, jnp.float32)
    X_rot = U_d.T @ jnp.asarray(X0e)
    rot = _rot_null_from_delta(phi_d, null.delta, y_rot, X_rot,
                               jnp.float32, U=U_d)
    ed = jnp.asarray(env, jnp.float32)
    t0 = time.time()
    out = jax.block_until_ready(
        _gxe_scan_packed(rg.packed, ed, rot, rg.n, rg.tile))
    cold = time.time() - t0
    log(f"GxE scan cold (incl. compile): {cold:.2f}s")
    best = np.inf
    for _ in range(2):
        t0 = time.time()
        out = jax.block_until_ready(
            _gxe_scan_packed(rg.packed, ed, rot, rg.n, rg.tile))
        best = min(best, time.time() - t0)
    rate = M / best
    log(f"GxE scan warm: {best:.2f}s FULL {M:,} -> {rate:,.0f} "
        f"SNP-GxE-tests/s/chip (marginal+inter+joint per SNP)")
    f_inter = np.asarray(out[1][:M], np.float64)
    mask_p = np.asarray(out[4][:M])
    ps = np.where(mask_p, f_sf_host(f_inter, 1.0, float(rot.dof) - 1.0),
                  1.0)
    log(f"min inter p = {ps.min():.3g} (null env: expect no extreme "
        f"hits); masked = {int((~mask_p).sum())}")
    rec = {"phase": "resident_gxe_1M", "ts": time.strftime("%F %T"),
           "n": N, "M": M, "scan_cold_s": round(cold, 2),
           "scan_warm_s": round(best, 2),
           "tests_per_s": round(rate), "min_inter_p": float(ps.min()),
           "masked": int((~mask_p).sum())}
    p = os.path.join(REPO, "docs", "baseline_r3.json")
    d = json.load(open(p))
    d.append(rec)
    json.dump(d, open(p, "w"), indent=2)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
