"""Whole-genome GxE at BASELINE config #3 scale (1M x 10,240) on the
device-resident container, round 4: precision tiers (VERDICT r3 #3).

Measures emmax_gxe end-to-end per tier off the cached packed rows +
eigendecomposition: exact fp32, int8x3 (fp32-grade), int8x2 + exact
rescore (exact-grade reported hits), and a 2-environment batch (shared
genotype rotation: E+1 rotations per tile instead of 2E). Appends
records to docs/baseline_r4.json."""

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

    from mixmogam_tpu.models.gxe import emmax_gxe
    from mixmogam_tpu.models.resident import ResidentGenome

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

    recs = []

    def run(label, envv, **kw):
        # warm-up call compiles; second call is the steady-state wall
        t0 = time.time()
        emmax_gxe(rg, y, envv, eig_k=(phi, U), **kw)
        cold = time.time() - t0
        t0 = time.time()
        out = emmax_gxe(rg, y, envv, eig_k=(phi, U), **kw)
        warm = time.time() - t0
        n_env = 1 if envv.ndim == 1 else envv.shape[1]
        rate = M * n_env / warm
        ip = out["inter_ps"]
        log(f"GxE {label}: cold {cold:.1f}s warm {warm:.2f}s -> "
            f"{rate:,.0f} SNP-GxE-tests/s/chip (E={n_env}); "
            f"min inter p = {np.min(ip):.3g}")
        recs.append({"phase": f"resident_gxe_1M_{label}",
                     "ts": time.strftime("%F %T"), "n": N, "M": M,
                     "n_env": n_env, "cold_s": round(cold, 2),
                     "warm_s": round(warm, 2), "tests_per_s": round(rate),
                     "min_inter_p": float(np.min(ip))})
        return out

    ref = run("exact", env)
    r3 = run("int8x3", env, precision="int8x3")
    rf = run("fast_int8x2_rescore", env, precision="fast")
    # parity of the fp32-grade tier vs exact on the leaders
    top = np.argsort(ref["inter_ps"])[:100]
    d3 = float(np.max(np.abs(r3["inter_ps"][top] - ref["inter_ps"][top])))
    df = float(np.max(np.abs(rf["inter_ps"][top] - ref["inter_ps"][top])))
    log(f"top-100 |dp|: int8x3 {d3:.3g}, fast+rescore {df:.3g}")
    recs[-2]["top100_max_dp_vs_exact"] = d3
    recs[-1]["top100_max_dp_vs_exact"] = df
    # 2-env batch: shared genotype rotation
    env2 = np.column_stack([env, rng.normal(size=N)])
    run("exact_E2", env2)
    run("int8x3_E2", env2, precision="int8x3")

    p = os.path.join(REPO, "docs", "baseline_r4.json")
    d = json.load(open(p)) if os.path.exists(p) else []
    d.extend(recs)
    json.dump(d, open(p, "w"), indent=2)
    print(json.dumps(recs[-1]), flush=True)


if __name__ == "__main__":
    main()
