"""Round-5 follow-up: the multi-trait SHARED rotation now rides the
precision tiers — measure exact vs int8x3 at config #4 scale
(50 fully-observed traits x 1,048,576 x 10,240, resident container,
one process). Usage: timeout 2400 python scripts/multitrait_tier_probe.py
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
CACHE = os.path.expanduser("~/.cache/mixmogam_bench")
N, M, T = 10_240, 1_048_576, 50


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    import jax
    import jax.numpy as jnp

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
    rng = np.random.default_rng(7)
    Y = np.empty((T, N))
    for t in range(T):
        causal = rng.choice(M, 20, replace=False)
        rows = np.asarray(G[np.sort(causal)], dtype=np.float64)
        beta = rng.normal(size=20) * 0.35
        g = beta @ rows
        Y[t] = g + rng.normal(size=N) * np.std(g)
    t0 = time.time()
    rg = ResidentGenome.from_source(
        G, cache_path=os.path.join(CACHE, f"packed_{N}x{M}.bin"),
        trust_cache=True)
    log(f"packed upload: {time.time()-t0:.1f}s")

    walls = {}
    for tier in ("exact", "int8x3"):
        kw = {} if tier == "exact" else {"precision": tier}
        t0 = time.time()
        res = emmax_multi_trait(rg, Y, K=K, eig_k=(phi, U), **kw)
        walls[tier] = time.time() - t0
        log(f"{tier}: {walls[tier]:.1f}s end-to-end "
            f"= {T * M / walls[tier]:,.0f} SNP-trait-tests/s/chip")
        if tier == "exact":
            ps_ex = res["ps"]
        else:
            dl = np.abs(
                np.log10(np.maximum(res["ps"], 1e-300))
                - np.log10(np.maximum(ps_ex, 1e-300))).max()
            log(f"int8x3 max |dlog10 p| vs exact: {dl:.2e}")
    rec = {"config": f"{T} traits x {M} x {N}, fully observed, resident",
           "exact_s": round(walls["exact"], 1),
           "int8x3_s": round(walls["int8x3"], 1),
           "int8x3_dlog10p": float(dl),
           "int8x3_tests_per_s": round(T * M / walls["int8x3"])}
    p = os.path.join(REPO, "docs", "baseline_r5.json")
    d = json.load(open(p))
    d["multitrait_tier_probe"] = rec
    json.dump(d, open(p, "w"), indent=1)
    log("RECORDED", json.dumps(rec))


if __name__ == "__main__":
    main()
