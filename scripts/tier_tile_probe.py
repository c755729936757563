"""Per-tier scan-granularity probe (round 5 follow-up): tile 8,192 was
measured best for int8x3 (+4.6%); verify the OTHER tiers in one process
before keeping a single shared granularity. All 8 programs are in the
persistent compile cache from the r4/r5 bench runs — this probe is
pure measurement.

Usage: timeout 1500 python scripts/tier_tile_probe.py
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
CACHE = os.path.expanduser("~/.cache/mixmogam_bench")
N, M = 10_240, 1_048_576


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from mixmogam_tpu.models.resident import ResidentGenome, emmax_scan_packed
    from mixmogam_tpu.ops.reml import fit_null_model
    from mixmogam_tpu.ops.scan import build_rotated_null

    log(f"backend={jax.default_backend()}")
    t0 = time.time()
    np.asarray(jnp.zeros(8))
    log(f"claim: {time.time()-t0:.1f}s")
    with np.load(os.path.join(CACHE, f"simbig_{N}x{M}_y.npz")) as z:
        y = z["y"]
    rg = ResidentGenome.from_source(
        None, cache_path=os.path.join(CACHE, f"packed_{N}x{M}.bin"))
    with np.load(os.path.join(CACHE, f"eig_{N}x{M}.npz")) as z:
        phi, U = z["phi"], z["U"]
    null = fit_null_model(y.astype(np.float32),
                          np.ones((N, 1), np.float32), eig_k=(phi, U))
    res = {}
    for name, rd in (("exact", None), ("int8x3", "int8x3"),
                     ("int8x2", "int8x2"), ("bf16", jnp.bfloat16)):
        rot = build_rotated_null(null, rotate_dtype=rd)
        for tile in (8192, 16384):
            fn = lambda: emmax_scan_packed(rg.packed, rot, N,
                                           tile)["f_stats"]
            jax.block_until_ready(fn())
            best = np.inf
            for _ in range(3):
                t0 = time.time()
                jax.block_until_ready(fn())
                best = min(best, time.time() - t0)
            res[f"{name}_t{tile}_s"] = round(best, 3)
            log(f"{name} tile={tile}: {best:.3f}s = {M/best:,.0f} tests/s")
    p = os.path.join(REPO, "docs", "baseline_r5.json")
    d = json.load(open(p))
    d["tier_tile_probe"] = res
    json.dump(d, open(p, "w"), indent=1)
    log("RECORDED", json.dumps(res))


if __name__ == "__main__":
    main()
