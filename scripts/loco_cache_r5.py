"""Round 5 (VERDICT r4 #5 'done' criterion): demonstrate at FULL
campaign scale that a repeated/resumed LOCO run is scan-bound once the
per-chromosome eigendecompositions are cached.

4 chromosomes over the full 1,048,576 x 10,240 resident genome,
precision='fast' (f32 ssyevd + int8x2 + threshold-complete rescore),
run TWICE in one process with cache_dir set:

  run 1  cold cache — pays the per-chromosome gram + eigh wall
  run 2  warm cache — loads (phi, U) per chromosome, skips the grams
         AND the total kinship; wall = null fits + scans + rescore

(One process per CLAUDE.md; the dominant run-1 terms are host eighs,
which do not depend on the tunnel. The per-chromosome eigen artifacts
are ~420 MB f32 each on disk under the cache dir.)

Usage: timeout 3600 python scripts/loco_cache_r5.py
Appends to docs/baseline_r5.json.
"""

import json
import logging
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
CACHE = os.path.expanduser("~/.cache/mixmogam_bench")
N, M = 10240, 1048576
N_CHROM = 4


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(message)s")
    import jax
    import jax.numpy as jnp

    log(f"backend={jax.default_backend()}")
    t0 = time.time()
    np.asarray(jnp.zeros(8))
    log(f"claim: {time.time()-t0:.1f}s")

    from mixmogam_tpu.models.loco import emmax_loco
    from mixmogam_tpu.models.resident import ResidentGenome

    with np.load(os.path.join(CACHE, f"simbig_{N}x{M}_y.npz")) as z:
        y = z["y"]
    t0 = time.time()
    rg = ResidentGenome.from_source(
        None, cache_path=os.path.join(CACHE, f"packed_{N}x{M}.bin"))
    log(f"packed upload: {time.time()-t0:.1f}s")
    # uneven human-like chromosome blocks covering the whole genome
    w = np.linspace(1.6, 0.45, N_CHROM)
    sizes = np.floor(w / w.sum() * M).astype(np.int64)
    sizes[-1] += M - sizes.sum()
    ch = np.repeat(np.arange(1, N_CHROM + 1), sizes)

    eig_cache = os.path.join(CACHE, "loco_eigen_r5")
    os.makedirs(eig_cache, exist_ok=True)
    warm_only = bool(os.environ.get("MIXMOGAM_LOCO_WARM_ONLY"))
    if not warm_only:
        for f in os.listdir(eig_cache):      # start cold
            os.remove(os.path.join(eig_cache, f))

    walls = {}
    for tag in (("warm",) if warm_only else ("cold", "warm")):
        t0 = time.time()
        res = emmax_loco(rg, y, chromosomes=ch, precision="fast",
                         cache_dir=eig_cache)
        walls[tag] = time.time() - t0
        log(f"{tag} run: {walls[tag]:.1f}s  min_p={np.min(res['ps']):.2e}"
            f"  deltas={[round(v['delta'], 3) for v in res['loco'].values()]}")

    rec = {"phase": "loco_eigen_cache_r5", "ts": time.strftime("%F %T"),
           "n": N, "M": M, "n_chrom": N_CHROM,
           "warm_s": round(walls["warm"], 1),
           "precision": "fast",
           "cache_entries": len(os.listdir(eig_cache))}
    if not warm_only:
        rec["cold_s"] = round(walls["cold"], 1)
        rec["speedup"] = round(walls["cold"] / walls["warm"], 1)
    p = os.path.join(REPO, "docs", "baseline_r5.json")
    d = json.load(open(p))
    key = "loco_eigen_cache_warm_only" if warm_only else "loco_eigen_cache"
    d[key] = rec
    json.dump(d, open(p, "w"), indent=1)
    log("RECORDED", json.dumps(rec))


if __name__ == "__main__":
    main()
