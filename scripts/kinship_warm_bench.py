"""Warm vs cold resident-kinship timing at the 1M x 10,240 campaign
scale. gram_probe2.py showed the fused IBS fori_loop body runs at
~200 TOPS (34.9 ms per 16,384-SNP tile => ~2.2 s for the full 1M
genome), yet bench.py recorded 18.2 s — this isolates how much of that
is one-time XLA compile vs execution, using the bench packed-rows disk
cache (no 10.7 GB memmap pass)."""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
CACHE = os.path.expanduser("~/.cache/mixmogam_bench")


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from mixmogam_tpu.models.resident import (ResidentGenome,
                                              _ibs_resident_fused,
                                              kinship_resident)

    np.asarray(jnp.zeros(8))
    log(f"claimed; backend={jax.default_backend()}")

    pk = os.path.join(CACHE, "packed_10240x1048576.bin")
    t0 = time.time()
    rg = ResidentGenome.from_source(None, cache_path=pk)
    M, n, tile = rg.M, rg.n, rg.tile
    log(f"packed rows from disk + upload: {time.time()-t0:.1f}s "
        f"({M:,} x {n}, {rg.nbytes_packed/1e9:.2f} GB)")

    t0 = time.time()
    K = kinship_resident(rg)
    cold = time.time() - t0
    log(f"kinship cold (incl. compile): {cold:.2f}s")
    times = []
    for _ in range(2):
        t0 = time.time()
        K = kinship_resident(rg)
        times.append(time.time() - t0)
    warm = min(times)
    log(f"kinship warm: {warm:.2f}s = {M/warm:,.0f} SNPs/s "
        f"(cold-warm = {cold-warm:.1f}s of compile)")
    # device-only portion (no D2H of the n x n result)
    f = jax.jit(_ibs_resident_fused, static_argnums=(1, 2, 3, 4))
    jax.block_until_ready(f(rg.packed, n, tile, M, rg.ploidy))
    t0 = time.time()
    jax.block_until_ready(f(rg.packed, n, tile, M, rg.ploidy))
    dev = time.time() - t0
    log(f"device-only fused pass: {dev:.2f}s "
        f"(D2H+epilogue = {warm-dev:.2f}s)")
    out = {"phase": "resident_kinship_warm", "n": n, "M": M,
           "cold_s": round(cold, 2), "warm_s": round(warm, 2),
           "device_only_s": round(dev, 2),
           "warm_snps_per_s": round(M / warm)}
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
