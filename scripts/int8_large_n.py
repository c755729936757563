"""int8 digit-plane tiers at n=4096 (MXU-bound regime): the regime the
north-star n=10k config lives in, where the rotation matmul dominates and
the int8 MXU rate (2x bf16) should show its full factor.

Usage: timeout 1500 python scripts/int8_large_n.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(*a):
    print(*a, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from mixmogam_tpu.ops.kinship import _ibs_int8_update
    from mixmogam_tpu.ops.reml import fit_null_model
    from mixmogam_tpu.ops.scan import build_rotated_null, emmax_scan_all
    from mixmogam_tpu.ops.stats import f_sf_host
    from mixmogam_tpu.oracle.kinship import scale_k

    log(f"backend={jax.default_backend()}")
    n, M = 4096, 32_768
    rng = np.random.default_rng(0)
    G = rng.integers(0, 2, size=(M, n), dtype=np.int8)
    y = (G[:64].sum(axis=0) * 0.05
         + rng.normal(size=n)).astype(np.float32)
    t0 = time.time()
    np.asarray(jnp.zeros(8))
    log(f"claim: {time.time()-t0:.1f}s")

    S = jnp.zeros((n, n), dtype=jnp.int32)
    for s in range(0, M, 8192):
        S = _ibs_int8_update(S, jnp.asarray(G[s:s + 8192]), 8192)
    S.block_until_ready()
    K = scale_k(np.asarray(S).astype(np.float64) / M)
    t0 = time.time()
    null = fit_null_model(y, np.ones((n, 1), np.float32),
                          K=K.astype(np.float32))
    log(f"host eigh + REML: {time.time()-t0:.1f}s")

    G8 = jax.device_put(jnp.asarray(G))
    jax.block_until_ready(G8)
    flops = 2.0 * M * n * n
    TILE = 8192
    tiers = [("exact", None), ("int8x3", "int8x3"), ("int8x2", "int8x2"),
             ("bf16x2", "bf16x2"), ("bf16", jnp.bfloat16)]
    ref_p = None
    for name, rd in tiers:
        rot = build_rotated_null(null, rotate_dtype=rd)
        out = emmax_scan_all(G8, rot, tile=TILE)
        jax.block_until_ready(out)
        # pipelined: the ~27ms tunnel RTT is ~60% of a single 40ms
        # dispatch at this size — amortize it like bench.py does
        reps = 8
        t0 = time.time()
        outs = [emmax_scan_all(G8, rot, tile=TILE) for _ in range(reps)]
        jax.block_until_ready(outs)
        dt = (time.time() - t0) / reps
        f = np.asarray(out["f_stats"], dtype=np.float64)
        p = f_sf_host(f, 1.0, float(n - 2))
        if ref_p is None:
            ref_p = p
            dp = 0.0
        else:
            dp = float(np.max(np.abs(p - ref_p)))
        log(f"{name:7s} n={n}: {dt:6.2f} s/scan {M/dt/1e3:8.1f}k tests/s "
            f"{flops/dt/1e12:5.1f} TFLOP/s |dp|={dp:.1e}")


if __name__ == "__main__":
    main()
