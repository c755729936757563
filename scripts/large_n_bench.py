"""Large-n scan measurement (n=4096): how the per-chip EMMAX tiers scale
toward the BASELINE n=10k configuration. Single-dispatch timing — at
these sizes a scan takes seconds, so the tunnel RTT is negligible.

Usage: timeout 1500 python scripts/large_n_bench.py
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

    t0 = time.time()
    S = jnp.zeros((n, n), dtype=jnp.int32)
    for s in range(0, M, 8192):
        S = _ibs_int8_update(S, jnp.asarray(G[s:s + 8192]), 8192)
    S.block_until_ready()
    log(f"kinship int8 gram (M={M}): {time.time()-t0:.2f}s")
    K = scale_k(np.asarray(S).astype(np.float64) / M)

    t0 = time.time()
    null = fit_null_model(y, np.ones((n, 1), np.float32),
                          K=K.astype(np.float32))
    log(f"host eigh + device REML (n={n}): {time.time()-t0:.1f}s "
        f"h2={float(null.pseudo_heritability):.3f}")

    G8 = jax.device_put(jnp.asarray(G))
    jax.block_until_ready(G8)
    rot = build_rotated_null(null)
    rot16 = build_rotated_null(null, rotate_dtype=jnp.bfloat16)
    flops = 2.0 * M * n * n
    TILE = 8192

    def run(name, rr, prec=None, reps=2):
        import contextlib

        ctx = (jax.default_matmul_precision(prec) if prec
               else contextlib.nullcontext())
        with ctx:
            out = emmax_scan_all(G8, rr, tile=TILE)
            jax.block_until_ready(out)
            t0 = time.time()
            for _ in range(reps):
                jax.block_until_ready(emmax_scan_all(G8, rr, tile=TILE))
            dt = (time.time() - t0) / reps
        log(f"scan {name:6s} n={n}: {dt:6.2f} s/scan "
            f"{M/dt/1e3:8.1f}k tests/s  {flops/dt/1e12:5.1f} TFLOP/s")

    run("exact", rot)
    run("high", rot, prec="high")
    run("bf16", rot16)

    # pre-rotated (stepwise/multi-trait inner loop): bandwidth-bound
    Grot = None
    try:
        with jax.default_matmul_precision("high"):
            Grot = jnp.asarray(G, jnp.float32) @ jnp.asarray(null.U)
        jax.block_until_ready(Grot)
        out = emmax_scan_all(Grot, rot, tile=TILE, pre_rotated=True)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(4):
            jax.block_until_ready(
                emmax_scan_all(Grot, rot, tile=TILE, pre_rotated=True))
        dt = (time.time() - t0) / 4
        log(f"scan pre-rotated n={n}: {dt*1e3:6.1f} ms/scan "
            f"{M/dt/1e6:5.1f}M tests/s")
    finally:
        del Grot


if __name__ == "__main__":
    main()
