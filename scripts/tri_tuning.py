"""TPU measurement: triangular Pallas kinship vs XLA gram, and the
library-path scan precision tiers after the global 'highest' pin.

Usage: timeout 1500 python scripts/tri_tuning.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(*a):
    print(*a, flush=True)


def timed(fn, *args, reps=8):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    outs = [fn(*args) for _ in range(reps)]
    jax.block_until_ready(outs)
    return (time.time() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from mixmogam_tpu.ops.pallas_kinship import _ibs_gram_tri
    from mixmogam_tpu.ops.reml import fit_null_model
    from mixmogam_tpu.ops.scan import build_rotated_null, emmax_scan_all
    from mixmogam_tpu.ops.kinship import _ibs_int8_update
    from mixmogam_tpu.ops.stats import f_sf_host
    from mixmogam_tpu.oracle.kinship import scale_k

    log(f"backend={jax.default_backend()} "
        f"default_matmul_precision pinned by ops import")
    n, M = 1024, 262_144
    cache = os.path.expanduser(f"~/.cache/mixmogam_bench/sim_{n}x{M}.npz")
    if os.path.exists(cache):
        with np.load(cache) as z:
            G, y = z["G"], z["y"]
    else:
        from mixmogam_tpu.data.simulate import (simulate_genotypes,
                                                simulate_phenotype)

        G, _, _ = simulate_genotypes(n, M, seed=0)
        y, _ = simulate_phenotype(G, h2=0.5, n_causal=20, seed=0)
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        np.savez(cache, G=G, y=y)
    t0 = time.time()
    np.asarray(jnp.zeros(8))
    log(f"claim: {time.time()-t0:.1f}s")

    # ---- triangular Pallas kinship vs XLA gram ----
    kin_flops = 2.0 * M * n * n  # full-gram flop count for comparability
    G8 = jax.device_put(jnp.asarray(G))
    jax.block_until_ready(G8)

    @jax.jit
    def xla_gram(Z):
        return lax.dot_general(Z, Z, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)

    dt = timed(xla_gram, G8, reps=4)
    log(f"XLA int8 full gram:        {dt*1e3:7.2f} ms "
        f"{kin_flops/dt/1e12:6.1f} TOP/s-equiv")
    for tm, tn in ((2048, 256), (2048, 512), (4096, 256), (1024, 256),
                   (8192, 256), (2048, 128)):
        B = n // tn
        ij = np.array([(i, j) for i in range(B) for j in range(B)
                       if i <= j], dtype=np.int32)
        try:
            dt = timed(lambda z, ij=jnp.asarray(ij), tm=tm, tn=tn:
                       _ibs_gram_tri(z, ij, tm, tn), G8, reps=4)
            log(f"Pallas TRI {tm:5d}x{tn:4d}:     {dt*1e3:7.2f} ms "
                f"{kin_flops/dt/1e12:6.1f} TOP/s-equiv "
                f"({len(ij)}/{B*B} blocks)")
        except Exception as e:  # noqa: BLE001
            log(f"Pallas TRI {tm}x{tn}: FAILED {type(e).__name__}: "
                f"{str(e)[:100]}")

    # ---- library-path scan tiers (post-pin) ----
    S = jnp.zeros((n, n), dtype=jnp.int32)
    for s in range(0, M, 65536):
        S = _ibs_int8_update(S, jnp.asarray(G[s:s + 65536]), 65536)
    K = scale_k(np.asarray(S).astype(np.float64) / M)
    null = fit_null_model(y.astype(np.float32), np.ones((n, 1), np.float32),
                          K=K.astype(np.float32))
    rot = build_rotated_null(null)
    rot16 = build_rotated_null(null, rotate_dtype=jnp.bfloat16)
    TILE = 65_536

    def run_tier(name, rr, prec):
        import contextlib

        ctx = (jax.default_matmul_precision(prec) if prec
               else contextlib.nullcontext())
        with ctx:
            dt = timed(lambda g: emmax_scan_all(g, rr, tile=TILE), G8)
            f = np.asarray(emmax_scan_all(G8, rr, tile=TILE)["f_stats"],
                           dtype=np.float64)
        p = f_sf_host(f, 1.0, float(np.asarray(rot.dof)))
        return dt, f, p

    dt, f_ref, p_ref = run_tier("exact", rot, None)
    log(f"scan exact (pinned highest): {dt*1e3:6.2f} ms "
        f"{M/dt/1e6:6.1f}M tests/s")
    for name, rr, prec in (("high", rot, "high"),
                           ("bf16", rot16, None)):
        dt, f, p = run_tier(name, rr, prec)
        log(f"scan {name:4s}:                {dt*1e3:6.2f} ms "
            f"{M/dt/1e6:6.1f}M tests/s |dp|={np.max(np.abs(p-p_ref)):.1e}")


if __name__ == "__main__":
    main()
