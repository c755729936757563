"""TPU retry: 2-D-output triangular Pallas kinship + bf16 tier fix check.

Usage: timeout 1200 python scripts/tri_tuning2.py
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
    from mixmogam_tpu.ops.kinship import _ibs_int8_update
    from mixmogam_tpu.ops.reml import fit_null_model
    from mixmogam_tpu.ops.scan import build_rotated_null, emmax_scan_all
    from mixmogam_tpu.oracle.kinship import scale_k

    log(f"backend={jax.default_backend()}")
    n, M = 1024, 262_144
    cache = os.path.expanduser(f"~/.cache/mixmogam_bench/sim_{n}x{M}.npz")
    with np.load(cache) as z:
        G, y = z["G"], z["y"]
    t0 = time.time()
    np.asarray(jnp.zeros(8))
    log(f"claim: {time.time()-t0:.1f}s")

    kin_flops = 2.0 * M * n * n
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
                   (2048, 128), (8192, 256)):
        B = n // tn
        try:
            dt = timed(lambda z, tm=tm, tn=tn:
                       _ibs_gram_tri(z, tm, tn), G8, reps=4)
            log(f"Pallas TRI {tm:5d}x{tn:4d}:     {dt*1e3:7.2f} ms "
                f"{kin_flops/dt/1e12:6.1f} TOP/s-equiv "
                f"({B*(B+1)//2}/{B*B} compute blocks)")
        except Exception as e:  # noqa: BLE001
            log(f"Pallas TRI {tm}x{tn}: FAILED {type(e).__name__}: "
                f"{str(e)[:150]}")

    # parity spot-check on device (first config)
    from mixmogam_tpu.ops.pallas_kinship import pallas_ibs_kinship_tri
    from mixmogam_tpu.oracle import ibs_kinship

    try:
        Kt = pallas_ibs_kinship_tri(G[:4096], tm=2048, tn=256,
                                    interpret=False)
        Ko = ibs_kinship(G[:4096].astype(np.float64))
        log(f"TRI device parity max|dK| = {np.abs(Kt-Ko).max():.2e}")
    except Exception as e:  # noqa: BLE001
        log(f"TRI parity check FAILED: {type(e).__name__}")

    # ---- bf16 tier after the per-dot precision fix ----
    S = jnp.zeros((n, n), dtype=jnp.int32)
    for s in range(0, M, 65536):
        S = _ibs_int8_update(S, jnp.asarray(G[s:s + 65536]), 65536)
    K = scale_k(np.asarray(S).astype(np.float64) / M)
    null = fit_null_model(y.astype(np.float32), np.ones((n, 1), np.float32),
                          K=K.astype(np.float32))
    rot = build_rotated_null(null)
    rot16 = build_rotated_null(null, rotate_dtype=jnp.bfloat16)
    TILE = 65_536
    dt = timed(lambda g: emmax_scan_all(g, rot, tile=TILE), G8)
    log(f"scan exact:  {dt*1e3:6.2f} ms {M/dt/1e6:6.1f}M tests/s")
    dt = timed(lambda g: emmax_scan_all(g, rot16, tile=TILE), G8)
    log(f"scan bf16:   {dt*1e3:6.2f} ms {M/dt/1e6:6.1f}M tests/s")


if __name__ == "__main__":
    main()
