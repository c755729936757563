"""TPU: int8 digit-plane tiers vs float tiers, one process, pipelined.

The MXU runs int8 at 2x its bf16 rate; integer dosages make the digit
matmuls EXACT (int32 accumulation), so 'int8x3' (22-bit W) should give
fp32-grade p-values at ~1.5-bf16-pass cost vs XLA HIGHEST's 6 passes.

Usage: timeout 1500 python scripts/int8_bench.py
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
    n, M = 1024, 262_144
    cache = os.path.expanduser(f"~/.cache/mixmogam_bench/sim_{n}x{M}.npz")
    with np.load(cache) as z:
        G, y = z["G"], z["y"]
    t0 = time.time()
    np.asarray(jnp.zeros(8))
    log(f"claim: {time.time()-t0:.1f}s")

    S = jnp.zeros((n, n), dtype=jnp.int32)
    for s in range(0, M, 65536):
        S = _ibs_int8_update(S, jnp.asarray(G[s:s + 65536]), 65536)
    K = scale_k(np.asarray(S).astype(np.float64) / M)
    null = fit_null_model(y.astype(np.float32), np.ones((n, 1), np.float32),
                          K=K.astype(np.float32))
    G8 = jax.device_put(jnp.asarray(G))
    jax.block_until_ready(G8)
    TILE = 65_536
    R = 12

    tiers = [("exact fp32", None), ("int8x3", "int8x3"),
             ("int8x4", "int8x4"), ("int8x2", "int8x2"),
             ("bf16x3", "bf16x3"), ("bf16x2", "bf16x2"),
             ("bf16", jnp.bfloat16)]
    ref_p = None
    for name, rd in tiers:
        rot = build_rotated_null(null, rotate_dtype=rd)
        f0 = emmax_scan_all(G8, rot, tile=TILE)
        jax.block_until_ready(f0)
        t0 = time.time()
        outs = [emmax_scan_all(G8, rot, tile=TILE) for _ in range(R)]
        jax.block_until_ready(outs)
        dt = (time.time() - t0) / R
        f = np.asarray(f0["f_stats"], dtype=np.float64)
        p = f_sf_host(f, 1.0, float(n - 2))
        if ref_p is None:
            ref_p = p
            dp = 0.0
        else:
            dp = float(np.max(np.abs(p - ref_p)))
        log(f"{name:11s} {dt*1e3:7.2f} ms/scan {M/dt/1e6:6.1f}M tests/s "
            f"|dp|={dp:.1e}")


if __name__ == "__main__":
    main()
