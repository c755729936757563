"""TPU: fused Pallas rotate+scan (split-W, VMEM-resident Xs) vs the XLA
tiers. Usage: timeout 1500 python scripts/fused_bench.py
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
    from mixmogam_tpu.ops.pallas_scan import pallas_rotate_scan
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
    R = 12

    rot = build_rotated_null(null)
    f0 = emmax_scan_all(G8, rot, tile=65536)
    jax.block_until_ready(f0)
    t0 = time.time()
    outs = [emmax_scan_all(G8, rot, tile=65536) for _ in range(R)]
    jax.block_until_ready(outs)
    dt = (time.time() - t0) / R
    ref_p = f_sf_host(np.asarray(f0["f_stats"], np.float64), 1.0,
                      float(n - 2))
    log(f"XLA exact fp32:        {dt*1e3:7.2f} ms {M/dt/1e6:6.1f}M tests/s")

    for parts in ("bf16x3", "bf16x2"):
        rots = build_rotated_null(null, rotate_dtype=parts)
        for tm, nb in ((256, 512), (512, 512), (1024, 512), (256, 256),
                       (512, 256), (2048, 512), (512, 1024)):
            try:
                f = lambda g, r=rots, tm=tm, nb=nb: pallas_rotate_scan(
                    g, r, tm=tm, nb=nb)
                o0 = f(G8)
                jax.block_until_ready(o0)
                t0 = time.time()
                outs = [f(G8) for _ in range(R)]
                jax.block_until_ready(outs)
                dt = (time.time() - t0) / R
                p = f_sf_host(np.asarray(o0["f_stats"], np.float64), 1.0,
                              float(n - 2))
                dp = float(np.max(np.abs(p - ref_p)))
                log(f"fused {parts} {tm:4d}x{nb:4d}: {dt*1e3:7.2f} ms "
                    f"{M/dt/1e6:6.1f}M tests/s |dp|={dp:.1e}")
            except Exception as e:  # noqa: BLE001
                log(f"fused {parts} {tm}x{nb}: FAILED "
                    f"{type(e).__name__}: {str(e)[:110]}")


if __name__ == "__main__":
    main()
