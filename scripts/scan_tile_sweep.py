"""Resident-scan tile sweep at n = 10,240: does a larger lax.map tile
raise MXU utilization above the measured 52/79/105 eff TFLOP/s
(exact/int8x3/int8x2)? Reuses the campaign cache; one process."""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
CACHE = os.path.expanduser("~/.cache/mixmogam_bench")
N, MBIG, M = 10_240, 1_048_576, 65_536


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from mixmogam_tpu.ops.eigen import eigen_k
    from mixmogam_tpu.ops.reml import fit_null_model
    from mixmogam_tpu.ops.scan import build_rotated_null, emmax_scan_all

    G = np.ascontiguousarray(
        np.load(os.path.join(CACHE, f"simbig_{N}x{MBIG}.npy"),
                mmap_mode="r")[:M])
    with np.load(os.path.join(CACHE, f"simbig_{N}x{MBIG}_y.npz")) as z:
        y = z["y"]
    K = np.load(os.path.join(CACHE, f"K_{N}x{MBIG}.npy"))
    t0 = time.time()
    np.asarray(jnp.zeros(8))
    log(f"claim {time.time()-t0:.0f}s")
    phi, U = eigen_k(K.astype(np.float32), host=True)
    null = fit_null_model(y.astype(np.float32), np.ones((N, 1), np.float32),
                          K=K.astype(np.float32), eig_k=(phi, U))
    Gd = jax.device_put(jnp.asarray(G))
    jax.block_until_ready(Gd)

    for tier, rd in (("exact", None), ("int8x3", "int8x3"),
                     ("int8x2", "int8x2"), ("bf16", jnp.bfloat16)):
        rot = build_rotated_null(null, rotate_dtype=rd)
        for tile in (4096, 8192, 16_384, 32_768, 65_536):
            try:
                jax.block_until_ready(emmax_scan_all(Gd, rot, tile=tile))
                best = np.inf
                for _ in range(2):
                    t0 = time.time()
                    jax.block_until_ready(emmax_scan_all(Gd, rot,
                                                         tile=tile))
                    best = min(best, time.time() - t0)
                log(f"{tier:7s} tile={tile:6d}: {best:.3f}s = "
                    f"{M/best:,.0f} tests/s "
                    f"({2*M*N*N/best/1e12:.0f} eff TF/s)")
            except Exception as exc:
                log(f"{tier} tile={tile}: FAILED {type(exc).__name__}: "
                    f"{str(exc)[:160]}")


if __name__ == "__main__":
    main()
