"""Pallas int8 fused rotate+scan vs XLA int8 tiers at n = 10,240
(VERDICT r1 weak item: 'the int8 digit-plane tier has no Pallas kernel
yet — the 2x int8 MXU rate may flip the verdict'). Times both on the
campaign cache (scripts/baseline_configs.py) and prints a tiling sweep.

Run AFTER baseline_configs (reuses its sim/K cache; needs the TPU)."""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
CACHE = os.path.expanduser("~/.cache/mixmogam_bench")
N, MBIG = 10_240, 1_048_576
M = 32_768


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from mixmogam_tpu.ops.eigen import eigen_k
    from mixmogam_tpu.ops.reml import fit_null_model
    from mixmogam_tpu.ops.scan import build_rotated_null, emmax_scan_all
    from mixmogam_tpu.ops.pallas_scan import pallas_rotate_scan_int8

    G = np.ascontiguousarray(
        np.load(os.path.join(CACHE, f"simbig_{N}x{MBIG}.npy"),
                mmap_mode="r")[:M])
    with np.load(os.path.join(CACHE, f"simbig_{N}x{MBIG}_y.npz")) as z:
        y = z["y"]
    K = np.load(os.path.join(CACHE, f"K_{N}x{MBIG}.npy"))
    t0 = time.time()
    np.asarray(jnp.zeros(8))
    log(f"claim: {time.time()-t0:.0f}s")
    phi, U = eigen_k(K.astype(np.float32), host=True)
    null = fit_null_model(y.astype(np.float32), np.ones((N, 1), np.float32),
                          eig_k=(phi, U))
    Gd = jax.device_put(jnp.asarray(G))
    jax.block_until_ready(Gd)

    def t_best(fn, repeats=2):
        jax.block_until_ready(fn())
        best = np.inf
        for _ in range(repeats):
            t0 = time.time()
            jax.block_until_ready(fn())
            best = min(best, time.time() - t0)
        return best

    for tier in ("int8x3", "int8x2"):
        rot = build_rotated_null(null, rotate_dtype=tier)
        dt = t_best(lambda: emmax_scan_all(Gd, rot, tile=8192))
        eff = 2 * M * N * N / dt / 1e12
        log(f"XLA {tier}: {dt:.2f}s = {M/dt:,.0f} tests/s "
            f"({eff:.0f} eff TF/s)")
        for tm, nb in ((256, 512), (512, 512), (256, 1024), (512, 1024),
                       (1024, 512)):
            try:
                dt = t_best(lambda: pallas_rotate_scan_int8(
                    Gd, rot, tm=tm, nb=nb))
                eff = 2 * M * N * N / dt / 1e12
                log(f"Pallas {tier} tm={tm} nb={nb}: {dt:.2f}s = "
                    f"{M/dt:,.0f} tests/s ({eff:.0f} eff TF/s)")
            except Exception as exc:
                log(f"Pallas {tier} tm={tm} nb={nb}: FAILED "
                    f"{type(exc).__name__}: {str(exc)[:200]}")

    # exact fp32 reference rate for the same M
    rot = build_rotated_null(null)
    dt = t_best(lambda: emmax_scan_all(Gd, rot, tile=8192))
    log(f"XLA exact fp32: {dt:.2f}s = {M/dt:,.0f} tests/s "
        f"({2*M*N*N/dt/1e12:.0f} eff TF/s)")


if __name__ == "__main__":
    main()
