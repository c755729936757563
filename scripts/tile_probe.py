"""Probe pre-rotated scan tile sizes at n=4096 (VMEM working-set cap).

Usage: timeout 900 python scripts/tile_probe.py
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
    y = rng.normal(size=n).astype(np.float32)
    np.asarray(jnp.zeros(8))

    S = jnp.zeros((n, n), dtype=jnp.int32)
    for s in range(0, M, 8192):
        S = _ibs_int8_update(S, jnp.asarray(G[s:s + 8192]), 8192)
    K = scale_k(np.asarray(S).astype(np.float64) / M)
    # avoid the 215s host eigh: identity-ish null via eig of K is needed;
    # use a random orthogonal rotation instead — timing only cares about
    # shapes, not values
    rngo = np.random.default_rng(1)
    A = rngo.normal(size=(n, n)).astype(np.float32)
    Q, _ = np.linalg.qr(A)
    phi = np.linspace(2.0, 0.1, n).astype(np.float32)
    from mixmogam_tpu.ops.reml import NullModel

    null = NullModel(
        phi=jnp.asarray(phi), U=jnp.asarray(Q),
        delta=jnp.asarray(0.5, jnp.float32),
        log_delta=jnp.asarray(0.0, jnp.float32),
        ll=jnp.asarray(0.0, jnp.float32),
        sigma_g2=jnp.asarray(1.0, jnp.float32),
        sigma_e2=jnp.asarray(0.5, jnp.float32),
        pseudo_heritability=jnp.asarray(0.67, jnp.float32),
        y=jnp.asarray(y), X0=jnp.ones((n, 1), jnp.float32))
    rot = build_rotated_null(null)

    with jax.default_matmul_precision("high"):
        Grot = jnp.asarray(G, jnp.float32) @ jnp.asarray(null.U)
    Grot = jax.device_put(Grot)
    jax.block_until_ready(Grot)
    gb = M * n * 4 / 1e9
    for tile in (8192, 4096, 2048, 1024, 512):
        f = lambda g, t=tile: emmax_scan_all(g, rot, tile=t,
                                             pre_rotated=True)
        jax.block_until_ready(f(Grot))
        t0 = time.time()
        outs = [f(Grot) for _ in range(6)]
        jax.block_until_ready(outs)
        dt = (time.time() - t0) / 6
        log(f"pre-rotated tile={tile:5d}: {dt*1e3:7.2f} ms "
            f"{M/dt/1e6:6.2f}M tests/s  {gb/dt:6.0f} GB/s")

    # non-pre-rotated exact scan tile sensitivity
    G8 = jax.device_put(jnp.asarray(G))
    jax.block_until_ready(G8)
    for tile in (8192, 4096, 2048):
        f = lambda g, t=tile: emmax_scan_all(g, rot, tile=t)
        jax.block_until_ready(f(G8))
        t0 = time.time()
        outs = [f(G8) for _ in range(2)]
        jax.block_until_ready(outs)
        dt = (time.time() - t0) / 2
        log(f"exact (int8 G) tile={tile:5d}: {dt:6.3f} s "
            f"{M/dt/1e3:7.1f}k tests/s")


if __name__ == "__main__":
    main()
