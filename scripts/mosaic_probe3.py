"""Run the REAL pallas_rotate_scan wrapper at increasing shapes; print
the full Mosaic error. Usage: timeout 1200 python scripts/mosaic_probe3.py
"""

import os
import sys
import traceback

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(*a):
    print(*a, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from mixmogam_tpu.ops.pallas_scan import pallas_rotate_scan
    from mixmogam_tpu.ops.reml import NullModel
    from mixmogam_tpu.ops.scan import build_rotated_null

    log(f"backend={jax.default_backend()}")
    np.asarray(jnp.zeros(8))
    rng = np.random.default_rng(0)

    def make_rot(n):
        A = rng.normal(size=(n, n)).astype(np.float32)
        Q, _ = np.linalg.qr(A)
        phi = np.linspace(2.0, 0.1, n).astype(np.float32)
        y = rng.normal(size=n).astype(np.float32)
        null = NullModel(
            phi=jnp.asarray(phi), U=jnp.asarray(Q),
            delta=jnp.asarray(0.5, jnp.float32),
            log_delta=jnp.asarray(0.0, jnp.float32),
            ll=jnp.asarray(0.0, jnp.float32),
            sigma_g2=jnp.asarray(1.0, jnp.float32),
            sigma_e2=jnp.asarray(0.5, jnp.float32),
            pseudo_heritability=jnp.asarray(0.67, jnp.float32),
            y=jnp.asarray(y), X0=jnp.ones((n, 1), jnp.float32))
        return build_rotated_null(null, rotate_dtype="bf16x3")

    cases = [
        (256, 1024, 128, 128),
        (256, 4096, 128, 128),
        (1024, 4096, 128, 128),
        (1024, 4096, 256, 256),
        (1024, 4096, 256, 512),
        (1024, 65536, 256, 512),
        (1024, 262144, 256, 512),
    ]
    rots = {}
    for n, M, tm, nb in cases:
        if n not in rots:
            rots[n] = make_rot(n)
        G = rng.integers(0, 2, size=(M, n), dtype=np.int8)
        try:
            r = pallas_rotate_scan(G, rots[n], tm=tm, nb=nb)
            jax.block_until_ready(r["f_stats"])
            log(f"OK   n={n} M={M} tm={tm} nb={nb}")
        except Exception:
            log(f"FAIL n={n} M={M} tm={tm} nb={nb}")
            log(traceback.format_exc()[-3000:])
            break


if __name__ == "__main__":
    main()
