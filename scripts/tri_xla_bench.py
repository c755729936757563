"""TPU measurement: XLA triangular int8 gram vs full gram.

Usage: timeout 1200 python scripts/tri_xla_bench.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(*a):
    print(*a, flush=True)


def timed(fn, *args, reps=6):
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

    from mixmogam_tpu.ops.kinship import _gram_int8_tri

    log(f"backend={jax.default_backend()}")
    n, M = 1024, 262_144
    cache = os.path.expanduser(f"~/.cache/mixmogam_bench/sim_{n}x{M}.npz")
    with np.load(cache) as z:
        G = z["G"]
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

    dt = timed(xla_gram, G8)
    log(f"XLA full gram:        {dt*1e3:7.2f} ms "
        f"{kin_flops/dt/1e12:6.1f} TOP/s-equiv")
    Sref = np.asarray(xla_gram(G8))
    for tn in (512, 256, 128):
        f = lambda z, tn=tn: _gram_int8_tri(
            jnp.zeros((n, n), jnp.int32), z, tn=tn)
        try:
            dt = timed(f, G8)
            S = np.asarray(f(G8))
            ok = np.array_equal(S, Sref)
            log(f"XLA TRI tn={tn:4d}:      {dt*1e3:7.2f} ms "
                f"{kin_flops/dt/1e12:6.1f} TOP/s-equiv exact={ok}")
        except Exception as e:  # noqa: BLE001
            log(f"XLA TRI tn={tn}: FAILED {type(e).__name__}: "
                f"{str(e)[:120]}")

    # larger-n check (the symmetry win grows with B): synthetic n=4096
    n2 = 4096
    M2 = 32_768
    rng = np.random.default_rng(1)
    Z2 = jax.device_put(jnp.asarray(
        rng.integers(0, 2, size=(M2, n2), dtype=np.int8)))
    jax.block_until_ready(Z2)
    flops2 = 2.0 * M2 * n2 * n2
    dt = timed(xla_gram, Z2)
    log(f"n=4096 full gram:     {dt*1e3:7.2f} ms "
        f"{flops2/dt/1e12:6.1f} TOP/s-equiv")
    for tn in (512, 256):
        f = lambda z, tn=tn: _gram_int8_tri(
            jnp.zeros((n2, n2), jnp.int32), z, tn=tn)
        dt = timed(f, Z2)
        log(f"n=4096 TRI tn={tn:4d}:  {dt*1e3:7.2f} ms "
            f"{flops2/dt/1e12:6.1f} TOP/s-equiv")


if __name__ == "__main__":
    main()
