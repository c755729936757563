"""Pin down the host->device transport model of this image's TPU tunnel:
latency + bandwidth vs payload size, raw int8 vs 2-bit packed(+unpack),
and the cost of a dependent-dispatch chain (the kinship accumulation
pattern). Informs whether streamed scans are bandwidth-, latency- or
dispatch-bound here."""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from mixmogam_tpu import native
    from mixmogam_tpu.ops.pack2 import unpack_2bit_device

    t0 = time.time()
    np.asarray(jnp.zeros(8))
    log(f"claim: {time.time()-t0:.0f}s backend={jax.default_backend()}")
    rng = np.random.default_rng(0)

    @jax.jit
    def touch(x):  # force the array to be consumed on device
        return jnp.sum(x.astype(jnp.int32))

    for mb in (2, 8, 32, 128, 336):
        rows = mb * 1_000_000 // 10_240
        C = rng.integers(0, 2, size=(rows, 10_240)).astype(np.int8)
        for _ in range(2):  # warm compile per shape
            np.asarray(touch(jnp.asarray(C)))
        times = []
        for _ in range(3):
            t0 = time.time()
            np.asarray(touch(jnp.asarray(C)))
            times.append(time.time() - t0)
        dt = min(times)
        log(f"raw int8 {mb:4d} MB: {dt:6.2f}s = {mb/dt:7.1f} MB/s")
        P = native.pack_2bit(C)
        for _ in range(2):
            np.asarray(touch(unpack_2bit_device(jnp.asarray(P), 10_240)))
        times = []
        for _ in range(3):
            t0 = time.time()
            np.asarray(touch(unpack_2bit_device(jnp.asarray(P), 10_240)))
            times.append(time.time() - t0)
        dt = min(times)
        log(f"packed   {mb:4d} MB eq: {dt:6.2f}s = {mb/dt:7.1f} MB/s-eq "
            f"(wire {P.nbytes/1e6:.0f} MB)")

    # dependent-dispatch chain (kinship pattern): donated accumulator
    from mixmogam_tpu.ops.kinship import _ibs_int8_update

    C = rng.integers(0, 2, size=(32_768, 10_240)).astype(np.int8)
    Cd = jnp.asarray(C)
    jax.block_until_ready(Cd)
    S = jnp.zeros((10_240, 10_240), dtype=jnp.int32)
    S = _ibs_int8_update(S, Cd, 1)  # compile
    jax.block_until_ready(S)
    t0 = time.time()
    for _ in range(4):
        S = _ibs_int8_update(S, Cd, 1)
    jax.block_until_ready(S)
    dt = (time.time() - t0) / 4
    ops = 2 * 32_768 * 10_240 * 10_240
    log(f"int8 gram (device-resident tile): {dt:.3f}s/chunk = "
        f"{ops/dt/1e12:.1f} TOPS")

    # full streamed-chunk cycle raw vs packed, one process
    for label, ship in (("raw", lambda c: jnp.asarray(c)),
                        ("pack", lambda c: unpack_2bit_device(
                            jnp.asarray(native.pack_2bit(c)), 10_240))):
        S = jnp.zeros((10_240, 10_240), dtype=jnp.int32)
        S = _ibs_int8_update(S, ship(C), 1)
        jax.block_until_ready(S)
        t0 = time.time()
        for _ in range(4):
            S = _ibs_int8_update(S, ship(C), 1)
        jax.block_until_ready(S)
        dt = (time.time() - t0) / 4
        log(f"kinship chunk cycle ({label}): {dt:.2f}s/chunk "
            f"({C.nbytes/1e6:.0f} MB tile)")


if __name__ == "__main__":
    main()
