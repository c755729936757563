"""D2H transport probe: kinship_warm_bench pinned the warm 1M-kinship
wall to the 420 MB int32 K device->host fetch through the tunnel. This
times fetch strategies. CAVEAT learned on the first run: jax Arrays
cache their host copy after one np.asarray — every rep must fetch a
FRESH device array or it times a no-op (3.7e6 "MB/s").

Measured (this file's history): whole-array fetch ~17-20 MB/s;
chunked-async (16 row blocks, copy_to_host_async on all, then collect)
~33 MB/s; 64 chunks regress (per-request overhead).
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N = 10240


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    np.asarray(jnp.zeros(8))
    log(f"claimed; backend={jax.default_backend()}")
    mb = N * N * 4 / 1e6

    @jax.jit
    def fresh(i):
        return jnp.full((N, N), i, dtype=jnp.int32)

    def timeit(name, fetch, reps=2):
        best = np.inf
        for i in range(reps):
            S = jax.block_until_ready(fresh(i + 1))
            t0 = time.time()
            out = fetch(S)
            dt = time.time() - t0
            best = min(best, dt)
            assert out.shape == (N, N)
        log(f"{name}: {best:6.2f}s = {mb/best:6.1f} MB/s")

    timeit("whole np.asarray", lambda S: np.asarray(S))

    def async_whole(S):
        S.copy_to_host_async()
        return np.asarray(S)

    timeit("async_whole", async_whole)

    def chunked(k):
        rows = N // k

        def fetch(S):
            parts = [jax.lax.slice_in_dim(S, i * rows, (i + 1) * rows,
                                          axis=0) for i in range(k)]
            parts = [jax.block_until_ready(p) for p in parts]
            for p in parts:
                p.copy_to_host_async()
            return np.concatenate([np.asarray(p) for p in parts], axis=0)

        return fetch

    for k in (8, 16, 32):
        timeit(f"chunk_{k} async", chunked(k))

    from mixmogam_tpu.ops.transfer import fetch_array

    timeit("ops.transfer.fetch_array", lambda S: fetch_array(S))


if __name__ == "__main__":
    main()
