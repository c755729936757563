"""Why does the int8 kinship gram run ~24 TOPS when the scan's int8
dots hit ~300 TOPS on the same image? Probes the gram layout space on
one resident tile (16384 x 10240 int8):

  v_dim00   dot_general contract dim0/dim0 (the kinship kernels' form)
  v_pret    pre-transposed lhs: (n, t) @ (t, n) standard layout
  v_tri     _gram_int8_tri (triangular strip-blocked)
  v_scan    the scan-shaped (t, n) @ (n, n) matmul for reference
  v_f32     f32 gram at HIGHEST (the would-be fallback)

Each timed over R blocking reps after a warmup (compare within THIS
process only — tunnel variance across processes is large, CLAUDE.md).
"""

import functools
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    from scripts.baseline_configs import claim_device

    import jax
    import jax.numpy as jnp

    claim_device()
    T, N = 16384, 10240
    rng = np.random.default_rng(0)
    C_host = rng.integers(0, 3, size=(T, N), dtype=np.int8)
    W_host = rng.integers(-127, 127, size=(N, N), dtype=np.int8)
    C = jnp.asarray(C_host)
    W = jnp.asarray(W_host)
    jax.block_until_ready((C, W))
    DEFAULT = jax.lax.Precision.DEFAULT
    flops_gram = 2.0 * T * N * N
    flops_scan = 2.0 * T * N * N

    @jax.jit
    def v_dim00(C):
        return jax.lax.dot_general(C, C, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32,
                                   precision=DEFAULT)

    @jax.jit
    def v_pret(C):
        Ct = C.T
        return jax.lax.dot_general(Ct, C, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32,
                                   precision=DEFAULT)

    @jax.jit
    def v_tri(C):
        from mixmogam_tpu.ops.kinship import _gram_int8_tri

        return _gram_int8_tri(jnp.zeros((N, N), jnp.int32), C, tn=512)

    @jax.jit
    def v_scan(C, W):
        return jax.lax.dot_general(C, W, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32,
                                   precision=DEFAULT)

    @jax.jit
    def v_f32(C):
        Cf = C.astype(jnp.float32)
        return jax.lax.dot_general(Cf, Cf, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)

    R = 4
    for name, fn, args, fl in [
        ("dim00 int8 gram", v_dim00, (C,), flops_gram),
        ("pre-T int8 gram", v_pret, (C,), flops_gram),
        ("tri int8 gram(tn=512)", v_tri, (C,), flops_gram * 0.56),
        ("scan-shape int8", v_scan, (C, W), flops_scan),
        ("f32 gram HIGHEST", v_f32, (C,), flops_gram),
    ]:
        try:
            out = fn(*args)
            jax.block_until_ready(out)
        except Exception as e:  # noqa: BLE001
            log(f"{name}: FAILED {type(e).__name__}: {e}")
            continue
        best = np.inf
        for _ in range(R):
            t0 = time.time()
            jax.block_until_ready(fn(*args))
            best = min(best, time.time() - t0)
        log(f"{name}: {best*1e3:8.1f} ms  -> {fl/best/1e12:6.1f} TOPS")


if __name__ == "__main__":
    main()
