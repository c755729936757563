"""Bisect which Pallas constructs crash this image's remote Mosaic
toolchain (HTTP 500). Each case is a minimal kernel exercising ONE
construct. Usage: timeout 1200 python scripts/mosaic_probe.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(*a):
    print(*a, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    log(f"backend={jax.default_backend()}")
    np.asarray(jnp.zeros(8))
    X = jnp.asarray(np.random.default_rng(0).normal(
        size=(512, 512)).astype(np.float32))
    W = jnp.asarray(np.random.default_rng(1).normal(
        size=(512, 512)).astype(np.float32))

    def attempt(name, fn):
        try:
            r = fn()
            jax.block_until_ready(r)
            log(f"OK   {name}")
        except Exception as e:  # noqa: BLE001
            log(f"FAIL {name}: {type(e).__name__}: {str(e)[:90]}")

    # (a) 3-D grid, no prefetch, trivial dot
    def k_a(x_ref, w_ref, o_ref):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        o_ref[:] += jnp.dot(x_ref[:], w_ref[:],
                            preferred_element_type=jnp.float32)

    attempt("3D grid plain", lambda: pl.pallas_call(
        k_a, grid=(2, 2, 2),
        in_specs=[pl.BlockSpec((256, 256), lambda i, j, k: (i, k)),
                  pl.BlockSpec((256, 256), lambda i, j, k: (k, j))],
        out_specs=pl.BlockSpec((256, 256), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((512, 512), jnp.float32))(X, W))

    # (b) 3-D grid + scalar prefetch
    def k_b(s_ref, x_ref, w_ref, o_ref):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        o_ref[:] += s_ref[0] * jnp.dot(x_ref[:], w_ref[:],
                                       preferred_element_type=jnp.float32)

    attempt("3D grid + prefetch", lambda: pl.pallas_call(
        k_b,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(2, 2, 2),
            in_specs=[
                pl.BlockSpec((256, 256), lambda i, j, k, s: (i, k)),
                pl.BlockSpec((256, 256), lambda i, j, k, s: (k, j))],
            out_specs=pl.BlockSpec((256, 256),
                                   lambda i, j, k, s: (i, j))),
        out_shape=jax.ShapeDtypeStruct((512, 512), jnp.float32))(
        jnp.ones(2, jnp.float32), X, W))

    # (c) compound pl.when condition
    def k_c(x_ref, w_ref, o_ref):
        j = pl.program_id(1)
        k = pl.program_id(2)

        @pl.when((j == 0) & (k == 0))
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        o_ref[:] += jnp.dot(x_ref[:], w_ref[:],
                            preferred_element_type=jnp.float32)

    attempt("compound when", lambda: pl.pallas_call(
        k_c, grid=(2, 2, 2),
        in_specs=[pl.BlockSpec((256, 256), lambda i, j, k: (i, k)),
                  pl.BlockSpec((256, 256), lambda i, j, k: (k, j))],
        out_specs=pl.BlockSpec((256, 256), lambda i, j, k: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float32))(X, W))

    # (d) where(k==0, ...) scratch accumulate
    def k_d(x_ref, w_ref, o_ref, acc):
        k = pl.program_id(2)
        p = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
        acc[:] = jnp.where(k == 0, p, acc[:] + p)

        @pl.when(k == 1)
        def _():
            o_ref[:] = acc[:]

    attempt("where-scratch", lambda: pl.pallas_call(
        k_d, grid=(2, 2, 2),
        in_specs=[pl.BlockSpec((256, 256), lambda i, j, k: (i, k)),
                  pl.BlockSpec((256, 256), lambda i, j, k: (k, j))],
        out_specs=pl.BlockSpec((256, 256), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((512, 512), jnp.float32),
        scratch_shapes=[pltpu.VMEM((256, 256), jnp.float32)])(X, W))

    # (e) bf16 cast + two dots summed
    Xb = X.astype(jnp.bfloat16)
    Wb = W.astype(jnp.bfloat16)

    def k_e(x_ref, w0_ref, w1_ref, o_ref):
        g = x_ref[:].astype(jnp.bfloat16)
        o_ref[:] = (jnp.dot(g, w0_ref[:],
                            preferred_element_type=jnp.float32)
                    + jnp.dot(g, w1_ref[:],
                              preferred_element_type=jnp.float32))

    attempt("two bf16 dots", lambda: pl.pallas_call(
        k_e, grid=(2,),
        in_specs=[pl.BlockSpec((256, 512), lambda i: (i, 0)),
                  pl.BlockSpec((512, 512), lambda i: (0, 0)),
                  pl.BlockSpec((512, 512), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((256, 512), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((512, 512), jnp.float32))(
        X, Wb, Wb))

    # (f) int8 input cast to bf16 then dot
    Xi = jnp.asarray(np.random.default_rng(2).integers(
        0, 2, size=(512, 512), dtype=np.int8))

    def k_f(x_ref, w_ref, o_ref):
        g = x_ref[:].astype(jnp.bfloat16)
        o_ref[:] = jnp.dot(g, w_ref[:], preferred_element_type=jnp.float32)

    attempt("int8->bf16 dot", lambda: pl.pallas_call(
        k_f, grid=(2,),
        in_specs=[pl.BlockSpec((256, 512), lambda i: (i, 0)),
                  pl.BlockSpec((512, 512), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((256, 512), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((512, 512), jnp.float32))(Xi, Wb))

    # (g) out block revisited with index map ignoring inner axes
    def k_g(x_ref, w_ref, o_ref, acc):
        j = pl.program_id(1)
        k = pl.program_id(2)
        p = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
        acc[:] = jnp.where((j == 0) & (k == 0), p, acc[:] + p)

        @pl.when((j == 1) & (k == 1))
        def _():
            o_ref[:] = acc[:]

    attempt("out ignores j,k", lambda: pl.pallas_call(
        k_g, grid=(2, 2, 2),
        in_specs=[pl.BlockSpec((256, 256), lambda i, j, k: (i, k)),
                  pl.BlockSpec((256, 256), lambda i, j, k: (k, j))],
        out_specs=pl.BlockSpec((256, 256), lambda i, j, k: (0, i)),
        out_shape=jax.ShapeDtypeStruct((256, 512), jnp.float32),
        scratch_shapes=[pltpu.VMEM((256, 256), jnp.float32)])(X, W))


if __name__ == "__main__":
    main()
