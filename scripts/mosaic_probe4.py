"""With the package precision pin ACTIVE, which in-kernel dot dtypes /
explicit precisions compile? Usage: timeout 900 python scripts/mosaic_probe4.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import mixmogam_tpu.ops  # noqa: F401  (activates the 'highest' pin)


def log(*a):
    print(*a, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    log(f"backend={jax.default_backend()} "
        f"pin={jax.config.jax_default_matmul_precision}")
    np.asarray(jnp.zeros(8))
    rng = np.random.default_rng(0)
    Xf = jnp.asarray(rng.normal(size=(256, 256)).astype(np.float32))
    Xb = Xf.astype(jnp.bfloat16)
    Xi = jnp.asarray(rng.integers(0, 2, (256, 256), dtype=np.int8))

    def attempt(name, a, b, prec):
        def kern(x_ref, w_ref, o_ref):
            o_ref[:] = jax.lax.dot_general(
                x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32
                if a.dtype != jnp.int8 else jnp.int32,
                precision=prec).astype(o_ref.dtype)
        try:
            r = pl.pallas_call(
                kern, grid=(1,),
                in_specs=[pl.BlockSpec((256, 256), lambda i: (0, 0)),
                          pl.BlockSpec((256, 256), lambda i: (0, 0))],
                out_specs=pl.BlockSpec((256, 256), lambda i: (0, 0)),
                out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float32),
            )(a, b)
            jax.block_until_ready(r)
            log(f"OK   {name}")
        except Exception as e:  # noqa: BLE001
            msg = str(e)
            key = ("Bad lhs type" if "Bad lhs type" in msg
                   else msg.splitlines()[0][:80] if msg else type(e).__name__)
            log(f"FAIL {name}: {key}")

    P = jax.lax.Precision
    attempt("bf16 x bf16, prec=None(highest)", Xb, Xb, None)
    attempt("bf16 x bf16, prec=DEFAULT", Xb, Xb, P.DEFAULT)
    attempt("f32  x f32,  prec=None(highest)", Xf, Xf, None)
    attempt("f32  x f32,  prec=DEFAULT", Xf, Xf, P.DEFAULT)
    attempt("f32  x f32,  prec=HIGHEST", Xf, Xf, P.HIGHEST)
    attempt("int8 x int8, prec=None(highest)", Xi, Xi, None)
    attempt("int8 x int8, prec=DEFAULT", Xi, Xi, P.DEFAULT)


if __name__ == "__main__":
    main()
