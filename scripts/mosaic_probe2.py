"""Incrementally build the fused rotate-scan kernel to find what kills
the remote Mosaic toolchain; print FULL error text on first failure.
Usage: timeout 1200 python scripts/mosaic_probe2.py
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    log(f"backend={jax.default_backend()}")
    np.asarray(jnp.zeros(8))

    rng = np.random.default_rng(0)
    TM, NB, QP = 128, 128, 128
    Mp, n = 256, 256
    G = jnp.asarray(rng.integers(0, 2, size=(Mp, n), dtype=np.int8))
    Wb = [jnp.asarray(rng.normal(size=(n, n)).astype(np.float32)
                      ).astype(jnp.bfloat16) for _ in range(3)]
    yres = jnp.asarray(rng.normal(size=(1, n)).astype(np.float32))
    Q0 = jnp.asarray(rng.normal(size=(n, QP)).astype(np.float32))
    scal = jnp.asarray([1.0, 10.0], jnp.float32)

    grid = (Mp // TM, n // NB, n // NB)

    def specs():
        ins = [pl.BlockSpec((TM, NB), lambda i, j, k, s: (i, k),
                            memory_space=pltpu.VMEM)]
        for _ in range(3):
            ins.append(pl.BlockSpec((NB, NB), lambda i, j, k, s: (k, j),
                                    memory_space=pltpu.VMEM))
        ins += [pl.BlockSpec((1, NB), lambda i, j, k, s: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((NB, QP), lambda i, j, k, s: (j, 0),
                             memory_space=pltpu.VMEM)]
        return pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid, in_specs=ins,
            out_specs=pl.BlockSpec((4, TM), lambda i, j, k, s: (0, i),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((TM, NB), jnp.float32),
                            pltpu.VMEM((TM, 1), jnp.float32),
                            pltpu.VMEM((TM, 1), jnp.float32),
                            pltpu.VMEM((TM, QP), jnp.float32)])

    def run(name, kernel):
        try:
            r = pl.pallas_call(
                kernel, grid_spec=specs(),
                out_shape=jax.ShapeDtypeStruct((4, Mp), jnp.float32),
            )(scal, G, *Wb, yres, Q0)
            jax.block_until_ready(r)
            log(f"OK   {name}")
            return True
        except Exception:
            log(f"FAIL {name}:")
            tb = traceback.format_exc()
            log(tb[-2500:])
            return False

    def stage(level):
        def kernel(scal_ref, g_ref, w0, w1, w2, yres_ref, q0_ref, out_ref,
                   xs_acc, ss_acc, xy_acc, cc_acc):
            j = pl.program_id(1)
            k = pl.program_id(2)
            nj = pl.num_programs(1)
            nk = pl.num_programs(2)

            @pl.when((j == 0) & (k == 0))
            def _():
                ss_acc[:] = jnp.zeros_like(ss_acc)
                xy_acc[:] = jnp.zeros_like(xy_acc)
                cc_acc[:] = jnp.zeros_like(cc_acc)

            g = g_ref[:].astype(jnp.bfloat16)
            pxs = jnp.dot(g, w0[:], preferred_element_type=jnp.float32)
            pxs = pxs + jnp.dot(g, w1[:],
                                preferred_element_type=jnp.float32)
            pxs = pxs + jnp.dot(g, w2[:],
                                preferred_element_type=jnp.float32)
            xs_acc[:] = jnp.where(k == 0, pxs, xs_acc[:] + pxs)
            if level >= 2:
                cc_acc[:] += jnp.dot(pxs, q0_ref[:],
                                     preferred_element_type=jnp.float32)
                xy_acc[:] += jnp.sum(pxs * yres_ref[:], axis=1,
                                     keepdims=True)
            if level >= 3:
                @pl.when(k == nk - 1)
                def _():
                    xs = xs_acc[:]
                    ss_acc[:] += jnp.sum(xs * xs, axis=1, keepdims=True)
            if level >= 4:
                @pl.when((j == nj - 1) & (k == nk - 1))
                def _():
                    rss0 = scal_ref[0]
                    dof = scal_ref[1]
                    ss = ss_acc[:][:, 0]
                    xy = xy_acc[:][:, 0]
                    cc = cc_acc[:]
                    xx = ss - jnp.sum(cc * cc, axis=1)
                    eps = 100.0 * jnp.finfo(jnp.float32).eps
                    tiny = jnp.finfo(jnp.float32).tiny
                    mask = xx > eps * jnp.maximum(ss, tiny)
                    xx_safe = jnp.where(mask, xx, 1.0)
                    expl = jnp.where(
                        mask, jnp.minimum(xy * xy / xx_safe, rss0), 0.0)
                    rss1 = jnp.maximum(rss0 - expl, tiny)
                    out_ref[0, :] = jnp.where(mask, expl * dof / rss1, 0.0)
                    out_ref[1, :] = jnp.where(mask, xy / xx_safe, 0.0)
                    out_ref[2, :] = jnp.where(mask, expl / rss0, 0.0)
                    out_ref[3, :] = mask.astype(jnp.float32)
            else:
                @pl.when((j == nj - 1) & (k == nk - 1))
                def _():
                    out_ref[:] = jnp.zeros_like(out_ref)

            del nj
        return kernel

    for lvl in (1, 2, 3, 4):
        if not run(f"stage{lvl}", stage(lvl)):
            break


if __name__ == "__main__":
    main()
