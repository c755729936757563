"""One-process TPU tuning sweep for the scan rotation matmul and the
Pallas kinship kernel (run manually; results land in docs/PERFORMANCE.md).

The scan's hot op is Xs = G @ W, (M,n)x(n,n) fp32. The v5e MXU is a bf16
systolic array: an fp32 matmul is emulated by multiple bf16 passes
(precision DEFAULT/HIGH/HIGHEST = 1/3/6 passes). Binary/diploid genotype
dosages {0,1,2} are EXACT in bf16, so splitting only W into hi+lo bf16
halves (W = hi + lo, fp32 accumulation) buys near-fp32 accuracy at
2 bf16 passes. This sweep measures every variant's throughput and its
F-stat/p-value deviation from the fp32-HIGHEST reference.

Usage:  timeout 1500 python scripts/scan_tuning.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(*a):
    print(*a, flush=True)


def timed_pipelined(fn, *args, reps=8):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    outs = [fn(*args) for _ in range(reps)]
    jax.block_until_ready(outs)
    return (time.time() - t0) / reps, out


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from mixmogam_tpu.ops.reml import fit_null_model
    from mixmogam_tpu.ops.scan import build_rotated_null
    from mixmogam_tpu.ops.stats import f_sf_host
    from mixmogam_tpu.oracle.kinship import scale_k

    log(f"backend={jax.default_backend()}")
    n = int(os.environ.get("TUNE_N", 1024))
    M = int(os.environ.get("TUNE_M", 262_144))
    cache = os.path.expanduser(f"~/.cache/mixmogam_bench/sim_{n}x{M}.npz")
    if os.path.exists(cache):
        with np.load(cache) as z:
            G, y = z["G"], z["y"]
    else:
        from mixmogam_tpu.data.simulate import (simulate_genotypes,
                                                simulate_phenotype)

        G, _, _ = simulate_genotypes(n, M, seed=0)
        y, _ = simulate_phenotype(G, h2=0.5, n_causal=20, seed=0)

    t0 = time.time()
    np.asarray(jnp.zeros(8))
    log(f"claim: {time.time()-t0:.1f}s")

    from mixmogam_tpu.ops.kinship import _ibs_int8_update

    S = jnp.zeros((n, n), dtype=jnp.int32)
    for s in range(0, M, 65536):
        S = _ibs_int8_update(S, jnp.asarray(G[s:s + 65536]), 65536)
    K = scale_k(np.asarray(S).astype(np.float64) / M)
    null = fit_null_model(y.astype(np.float32), np.ones((n, 1), np.float32),
                          K=K.astype(np.float32))
    rot = build_rotated_null(null)
    W32 = jnp.asarray(rot.W, jnp.float32)
    W_hi = W32.astype(jnp.bfloat16)
    W_lo = (W32 - W_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    G8 = jax.device_put(jnp.asarray(G))           # int8 (M, n)
    G32 = jax.device_put(jnp.asarray(G.astype(np.float32)))
    G16 = jax.device_put(jnp.asarray(G).astype(jnp.bfloat16))
    jax.block_until_ready((G8, G32, G16))

    TILE = min(65_536, M)

    def epilogue(Xs, rot):
        c = Xs @ rot.Q0
        xy = Xs @ rot.y_res
        ss = jnp.sum(Xs * Xs, axis=1)
        xx = ss - jnp.sum(c * c, axis=1)
        eps = 100.0 * jnp.finfo(jnp.float32).eps
        mask = xx > eps * jnp.maximum(ss, jnp.finfo(jnp.float32).tiny)
        xx_s = jnp.where(mask, xx, 1.0)
        expl = jnp.where(mask, jnp.minimum(xy * xy / xx_s, rot.rss0), 0.0)
        rss1 = jnp.maximum(rot.rss0 - expl, jnp.finfo(jnp.float32).tiny)
        return jnp.where(mask, expl * jnp.asarray(rot.dof, jnp.float32)
                         / rss1, 0.0), mask

    def make_variant(rotate):
        @jax.jit
        def run(Gd, rot):
            Mv = Gd.shape[0]
            T = Mv // TILE
            tiles = Gd.reshape(T, TILE, n)

            def one(t):
                Xs = rotate(t, rot)
                return epilogue(Xs, rot)

            f, mask = lax.map(one, tiles)
            return f.reshape(-1), mask.reshape(-1)

        return run

    variants = {}
    for prec in ("DEFAULT", "HIGH", "HIGHEST"):
        p = getattr(lax.Precision, prec)
        variants[f"f32 prec={prec}"] = (
            make_variant(lambda t, r, p=p: lax.dot_general(
                t.astype(jnp.float32), W32, (((1,), (0,)), ((), ())),
                precision=p, preferred_element_type=jnp.float32)), G32)
        variants[f"int8G f32 prec={prec}"] = (
            make_variant(lambda t, r, p=p: lax.dot_general(
                t.astype(jnp.float32), W32, (((1,), (0,)), ((), ())),
                precision=p, preferred_element_type=jnp.float32)), G8)
    variants["bf16 1-pass"] = (
        make_variant(lambda t, r: lax.dot_general(
            t.astype(jnp.bfloat16), W_hi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)), G16)
    variants["bf16x2 split-W"] = (
        make_variant(lambda t, r: lax.dot_general(
            t.astype(jnp.bfloat16), W_hi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
            + lax.dot_general(
            t.astype(jnp.bfloat16), W_lo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)), G16)
    variants["int8G bf16x2"] = (
        make_variant(lambda t, r: lax.dot_general(
            t.astype(jnp.bfloat16), W_hi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
            + lax.dot_general(
            t.astype(jnp.bfloat16), W_lo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)), G8)

    flops = 2.0 * M * n * n
    ref_f = None
    ref_p = None
    for name, (fn, Gd) in variants.items():
        dt, (f, mask) = timed_pipelined(fn, Gd, rot)
        f_np = np.asarray(f, dtype=np.float64)
        p_np = f_sf_host(f_np, 1.0, float(np.asarray(rot.dof)))
        if name == "f32 prec=HIGHEST":
            ref_f, ref_p = f_np, p_np
        if ref_f is None:
            df = dp = np.nan
        else:
            nz = ref_f > 0
            df = float(np.max(np.abs(f_np[nz] - ref_f[nz])
                              / np.maximum(ref_f[nz], 1e-30)))
            dp = float(np.max(np.abs(p_np - ref_p)))
        log(f"{name:24s} {dt*1e3:7.2f} ms/scan {M/dt/1e6:7.1f}M tests/s "
            f"{flops/dt/1e12:6.1f} TFLOP/s  relF={df:.2e} |dp|={dp:.2e}")

    # re-run reference parity now that ref is set (first variants ran
    # before the reference) — quick second pass, no timing
    log("-- parity second pass (vs f32 prec=HIGHEST) --")
    for name, (fn, Gd) in variants.items():
        f, mask = fn(Gd, rot)
        f_np = np.asarray(f, dtype=np.float64)
        p_np = f_sf_host(f_np, 1.0, float(np.asarray(rot.dof)))
        nz = ref_f > 0
        df = float(np.max(np.abs(f_np[nz] - ref_f[nz])
                          / np.maximum(ref_f[nz], 1e-30)))
        dp = float(np.max(np.abs(p_np - ref_p)))
        log(f"{name:24s} relF={df:.2e} |dp|={dp:.2e}")

    # ---- pre-rotated scans: XLA vs Pallas fused ----
    from mixmogam_tpu.ops.pallas_scan import pallas_scan_stats
    from mixmogam_tpu.ops.scan import emmax_scan_all

    G_rot = None
    try:
        G_rot = G32 @ jnp.asarray(null.U, jnp.float32)
        jax.block_until_ready(G_rot)
        dt, _ = timed_pipelined(
            lambda g: emmax_scan_all(g, rot, tile=TILE, pre_rotated=True),
            G_rot)
        log(f"pre-rotated XLA          {dt*1e3:7.2f} ms/scan "
            f"{M/dt/1e6:7.1f}M tests/s (bandwidth-bound)")
        for tm, tn in ((256, 512), (512, 512), (1024, 512), (256, 1024),
                       (512, 1024)):
            try:
                dt, _ = timed_pipelined(
                    lambda g, tm=tm, tn=tn: pallas_scan_stats(
                        g, rot, tm=tm, tn=tn), G_rot)
                log(f"pre-rotated Pallas {tm}x{tn}: {dt*1e3:7.2f} ms "
                    f"{M/dt/1e6:7.1f}M tests/s")
            except Exception as e:  # noqa: BLE001
                log(f"pre-rotated Pallas {tm}x{tn}: FAILED {type(e).__name__}")
    finally:
        del G_rot

    # ---- Pallas kinship tile sweep vs XLA int8 gram ----
    from mixmogam_tpu.ops.pallas_kinship import _ibs_gram_padded

    kin_flops = 2.0 * M * n * n

    @jax.jit
    def xla_gram(Z):
        return lax.dot_general(Z, Z, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)

    dt, _ = timed_pipelined(xla_gram, G8, reps=4)
    log(f"kinship XLA int8 gram:    {dt*1e3:7.2f} ms "
        f"{kin_flops/dt/1e12:6.1f} TOP/s")
    for tm, tn in ((512, 256), (1024, 256), (2048, 256), (512, 512),
                   (1024, 512), (2048, 512), (4096, 256), (4096, 512)):
        try:
            dt, _ = timed_pipelined(
                lambda z, tm=tm, tn=tn: _ibs_gram_padded(z, tm, tn),
                G8, reps=4)
            log(f"kinship Pallas {tm:5d}x{tn:4d}: {dt*1e3:7.2f} ms "
                f"{kin_flops/dt/1e12:6.1f} TOP/s")
        except Exception as e:  # noqa: BLE001
            log(f"kinship Pallas {tm}x{tn}: FAILED {type(e).__name__}: "
                f"{str(e)[:120]}")


if __name__ == "__main__":
    main()
