"""Round 5 (VERDICT r4 #1 + #7): measured utilization accounting for the
fused unpack+rotate int8 scan, in ONE process (tunnel variance makes
cross-process comparison meaningless — CLAUDE.md).

Phases (campaign genome, 1,048,576 x 10,240, packed resident):
  ceiling   single int8 plane dot on a resident pre-unpacked tile
            (the in-process MXU ceiling at the scan's exact shape)
  dots3     3 plane dots + minimal reduce (no recombine/epilogue)
  ship      the shipped emmax_scan_packed int8x3 (full 1M)
  horner    recombine variant: int32-exact low-digit pair + one f32 axpy
  concat    recombine variant: ONE wide (n, 3n) int8 dot + blocked sum
  tiles     tile sweep {8192, 16384, 32768, 65536} on the shipped form
  epi       pre-rotated epilogue-only rate (accounting term)
  pallas    pallas_rotate_scan_int8 vs XLA int8x3 on a 131k-row raw
            int8 slice; pallas_scan_stats vs XLA pre-rotated (#7)

Writes docs/int8_utilization_r5.json. Usage:
  timeout 2400 python scripts/int8_utilization_r5.py
"""

import functools
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CACHE = os.path.expanduser("~/.cache/mixmogam_bench")
N = 10_240
M = 1_048_576
TILE = 16_384


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def timeit(fn, *args, reps=3):
    """min wall over reps (first call assumed already compiled+warm)."""
    import jax

    best = np.inf
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(fn(*args))
        best = min(best, time.time() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from mixmogam_tpu.models.resident import ResidentGenome, emmax_scan_packed
    from mixmogam_tpu.ops.pack2 import unpack_2bit_device
    from mixmogam_tpu.ops.reml import fit_null_model
    from mixmogam_tpu.ops.scan import build_rotated_null, emmax_scan_stats

    log(f"backend={jax.default_backend()}")
    t0 = time.time()
    np.asarray(jnp.zeros(8))
    log(f"claim: {time.time()-t0:.1f}s")

    G = np.load(os.path.join(CACHE, f"simbig_{N}x{M}.npy"), mmap_mode="r")
    with np.load(os.path.join(CACHE, f"simbig_{N}x{M}_y.npz")) as z:
        y = z["y"]
    t0 = time.time()
    rg = ResidentGenome.from_source(
        G, cache_path=os.path.join(CACHE, f"packed_{N}x{M}.bin"),
        trust_cache=True)
    log(f"packed upload: {time.time()-t0:.1f}s")
    with np.load(os.path.join(CACHE, f"eig_{N}x{M}.npz")) as z:
        phi, U = z["phi"], z["U"]
    null = fit_null_model(y.astype(np.float32), np.ones((N, 1), np.float32),
                          eig_k=(phi, U))
    rot = build_rotated_null(null, rotate_dtype="int8x3")
    jax.block_until_ready(rot.W)
    DEFAULT = jax.lax.Precision.DEFAULT
    eff_flops = 2.0 * M * N * N          # useful flops of ONE rotation
    res = {}

    # ---- ceiling: single plane dot at the scan shape, resident int8 ----
    T0 = unpack_2bit_device(rg.packed[:TILE], N)
    T0 = jax.block_until_ready(jnp.asarray(T0))
    W0 = rot.W[0]

    @jax.jit
    def one_dot(T0, W0):
        A = jnp.dot(T0, W0, preferred_element_type=jnp.int32,
                    precision=DEFAULT)
        return jnp.sum(A, axis=1)        # minimal readout

    jax.block_until_ready(one_dot(T0, W0))
    # queue 8 async then block once: the ~27 ms RTT otherwise dominates
    t0 = time.time()
    outs = [one_dot(T0, W0) for _ in range(8)]
    jax.block_until_ready(outs)
    dt = (time.time() - t0) / 8
    res["ceiling_single_dot_tops"] = 2.0 * TILE * N * N / dt / 1e12
    log(f"ceiling single int8 dot: {dt*1e3:.2f} ms/tile = "
        f"{res['ceiling_single_dot_tops']:.0f} int8 TOPS")

    # ---- whole-genome structured variants ----
    rb = rg.packed.shape[1]

    def scan_variant(mode):
        @functools.partial(jax.jit, static_argnames=("mode",))
        def run(packed, rot, mode: str):
            T = packed.shape[0] // TILE
            tiles = packed.reshape(T, TILE, rb)
            W, ws = rot.W, rot.w_scale
            dt_ = rot.sd.dtype

            def kern(pt):
                Gt = unpack_2bit_device(pt, N)
                A0 = jnp.dot(Gt, W[0], preferred_element_type=jnp.int32,
                             precision=DEFAULT)
                A1 = jnp.dot(Gt, W[1], preferred_element_type=jnp.int32,
                             precision=DEFAULT)
                A2 = jnp.dot(Gt, W[2], preferred_element_type=jnp.int32,
                             precision=DEFAULT)
                if mode == "dots3":
                    return jnp.sum(A0 + A1 + A2, axis=1)
                if mode == "horner":
                    # A0 + 256*A1 stays int32-exact (|.| < 2^31); one
                    # int32->f32 conversion saved vs the shipped 3-term
                    B = A0 + 256 * A1
                    Xs = (B.astype(dt_) + 65536.0 * A2.astype(dt_)) \
                        * ws[None, :].astype(dt_)
                    from mixmogam_tpu.ops.scan import scan_epilogue

                    return scan_epilogue(Xs, rot)["f_stats"]
                raise ValueError(mode)

            return jax.lax.map(kern, tiles)

        return lambda: run(rg.packed, rot, mode=mode)

    for mode in ("dots3", "horner"):
        fn = scan_variant(mode)
        t0 = time.time()
        jax.block_until_ready(fn())
        log(f"{mode}: compile+first {time.time()-t0:.1f}s")
        dtv = timeit(lambda: fn(), reps=2)
        res[f"{mode}_s"] = dtv
        res[f"{mode}_tops"] = 3 * eff_flops / dtv / 1e12
        log(f"{mode}: {dtv:.2f}s = {M/dtv:,.0f} tests/s, "
            f"{res[f'{mode}_tops']:.0f} int8 TOPS")

    # concat: one wide (n, 3n) int8 dot, then blocked recombine
    Wc = jax.block_until_ready(
        jnp.concatenate([rot.W[0], rot.W[1], rot.W[2]], axis=1))

    @jax.jit
    def run_concat(packed, Wc, rot):
        T = packed.shape[0] // TILE
        tiles = packed.reshape(T, TILE, rb)
        ws = rot.w_scale
        dt_ = rot.sd.dtype

        def kern(pt):
            Gt = unpack_2bit_device(pt, N)
            A = jnp.dot(Gt, Wc, preferred_element_type=jnp.int32,
                        precision=DEFAULT)
            A = A.reshape(TILE, 3, N)
            B = A[:, 0] + 256 * A[:, 1]
            Xs = (B.astype(dt_) + 65536.0 * A[:, 2].astype(dt_)) \
                * ws[None, :].astype(dt_)
            from mixmogam_tpu.ops.scan import scan_epilogue

            return scan_epilogue(Xs, rot)["f_stats"]

        return jax.lax.map(kern, tiles)

    t0 = time.time()
    jax.block_until_ready(run_concat(rg.packed, Wc, rot))
    log(f"concat: compile+first {time.time()-t0:.1f}s")
    dtv = timeit(lambda: run_concat(rg.packed, Wc, rot), reps=2)
    res["concat_s"] = dtv
    res["concat_tops"] = 3 * eff_flops / dtv / 1e12
    log(f"concat: {dtv:.2f}s = {M/dtv:,.0f} tests/s, "
        f"{res['concat_tops']:.0f} int8 TOPS")

    # ---- shipped form + tile sweep ----
    # (no 65536: per-map-step working set = Xs f32 + 3 int32 planes at
    # that tile = ~11 GB on top of the resident 2.7 GB — OOM territory)
    for tl in (8192, 16384, 32768):
        fn = lambda: emmax_scan_packed(rg.packed, rot, N, tl)["f_stats"]
        t0 = time.time()
        jax.block_until_ready(fn())
        log(f"ship tile={tl}: compile+first {time.time()-t0:.1f}s")
        dtv = timeit(lambda: fn(), reps=2)
        res[f"ship_tile{tl}_s"] = dtv
        res[f"ship_tile{tl}_tops"] = 3 * eff_flops / dtv / 1e12
        log(f"ship tile={tl}: {dtv:.2f}s = {M/dtv:,.0f} tests/s, "
            f"{res[f'ship_tile{tl}_tops']:.0f} int8 TOPS")

    # ---- epilogue accounting: pre-rotated elementwise scan, 1 tile ----
    Tr = jax.block_until_ready(T0.astype(jnp.float32))

    @jax.jit
    def epi(Tr, rot):
        return emmax_scan_stats(Tr, rot, pre_rotated=True)["f_stats"]

    jax.block_until_ready(epi(Tr, rot))
    t0 = time.time()
    outs = [epi(Tr, rot) for _ in range(8)]
    jax.block_until_ready(outs)
    res["epilogue_ms_per_tile"] = (time.time() - t0) / 8 * 1e3
    log(f"epilogue-only (pre-rotated tile): "
        f"{res['epilogue_ms_per_tile']:.2f} ms/tile")

    # ---- #7: Pallas vs XLA, same process, 131k-row slice ----
    del T0, Tr, Wc
    Ms = 131_072
    G_sl = jax.block_until_ready(
        unpack_2bit_device(rg.packed[:Ms], N).astype(jnp.int8))
    from mixmogam_tpu.ops.pallas_scan import (pallas_rotate_scan_int8,
                                              pallas_scan_stats)
    from mixmogam_tpu.ops.scan import emmax_scan_all

    @jax.jit
    def xla_int8(G_sl, rot):
        return emmax_scan_all(G_sl, rot, tile=TILE)["f_stats"]

    t0 = time.time()
    f_x = jax.block_until_ready(xla_int8(G_sl, rot))
    log(f"xla int8x3 slice: compile+first {time.time()-t0:.1f}s")
    dt_x = timeit(lambda: xla_int8(G_sl, rot), reps=3)
    res["slice_xla_int8x3_s"] = dt_x
    log(f"XLA int8x3 {Ms} rows: {dt_x*1e3:.1f} ms "
        f"= {Ms/dt_x/1e3:,.0f}k tests/s")

    for tm, nb in ((256, 512), (512, 1024)):
        try:
            t0 = time.time()
            f_p = jax.block_until_ready(
                pallas_rotate_scan_int8(G_sl, rot, tm=tm, nb=nb)["f_stats"])
            log(f"pallas int8 tm={tm} nb={nb}: compile+first "
                f"{time.time()-t0:.1f}s")
            dt_p = timeit(
                lambda: pallas_rotate_scan_int8(G_sl, rot, tm=tm,
                                                nb=nb)["f_stats"], reps=3)
            err = float(np.max(np.abs(np.asarray(f_p) - np.asarray(f_x))))
            res[f"slice_pallas_int8_tm{tm}_nb{nb}_s"] = dt_p
            res[f"slice_pallas_int8_tm{tm}_nb{nb}_maxerr"] = err
            log(f"Pallas int8 tm={tm} nb={nb}: {dt_p*1e3:.1f} ms "
                f"(XLA {dt_x*1e3:.1f}), max|df|={err:.2e}")
        except Exception as e:  # Mosaic/VMEM limits: record, continue
            log(f"pallas int8 tm={tm} nb={nb} FAILED: {e}")
            res[f"slice_pallas_int8_tm{tm}_nb{nb}_s"] = None

    # pre-rotated comparison (#7's repeated-scan workload)
    G_rot_sl = jax.block_until_ready(
        (G_sl.astype(jnp.float32) @ jnp.asarray(U, jnp.float32)))
    rot_ex = build_rotated_null(null)

    @jax.jit
    def xla_pre(G_rot_sl, rot_ex):
        return emmax_scan_all(G_rot_sl, rot_ex, tile=TILE,
                              pre_rotated=True)["f_stats"]

    t0 = time.time()
    f_x2 = jax.block_until_ready(xla_pre(G_rot_sl, rot_ex))
    log(f"xla pre-rotated slice: compile+first {time.time()-t0:.1f}s")
    dt_x2 = timeit(lambda: xla_pre(G_rot_sl, rot_ex), reps=3)
    res["slice_xla_prerot_s"] = dt_x2
    log(f"XLA pre-rotated {Ms} rows: {dt_x2*1e3:.1f} ms "
        f"= {Ms/dt_x2/1e6:.2f}M tests/s")
    for tm, tn in ((256, 512), (512, 1024)):
        try:
            t0 = time.time()
            f_p2 = jax.block_until_ready(
                pallas_scan_stats(G_rot_sl, rot_ex, tm=tm,
                                  tn=tn)["f_stats"])
            log(f"pallas prerot tm={tm} tn={tn}: compile+first "
                f"{time.time()-t0:.1f}s")
            dt_p2 = timeit(
                lambda: pallas_scan_stats(G_rot_sl, rot_ex, tm=tm,
                                          tn=tn)["f_stats"], reps=3)
            err = float(np.max(np.abs(np.asarray(f_p2)
                                      - np.asarray(f_x2))))
            res[f"slice_pallas_prerot_tm{tm}_tn{tn}_s"] = dt_p2
            res[f"slice_pallas_prerot_tm{tm}_tn{tn}_maxerr"] = err
            log(f"Pallas prerot tm={tm} tn={tn}: {dt_p2*1e3:.1f} ms "
                f"(XLA {dt_x2*1e3:.1f}), max|df|={err:.2e}")
        except Exception as e:
            log(f"pallas prerot tm={tm} tn={tn} FAILED: {e}")
            res[f"slice_pallas_prerot_tm{tm}_tn{tn}_s"] = None

    res["spec_int8_tops"] = 394.0
    out_path = os.path.join(REPO, "docs", "int8_utilization_r5.json")
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    log(f"wrote {out_path}")
    log(json.dumps(res))


if __name__ == "__main__":
    main()
