"""Pallas TPU kernel: fused rotated-GLS F-test scan over PRE-ROTATED
genotype tiles (the BASELINE north star's 'fully vectorized rotated-GLS +
F-test kernel with no Python loop over markers').

STATUS — FROZEN REFERENCE KERNEL, NOT ROUTED (round-5 decision,
VERDICT r4 #7). Measured against XLA in one process at the flagship
shape (131,072 x 10,240, v5e — scripts/int8_utilization_r5.py,
docs/int8_utilization_r5.json):

  | workload                  | Pallas (best cfg) | XLA    | ratio |
  |---------------------------|-------------------|--------|-------|
  | int8x3 rotate+scan        | 357 ms            | 271 ms | 1.32x |
  | pre-rotated repeated scan | 54.3 ms           | 32.4 ms| 1.68x |

XLA's emitters win on both workloads this kernel targets (its fused
int8x3 form sustains 308-322 int8 TOPS — above every pure-matmul rate
measured on this image), so ops.scan/models.resident stay routed to
XLA. The kernel remains parity-tested (tests/test_kernels.py) as a
frozen probe; new tiers are NOT ported to it.

Fuses whiten (elementwise) + null-design projections (MXU) + row
reductions + the F epilogue into ONE kernel, with n-axis blocking so the
(TM, n) working set never leaves VMEM and partial sums accumulate in
scratch: per SNP row the kernel touches HBM exactly once (read its
rotated genotypes) and writes 4 floats. Grid (M-tiles, n-blocks), n-block
innermost.

Layout notes: Q0 is zero-padded to QPAD lanes (zero columns contribute
nothing); sd / y_res ride as (1, n) rows; rss0 and dof are SMEM scalars;
outputs are a (4, M) matrix [f, beta, var_perc, mask].
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QPAD = 128  # padded null-design width (lane-aligned)


def _scan_kernel(scal_ref, g_ref, sd_ref, yres_ref, q0_ref, out_ref,
                 ss_acc, xy_acc, cc_acc):
    k = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        ss_acc[:] = jnp.zeros_like(ss_acc)
        xy_acc[:] = jnp.zeros_like(xy_acc)
        cc_acc[:] = jnp.zeros_like(cc_acc)

    xs = g_ref[:] * sd_ref[:]                       # (TM, TN) whiten
    ss_acc[:] += jnp.sum(xs * xs, axis=1, keepdims=True)
    xy_acc[:] += jnp.sum(xs * yres_ref[:], axis=1, keepdims=True)
    cc_acc[:] += jnp.dot(xs, q0_ref[:], preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
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
        expl = jnp.where(mask, jnp.minimum(xy * xy / xx_safe, rss0), 0.0)
        rss1 = jnp.maximum(rss0 - expl, tiny)
        out_ref[0, :] = jnp.where(mask, expl * dof / rss1, 0.0)
        out_ref[1, :] = jnp.where(mask, xy / xx_safe, 0.0)
        out_ref[2, :] = jnp.where(mask, expl / rss0, 0.0)
        out_ref[3, :] = mask.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("tm", "tn", "interpret"))
def _scan_padded(G_rot, sd_row, yres_row, Q0p, scalars, tm: int, tn: int,
                 interpret: bool = False):
    Mp, np_ = G_rot.shape
    grid = (Mp // tm, np_ // tn)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tn), lambda i, k, s: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, k, s: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, k, s: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, QPAD), lambda i, k, s: (k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, tm), lambda i, k, s: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tm, 1), jnp.float32),
            pltpu.VMEM((tm, 1), jnp.float32),
            pltpu.VMEM((tm, QPAD), jnp.float32),
        ],
    )
    return pl.pallas_call(
        _scan_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((4, Mp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * np_ * (QPAD + 3),
            bytes_accessed=4 * Mp * np_ + 16 * Mp, transcendentals=0),
        interpret=interpret,
    )(scalars, G_rot, sd_row, yres_row, Q0p)


def _make_rotate_scan_kernel(num_parts: int):
    """Fused rotate+scan kernel factory: G tile x split-W bf16 parts ->
    whitened Xs accumulated in VMEM (never materialized to HBM) -> GLS
    epilogue. All MXU dots are UNCONDITIONAL (this image's Mosaic
    toolchain crashes on pl.when-predicated dots): the linear epilogue
    terms cc/xy accumulate from each k-step's PARTIAL Xs (they are
    linear in the k-partials), and only elementwise work runs under
    pl.when. Grid (i: M tiles, j: n_out blocks, k: n_in blocks)."""

    def kernel(scal_ref, g_ref, *rest):
        w_refs = rest[:num_parts]
        yres_ref, q0_ref, out_ref, xs_acc, ss_acc, xy_acc, cc_acc = \
            rest[num_parts:]
        j = pl.program_id(1)
        k = pl.program_id(2)
        nj = pl.num_programs(1)
        nk = pl.num_programs(2)

        @pl.when((j == 0) & (k == 0))
        def _():
            ss_acc[:] = jnp.zeros_like(ss_acc)
            xy_acc[:] = jnp.zeros_like(xy_acc)
            cc_acc[:] = jnp.zeros_like(cc_acc)

        g = g_ref[:].astype(jnp.bfloat16)           # (tm, nb)
        # bf16 dots need explicit precision=DEFAULT: the package-global
        # 'highest' pin otherwise stamps contract_precision<fp32>, which
        # Mosaic rejects ('Bad lhs type'); single-pass IS the split-W
        # semantics (fp32 accumulation via preferred_element_type)
        prec = jax.lax.Precision.DEFAULT
        pxs = jnp.dot(g, w_refs[0][:],
                      preferred_element_type=jnp.float32, precision=prec)
        for p in range(1, num_parts):
            pxs = pxs + jnp.dot(g, w_refs[p][:],
                                preferred_element_type=jnp.float32,
                                precision=prec)
        xs_acc[:] = jnp.where(k == 0, pxs, xs_acc[:] + pxs)
        # cc and xy are linear in the k-partials -> accumulate now
        # (unconditional dot); ss needs the COMPLETED Xs block
        cc_acc[:] += jnp.dot(pxs, q0_ref[:],
                             preferred_element_type=jnp.float32)
        xy_acc[:] += jnp.sum(pxs * yres_ref[:], axis=1, keepdims=True)

        @pl.when(k == nk - 1)
        def _():
            xs = xs_acc[:]
            ss_acc[:] += jnp.sum(xs * xs, axis=1, keepdims=True)

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
            expl = jnp.where(mask, jnp.minimum(xy * xy / xx_safe, rss0),
                             0.0)
            rss1 = jnp.maximum(rss0 - expl, tiny)
            out_ref[0, :] = jnp.where(mask, expl * dof / rss1, 0.0)
            out_ref[1, :] = jnp.where(mask, xy / xx_safe, 0.0)
            out_ref[2, :] = jnp.where(mask, expl / rss0, 0.0)
            out_ref[3, :] = mask.astype(jnp.float32)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("num_parts", "tm", "nb", "interpret"))
def _rotate_scan_padded(G, W_parts, yres_row, Q0p, scalars,
                        num_parts: int, tm: int, nb: int,
                        interpret: bool = False):
    Mp, np_in = G.shape
    grid = (Mp // tm, np_in // nb, np_in // nb)
    in_specs = [pl.BlockSpec((tm, nb), lambda i, j, k, s: (i, k),
                             memory_space=pltpu.VMEM)]
    for _ in range(num_parts):
        in_specs.append(pl.BlockSpec((nb, nb), lambda i, j, k, s: (k, j),
                                     memory_space=pltpu.VMEM))
    in_specs += [
        pl.BlockSpec((1, nb), lambda i, j, k, s: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nb, QPAD), lambda i, j, k, s: (j, 0),
                     memory_space=pltpu.VMEM),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((4, tm), lambda i, j, k, s: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tm, nb), jnp.float32),
            pltpu.VMEM((tm, 1), jnp.float32),
            pltpu.VMEM((tm, 1), jnp.float32),
            pltpu.VMEM((tm, QPAD), jnp.float32),
        ],
    )
    return pl.pallas_call(
        _make_rotate_scan_kernel(num_parts),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((4, Mp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * np_in * np_in * (num_parts + 1),
            bytes_accessed=Mp * np_in + 16 * Mp
            + 2 * num_parts * np_in * np_in,
            transcendentals=0),
        interpret=interpret,
    )(scalars, G, *W_parts, yres_row, Q0p)


def pallas_rotate_scan(G, rot, tm: int = 256, nb: int = 512,
                       interpret=None) -> Dict[str, jnp.ndarray]:
    """Fused rotate+whiten+GLS scan over RAW genotype rows (the full
    north-star kernel: one HBM read of G per scan, Xs never leaves
    VMEM). Requires a split-W RotatedNull
    (build_rotated_null(rotate_dtype='bf16x3' or 'bf16x2')) — with
    integer dosages the 3-part split is fp32-grade (|dp| ~ 9e-7,
    scripts/splitw_bench.py)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if getattr(rot.W, "ndim", 2) != 3:
        raise ValueError("pallas_rotate_scan needs a split-W rot "
                         "(build_rotated_null(rotate_dtype='bf16x3'))")
    num_parts = int(rot.W.shape[0])
    M, n = G.shape
    Mp = -(-M // tm) * tm
    np_ = -(-n // nb) * nb
    Gp = jnp.pad(jnp.asarray(G), ((0, Mp - M), (0, np_ - n)))
    W_parts = [jnp.pad(rot.W[p].astype(jnp.bfloat16),
                       ((0, np_ - n), (0, np_ - n)))
               for p in range(num_parts)]
    yres = jnp.pad(jnp.asarray(rot.y_res, jnp.float32),
                   (0, np_ - n))[None, :]
    Q0 = jnp.asarray(rot.Q0, jnp.float32)
    Q0p = jnp.pad(Q0, ((0, np_ - n), (0, QPAD - Q0.shape[1])))
    scalars = jnp.asarray(
        [jnp.float32(rot.rss0), jnp.float32(rot.dof)], dtype=jnp.float32)
    out = _rotate_scan_padded(Gp, W_parts, yres, Q0p, scalars,
                              num_parts, tm, nb, interpret=interpret)
    f, beta, vp, maskf = out[0, :M], out[1, :M], out[2, :M], out[3, :M]
    return {"f_stats": f, "betas": beta, "var_perc": vp,
            "mask": maskf > 0.5}


def _make_int8_rotate_scan_kernel(num_planes: int):
    """int8 digit-plane fused rotate+scan: G stays int8 in VMEM and is
    read from HBM ONCE per scan (XLA's int8xK tier re-reads it once per
    plane and round-trips Xs through HBM); each plane dot accumulates
    exactly in int32 (2x bf16 MXU rate on v5e), recombined base-256 in
    f32 and column-scaled by w_scale. Epilogue identical to the bf16
    kernel. All dots UNCONDITIONAL (Mosaic rejects predicated dots on
    this toolchain) with precision=DEFAULT pinned (the package-global
    'highest' would stamp contract_precision<fp32> on int8 dots, which
    Mosaic rejects — CLAUDE.md 'Mosaic HTTP 500' note)."""

    def kernel(scal_ref, g_ref, *rest):
        w_refs = rest[:num_planes]
        (wscale_ref, yres_ref, q0_ref, out_ref,
         xs_acc, ss_acc, xy_acc, cc_acc) = rest[num_planes:]
        j = pl.program_id(1)
        k = pl.program_id(2)
        nj = pl.num_programs(1)
        nk = pl.num_programs(2)

        @pl.when((j == 0) & (k == 0))
        def _():
            ss_acc[:] = jnp.zeros_like(ss_acc)
            xy_acc[:] = jnp.zeros_like(xy_acc)
            cc_acc[:] = jnp.zeros_like(cc_acc)

        g = g_ref[:]                                 # int8 (tm, nb)
        prec = jax.lax.Precision.DEFAULT
        pxs = None
        for p in range(num_planes):
            d = jnp.dot(g, w_refs[p][:],
                        preferred_element_type=jnp.int32, precision=prec)
            term = d.astype(jnp.float32) * (256.0 ** p)
            pxs = term if pxs is None else pxs + term
        pxs = pxs * wscale_ref[:]                    # per-column scale
        xs_acc[:] = jnp.where(k == 0, pxs, xs_acc[:] + pxs)
        cc_acc[:] += jnp.dot(pxs, q0_ref[:],
                             preferred_element_type=jnp.float32)
        xy_acc[:] += jnp.sum(pxs * yres_ref[:], axis=1, keepdims=True)

        @pl.when(k == nk - 1)
        def _():
            xs = xs_acc[:]
            ss_acc[:] += jnp.sum(xs * xs, axis=1, keepdims=True)

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
            expl = jnp.where(mask, jnp.minimum(xy * xy / xx_safe, rss0),
                             0.0)
            rss1 = jnp.maximum(rss0 - expl, tiny)
            out_ref[0, :] = jnp.where(mask, expl * dof / rss1, 0.0)
            out_ref[1, :] = jnp.where(mask, xy / xx_safe, 0.0)
            out_ref[2, :] = jnp.where(mask, expl / rss0, 0.0)
            out_ref[3, :] = mask.astype(jnp.float32)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("num_planes", "tm", "nb", "interpret"))
def _int8_rotate_scan_padded(G, W_planes, wscale_row, yres_row, Q0p,
                             scalars, num_planes: int, tm: int, nb: int,
                             interpret: bool = False):
    Mp, np_in = G.shape
    grid = (Mp // tm, np_in // nb, np_in // nb)
    in_specs = [pl.BlockSpec((tm, nb), lambda i, j, k, s: (i, k),
                             memory_space=pltpu.VMEM)]
    for _ in range(num_planes):
        in_specs.append(pl.BlockSpec((nb, nb), lambda i, j, k, s: (k, j),
                                     memory_space=pltpu.VMEM))
    in_specs += [
        pl.BlockSpec((1, nb), lambda i, j, k, s: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nb), lambda i, j, k, s: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nb, QPAD), lambda i, j, k, s: (j, 0),
                     memory_space=pltpu.VMEM),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((4, tm), lambda i, j, k, s: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tm, nb), jnp.float32),
            pltpu.VMEM((tm, 1), jnp.float32),
            pltpu.VMEM((tm, 1), jnp.float32),
            pltpu.VMEM((tm, QPAD), jnp.float32),
        ],
    )
    return pl.pallas_call(
        _make_int8_rotate_scan_kernel(num_planes),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((4, Mp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * np_in * np_in * (num_planes // 2 + 1),
            bytes_accessed=Mp * np_in + 16 * Mp
            + num_planes * np_in * np_in,
            transcendentals=0),
        interpret=interpret,
    )(scalars, G, *W_planes, wscale_row, yres_row, Q0p)


def pallas_rotate_scan_int8(G_int8, rot, tm: int = 256, nb: int = 512,
                            interpret=None) -> Dict[str, jnp.ndarray]:
    """Fused int8 digit-plane rotate+whiten+GLS scan over RAW int8
    genotype rows. Requires an int8-tier RotatedNull
    (build_rotated_null(rotate_dtype='int8x2'/'int8x3'/'int8x4')):
    rot.W is (k, n, n) int8 digit planes, rot.w_scale the per-column
    power-of-two. Numerics identical to ops.scan.emmax_scan_stats on the
    same rot (parity-tested); candidate to beat XLA's int8 tier by
    reading G from HBM once (vs once per plane) and keeping Xs in VMEM."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if getattr(rot.W, "ndim", 2) != 3 or rot.W.dtype != jnp.int8:
        raise ValueError("pallas_rotate_scan_int8 needs an int8-tier rot "
                         "(build_rotated_null(rotate_dtype='int8x3'))")
    num_planes = int(rot.W.shape[0])
    M, n = G_int8.shape
    Mp = -(-M // tm) * tm
    np_ = -(-n // nb) * nb
    G_int8 = jnp.asarray(G_int8)
    if G_int8.dtype != jnp.int8:
        # ROUND like the XLA int8 tier (emmax_scan_stats) — a plain
        # int8 cast truncates toward zero, silently diverging for float
        # dosages carrying representation error
        G_int8 = jnp.round(G_int8).astype(jnp.int8)
    Gp = jnp.pad(G_int8, ((0, Mp - M), (0, np_ - n)))
    W_planes = [jnp.pad(rot.W[p], ((0, np_ - n), (0, np_ - n)))
                for p in range(num_planes)]
    wscale = jnp.pad(jnp.asarray(rot.w_scale, jnp.float32),
                     (0, np_ - n), constant_values=1.0)[None, :]
    yres = jnp.pad(jnp.asarray(rot.y_res, jnp.float32),
                   (0, np_ - n))[None, :]
    Q0 = jnp.asarray(rot.Q0, jnp.float32)
    Q0p = jnp.pad(Q0, ((0, np_ - n), (0, QPAD - Q0.shape[1])))
    scalars = jnp.asarray(
        [jnp.float32(rot.rss0), jnp.float32(rot.dof)], dtype=jnp.float32)
    out = _int8_rotate_scan_padded(Gp, W_planes, wscale, yres, Q0p,
                                   scalars, num_planes, tm, nb,
                                   interpret=interpret)
    f, beta, vp, maskf = out[0, :M], out[1, :M], out[2, :M], out[3, :M]
    return {"f_stats": f, "betas": beta, "var_perc": vp,
            "mask": maskf > 0.5}


def pallas_scan_stats(G_rot, rot, tm: int = 256, tn: int = 512,
                      interpret=None) -> Dict[str, jnp.ndarray]:
    """Fused scan over pre-rotated SNP rows. Mirrors
    ops.scan.emmax_scan_stats(pre_rotated=True) (parity-tested)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    G_rot = jnp.asarray(G_rot, dtype=jnp.float32)
    M, n = G_rot.shape
    Mp = -(-M // tm) * tm
    np_ = -(-n // tn) * tn
    Gp = jnp.pad(G_rot, ((0, Mp - M), (0, np_ - n)))
    sd = jnp.pad(jnp.asarray(rot.sd, jnp.float32), (0, np_ - n))[None, :]
    yres = jnp.pad(jnp.asarray(rot.y_res, jnp.float32),
                   (0, np_ - n))[None, :]
    Q0 = jnp.asarray(rot.Q0, jnp.float32)
    # undo the whitening on Q0/y_res inputs: the kernel whitens G only, so
    # feed sd-weighted columns consistently: Q0 and y_res are ALREADY in
    # the whitened basis; the zero-padded sample rows contribute nothing.
    Q0p = jnp.pad(Q0, ((0, np_ - n), (0, QPAD - Q0.shape[1])))
    scalars = jnp.asarray(
        [jnp.float32(rot.rss0), jnp.float32(rot.dof)], dtype=jnp.float32)
    out = _scan_padded(Gp, sd, yres, Q0p, scalars, tm, tn,
                       interpret=interpret)
    f, beta, vp, maskf = out[0, :M], out[1, :M], out[2, :M], out[3, :M]
    return {"f_stats": f, "betas": beta, "var_perc": vp,
            "mask": maskf > 0.5}
