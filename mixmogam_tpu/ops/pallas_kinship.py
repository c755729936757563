"""Pallas TPU kernel: blocked kinship accumulation over packed int8
genotype tiles (SURVEY.md L3 / BASELINE north star: 'kinship-matrix
construction as a blocked Pallas matmul over packed genotype tiles').

Key idea: for binary-coded genotypes the IBS sharing-count matrix

    S = Z'Z + (1-Z)'(1-Z) = 2 Z'Z - s (x) 1 - 1 (x) s + M * J

is INTEGER-exact. The kernel feeds int8 tiles straight to the MXU
(int8 x int8 -> int32), so the whole kinship is computed with zero
floating-point error and at int8 MXU rates (~2x fp32 flops, 4x less HBM
traffic than fp32 tiles). Grid (i, j, k): K tile (i, j) accumulates over
SNP blocks k in VMEM (canonical Pallas matmul accumulation); the zero
rows padding M up contributes exactly +pad per entry (corrected by the
wrapper), and the host divides by M at the end.

The diploid/fractional (mean-imputed) paths stay on the float XLA route
(ops.kinship); this kernel is the no-missing int8 fast path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ibs_kernel(z1_ref, z2_ref, out_ref):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    z1 = z1_ref[:]
    z2 = z2_ref[:]
    # explicit precision: the package-global 'highest' pin otherwise
    # stamps contract_precision<fp32> on the int8 dot, which Mosaic
    # rejects ('Bad lhs type'); int8 accumulation is exact regardless
    d = jax.lax.dot_general(z1, z2, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32,
                            precision=jax.lax.Precision.DEFAULT)
    s1 = jnp.sum(z1.astype(jnp.int32), axis=0)
    s2 = jnp.sum(z2.astype(jnp.int32), axis=0)
    m_blk = z1.shape[0]
    out_ref[:] += 2 * d - s1[:, None] - s2[None, :] + m_blk


@functools.partial(jax.jit, static_argnames=("tm", "tn", "interpret"))
def _ibs_gram_padded(Z: jnp.ndarray, tm: int, tn: int,
                     interpret: bool = False) -> jnp.ndarray:
    """S for a zero-padded int8 (Mp, np_) matrix; caller corrects pads."""
    Mp, n = Z.shape
    grid = (n // tn, n // tn, Mp // tm)
    return pl.pallas_call(
        _ibs_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tn), lambda i, j, k: (k, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, tn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tn, tn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * n * n, bytes_accessed=2 * Mp * n + 4 * n * n,
            transcendentals=0),
        interpret=interpret,
    )(Z, Z)


def _ibs_tri_kernel(z1_ref, z2_ref, out_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # upper triangle only: K is symmetric, so the MXU work of every j < i
    # block is skipped (the XLA gram cannot) — ~1.3-2x compute saved; the
    # host mirrors the upper blocks. The op is compute-bound, so
    # compute-skip captures nearly all of the win vs a DMA-skipping
    # block list.
    @pl.when(j >= i)
    def _():
        z1 = z1_ref[:]
        z2 = z2_ref[:]
        d = jax.lax.dot_general(z1, z2, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32,
                                precision=jax.lax.Precision.DEFAULT)
        s1 = jnp.sum(z1.astype(jnp.int32), axis=0)
        s2 = jnp.sum(z2.astype(jnp.int32), axis=0)
        out_ref[:] += 2 * d - s1[:, None] - s2[None, :] + z1.shape[0]


@functools.partial(jax.jit, static_argnames=("tm", "tn", "interpret"))
def _ibs_gram_tri(Z: jnp.ndarray, tm: int, tn: int,
                  interpret: bool = False) -> jnp.ndarray:
    """Upper-triangle IBS gram: (n, n) int32 with valid blocks at j >= i
    (lower-triangle blocks are zero; caller mirrors)."""
    Mp, n = Z.shape
    grid = (n // tn, n // tn, Mp // tm)
    return pl.pallas_call(
        _ibs_tri_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tn), lambda i, j, k: (k, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, tn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tn, tn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=Mp * n * n, bytes_accessed=2 * Mp * n + 4 * n * n,
            transcendentals=0),
        interpret=interpret,
    )(Z, Z)


def pallas_ibs_kinship_tri(G, tm: int = 2048, tn: int = 256,
                           interpret: Optional[bool] = None) -> np.ndarray:
    """Exact IBS kinship via triangular Pallas blocks (binary int8, no
    missing): only j >= i blocks hit the MXU; parity bit-identical.

    NOTE: this image's remote Mosaic toolchain cannot compile
    pl.when-predicated MXU dots (STATUS.md); on such toolchains the call
    transparently falls back to the full-grid kernel below."""
    G = np.asarray(G)
    if G.dtype != np.int8:
        G = G.astype(np.int8)
    if (G < 0).any():
        raise ValueError("pallas_ibs_kinship_tri needs fully-observed "
                         "binary genotypes; use ops.kinship for missing")
    M, n = G.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    Mp = -(-M // tm) * tm
    np_ = -(-n // tn) * tn
    B = np_ // tn
    Zp = np.zeros((Mp, np_), dtype=np.int8)
    Zp[:M, :n] = G
    try:
        Su = np.asarray(_ibs_gram_tri(jnp.asarray(Zp), tm, tn,
                                      interpret=interpret)).astype(np.int64)
    except Exception:  # Mosaic predicated-dot limitation (docstring)
        if interpret:
            raise
        return pallas_ibs_kinship(G, tm=min(tm, 512), tn=tn,
                                  interpret=interpret)
    # mirror the strict upper-triangle blocks into the lower half
    for i in range(B):
        for j in range(i + 1, B):
            Su[j * tn:(j + 1) * tn, i * tn:(i + 1) * tn] = \
                Su[i * tn:(i + 1) * tn, j * tn:(j + 1) * tn].T
    S = Su[:n, :n].astype(np.float64) - (Mp - M)
    return S / M


def pallas_ibs_kinship(G, tm: int = 512, tn: int = 256,
                       interpret: Optional[bool] = None) -> np.ndarray:
    """Exact IBS kinship for binary int8 genotypes with no missing data.

    G: (M, n) int8 in {0, 1}. Returns (n, n) float64 sharing fractions.
    Raises ValueError on missing (-1) entries — callers route those
    through the float path (ops.kinship).
    """
    G = np.asarray(G)
    if G.dtype != np.int8:
        G = G.astype(np.int8)
    if (G < 0).any():
        raise ValueError("pallas_ibs_kinship needs fully-observed binary "
                         "genotypes; use ops.kinship for missing data")
    M, n = G.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # pad: SNP axis to tm (zero rows -> +pad_m per entry, subtracted
    # below); sample axis to tn (cropped after)
    Mp = -(-M // tm) * tm
    np_ = -(-n // tn) * tn
    Zp = np.zeros((Mp, np_), dtype=np.int8)
    Zp[:M, :n] = G
    S = _ibs_gram_padded(jnp.asarray(Zp), tm, tn, interpret=interpret)
    S = np.asarray(S)[:n, :n].astype(np.float64) - (Mp - M)
    return S / M
