"""Gene-environment (GxE) interaction scan (capability extension).

The reference stops at marginal and SNP-SNP tests (SURVEY.md §0; mount
was empty); testing SNP x environment interaction under the same mixed
model is the natural next workflow and reuses the package's whitened-
basis algebra end-to-end.

Model per SNP x, with environment e (per-sample covariate, forced into
the null):  y = X0 b + e c + x b_x + (x*e) b_xe + u + eps.

Reported per SNP (all in the EMMAX convention — delta fit ONCE on the
null [X0, e]):
  marginal_ps  x tested on [X0, e]                  (1 dof)
  inter_ps     x*e tested on [X0, e, x]             (1 dof — the GxE test)
  joint_ps     {x, x*e} tested on [X0, e] jointly   (2 dof)

Vectorization: rotate G and G*e once (two matmuls), then every per-SNP
statistic is elementwise Gram-Schmidt in the whitened basis — the exact
same pairwise identity as models/twosnp._pairwise_interaction, with the
partner direction being the SNP itself and the product being x*e.
Degenerate columns (monomorphic x, or x*e collinear with [null, x] —
e.g. a constant environment) are masked to p = 1 inside the kernel.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mixmogam_tpu.models.emmax import _as_design, _as_dosage
from mixmogam_tpu.models.stepwise import _rot_null_from_delta
from mixmogam_tpu.ops.eigen import eigen_k
from mixmogam_tpu.ops.reml import fit_null_model
from mixmogam_tpu.ops.stats import f_sf_host


def _gxe_stats_whitened(B, P, rot):
    """(marginal_f, inter_f, joint_f, masks) from WHITENED SNP columns
    B and product columns P (tile-shaped (m, n)).

    rot: RotatedNull of the [X0, e] null (passed as a pytree ARGUMENT —
    closing over it would bake device arrays into the executable).
    dof convention: rot.dof = n - q - 1 is the marginal test's
    denominator dof; the pair model has dof - 1.
    """
    Q0 = rot.Q0
    y_res = rot.y_res
    rss0 = rot.rss0
    dt = B.dtype
    eps = 100.0 * jnp.finfo(dt).eps
    tiny = jnp.finfo(dt).tiny

    def orth(X):
        return X - (X @ Q0) @ Q0.T

    Br = orth(B)
    Pr = orth(P)
    bb = jnp.sum(Br * Br, axis=1)
    mask_b = bb > eps * jnp.maximum(jnp.sum(B * B, axis=1), tiny)
    bb_safe = jnp.where(mask_b, bb, 1.0)
    by = Br @ y_res
    expl_b = by * by / bb_safe                    # variance explained by x
    # marginal F: x on [X0, e]
    rss_b = jnp.maximum(rss0 - expl_b, tiny)
    f_marg = expl_b / (rss_b / rot.dof)
    # residualize the product against the SNP direction
    pb = jnp.sum(Pr * Br, axis=1) / bb_safe
    Pr2 = Pr - pb[:, None] * Br
    pp = jnp.sum(Pr2 * Pr2, axis=1)
    mask_p = mask_b & (pp > eps * jnp.maximum(jnp.sum(P * P, axis=1),
                                              tiny))
    pp_safe = jnp.where(mask_p, pp, 1.0)
    py = Pr2 @ y_res
    expl_p = py * py / pp_safe                    # explained by x*e | x
    dof_pair = rot.dof - 1.0
    rss_pair = jnp.maximum(rss_b - expl_p, tiny)
    f_inter = expl_p / (rss_pair / dof_pair)
    # joint 2-dof test of {x, x*e} on [X0, e]
    f_joint = ((rss0 - rss_pair) / 2.0) / (rss_pair / dof_pair)
    return (jnp.where(mask_b, f_marg, 0.0),
            jnp.where(mask_p, f_inter, 0.0),
            jnp.where(mask_p, f_joint, 0.0), mask_b, mask_p)


@jax.jit
def _gxe_stats(G_rot, prod_rot, rot):
    """In-core entry: whiten pre-rotated columns (G @ U), then stats."""
    B = G_rot * rot.sd[None, :]
    P = prod_rot * rot.sd[None, :]
    return _gxe_stats_whitened(B, P, rot)


@functools.partial(jax.jit, static_argnames=("n", "tile", "impute"))
def _gxe_scan_packed(packed, env_dev, rot, n: int, tile: int,
                     impute: bool = False):
    """GxE stats over a 2-bit packed genome resident in HBM: per tile,
    unpack -> rotate+whiten BOTH the dosages and the x*e products with
    rot.W (two matmuls, 2x the plain resident scan), then the
    elementwise pairwise identity — zero host traffic."""
    from mixmogam_tpu.models.streaming import _impute_tile
    from mixmogam_tpu.ops.pack2 import unpack_2bit_device

    T = packed.shape[0] // tile
    tiles = packed.reshape(T, tile, packed.shape[1])
    dt = rot.sd.dtype

    def kern(pt):
        Gt = unpack_2bit_device(pt, n)
        Gt = _impute_tile(Gt, dt) if impute else Gt.astype(dt)
        B = Gt @ rot.W
        P = (Gt * env_dev[None, :]) @ rot.W
        return _gxe_stats_whitened(B, P, rot)

    out = jax.lax.map(kern, tiles)
    return tuple(v.reshape(T * tile) for v in out)


def emmax_gxe(G, y, env, K=None, X0: Optional[np.ndarray] = None,
              eig_k=None, ngrids: int = 100, llim: float = -10.0,
              ulim: float = 10.0, dtype=None) -> Dict[str, np.ndarray]:
    """GxE interaction scan (see module docstring).

    env: (n,) per-sample environment (continuous or 0/1); it is always
    appended to the null fixed effects. K or eig_k as in emmax.
    Returns {'marginal_ps', 'inter_ps', 'joint_ps', 'f_inter', masks,
    'delta', 'pseudo_heritability'}; p-values finalize in float64 on
    host (ops/stats.f_sf_host).
    """
    y = np.asarray(y, dtype=np.float64).ravel()
    n = y.shape[0]
    env = np.asarray(env, dtype=np.float64).ravel()
    if env.shape[0] != n:
        raise ValueError(f"env has {env.shape[0]} samples, y has {n}")
    if not np.isfinite(env).all():
        raise ValueError("env contains non-finite values; GxE needs a "
                         "complete environment covariate")
    if dtype is None:
        dtype = jnp.zeros(0).dtype
    from mixmogam_tpu.models.resident import ResidentGenome

    rg = G if isinstance(G, ResidentGenome) else None
    if rg is not None and rg.n != n:
        raise ValueError(f"y has {n} samples but the resident genome "
                         f"holds {rg.n}")
    Gf = None if rg is not None else _as_dosage(G, dtype)
    if X0 is None:
        X0 = np.ones((n, 1))
    X0 = _as_design(X0, n)
    X0e = np.column_stack([X0, env])
    if np.linalg.matrix_rank(X0e) < X0e.shape[1]:
        raise ValueError(
            "environment is linearly dependent on the null fixed "
            "effects (constant env duplicates the intercept?) — the "
            "null design [X0, env] must have full column rank")
    if eig_k is None:
        if K is None:
            raise ValueError("need K or eig_k")
        phi, U = eigen_k(K, host=True)
    else:
        phi, U = eig_k
    phi = jnp.asarray(phi, dtype=dtype)
    U = jnp.asarray(U, dtype=dtype)
    null = fit_null_model(y.astype(np.dtype(dtype).name), X0e,
                          eig_k=(phi, U), ngrids=ngrids, llim=llim,
                          ulim=ulim)
    y_rot = U.T @ jnp.asarray(y, dtype=dtype)
    X0e_rot = U.T @ jnp.asarray(X0e, dtype=dtype)
    rot = _rot_null_from_delta(phi, null.delta, y_rot, X0e_rot, dtype,
                               U=U if rg is not None else None)
    if rg is not None:
        # device-resident path: tiles unpack+rotate in HBM (2 matmuls
        # per tile; exact fp32 only — no int8 tiers for GxE yet)
        ed = jnp.asarray(env, dtype=dtype)
        out5 = _gxe_scan_packed(rg.packed, ed, rot, rg.n, rg.tile,
                                impute=rg.has_missing)
        f_marg, f_inter, f_joint, mask_b, mask_p = (
            v[:rg.M] for v in out5)
    else:
        Gd = jnp.asarray(Gf)
        ed = jnp.asarray(env, dtype=Gd.dtype)
        G_rot = Gd @ U
        prod_rot = (Gd * ed[None, :]) @ U
        f_marg, f_inter, f_joint, mask_b, mask_p = _gxe_stats(
            G_rot, prod_rot, rot)
    mask_b = np.asarray(mask_b)
    mask_p = np.asarray(mask_p)
    dof = float(rot.dof)
    out = {
        "marginal_ps": np.where(
            mask_b, f_sf_host(np.asarray(f_marg, np.float64), 1.0, dof),
            1.0),
        "inter_ps": np.where(
            mask_p, f_sf_host(np.asarray(f_inter, np.float64), 1.0,
                              dof - 1.0), 1.0),
        "joint_ps": np.where(
            mask_p, f_sf_host(np.asarray(f_joint, np.float64), 2.0,
                              dof - 1.0), 1.0),
        "f_inter": np.asarray(f_inter, np.float64),
        "mask": mask_b, "mask_inter": mask_p,
        "delta": float(null.delta),
        "pseudo_heritability": float(null.pseudo_heritability),
    }
    return out
