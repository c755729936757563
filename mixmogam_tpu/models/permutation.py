"""Permutation tests for empirical significance thresholds
(SURVEY.md A.6; reference: linear_models.emmax_perm_test).

Semantics (matching the reference's approximation): the null-model
variance components are fit ONCE on the unpermuted data; each permutation
shuffles the phenotype, re-whitens with the SAME H^(-1/2), and rescans.
All P permutations are batched: per genotype tile, the P F-statistic
columns come from ONE (m,n)x(n,P) matmul; only the per-permutation max-F
(= min-p) survives, so memory is O(m*P) per tile."""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mixmogam_tpu.models.emmax import _as_design, _as_dosage
from mixmogam_tpu.ops.eigen import orthonormal_basis
from mixmogam_tpu.ops.reml import fit_null_model
from mixmogam_tpu.ops.stats import f_sf_host


@jax.jit
def _perm_tile_max_f(G_rot_tile, sd, Q0, Y_res, rss0, dof, running_max):
    """Max-over-SNPs F per permutation for one rotated tile.
    Y_res: (P, n) whitened permuted residuals; rss0: (P,)."""
    Xs = G_rot_tile * sd[None, :]                  # (m, n)
    c = Xs @ Q0                                    # (m, q)
    ss = jnp.sum(Xs * Xs, axis=1)
    xx = ss - jnp.sum(c * c, axis=1)
    eps = 100.0 * jnp.finfo(Xs.dtype).eps
    mask = xx > eps * jnp.maximum(ss, jnp.finfo(Xs.dtype).tiny)
    xy = Xs @ Y_res.T                              # (m, P)
    expl = jnp.where(mask[:, None],
                     jnp.minimum(xy * xy / jnp.where(mask, xx, 1.0)[:, None],
                                 rss0[None, :]), 0.0)
    rss1 = jnp.maximum(rss0[None, :] - expl, jnp.finfo(Xs.dtype).tiny)
    f = expl * dof / rss1                          # (m, P)
    return jnp.maximum(running_max, jnp.max(f, axis=0))


@functools.partial(jax.jit, static_argnames=("n", "tile", "impute"))
def _perm_scan_packed(packed, W, w_scale, sd, Q0, Y_res, rss0, dof,
                      n: int, tile: int, impute: bool = False):
    """Per-permutation max-F over a 2-bit packed genome in HBM as ONE
    dispatch (round 4: the per-tile host loop measured 860 s for
    128 perms x 1M x 10,240 — eager rotations + 64 round trips; fused,
    the whole thing is scan-shaped). W: quantize_rotation repr of
    U * sd (tierable), or None for identity whitening (Xs = Gt * sd).
    Pad rows are dosage-0 -> degenerate -> masked."""
    from mixmogam_tpu.models.streaming import _impute_tile
    from mixmogam_tpu.ops.pack2 import unpack_2bit_device
    from mixmogam_tpu.ops.scan import apply_rotation

    T = packed.shape[0] // tile
    tiles = packed.reshape(T, tile, packed.shape[1])
    dt = Y_res.dtype

    def kern(pt):
        Gt = unpack_2bit_device(pt, n)
        if impute:
            Gt = _impute_tile(Gt, dt)
        Xs = (Gt.astype(dt) * sd[None, :] if W is None
              else apply_rotation(Gt, W, w_scale, dt))
        c = Xs @ Q0
        ss = jnp.sum(Xs * Xs, axis=1)
        xx = ss - jnp.sum(c * c, axis=1)
        eps = 100.0 * jnp.finfo(dt).eps
        mask = xx > eps * jnp.maximum(ss, jnp.finfo(dt).tiny)
        xy = Xs @ Y_res.T                              # (m, P)
        expl = jnp.where(
            mask[:, None],
            jnp.minimum(xy * xy / jnp.where(mask, xx, 1.0)[:, None],
                        rss0[None, :]), 0.0)
        rss1 = jnp.maximum(rss0[None, :] - expl, jnp.finfo(dt).tiny)
        f = expl * dof / rss1                          # (m, P)
        return jnp.max(f, axis=0)

    return jnp.max(jax.lax.map(kern, tiles), axis=0)


_PERM_MESH_CACHE: Dict = {}


def _perm_mesh_fn(mesh, tile: int, identity: bool):
    """Sharded host-source permutation sweep: each device runs the
    TILED rotate+max-F loop over its SNP shard (rotating per tile keeps
    per-chip HBM at one G shard + one rotated tile, review r5 #4 — a
    whole-matrix G_rot would double it), then ONE pmax over 'snp'.
    Jitted once per (mesh, tile, identity)."""
    from jax.sharding import PartitionSpec as P

    key = (mesh, tile, identity)
    fn = _PERM_MESH_CACHE.get(key)
    if fn is not None:
        return fn

    def kernel(G_loc, U, sd, Q0, Y_res, rss0, dof):
        T = G_loc.shape[0] // tile
        tiles = G_loc.reshape(T, tile, G_loc.shape[1])

        def body(carry, Gt):
            G_rot = (Gt.astype(Y_res.dtype) if identity
                     else jnp.dot(Gt.astype(U.dtype), U,
                                  preferred_element_type=U.dtype))
            return _perm_tile_max_f(G_rot, sd, Q0, Y_res, rss0, dof,
                                    carry), None

        # the carry must be marked device-varying over 'snp' up front
        # (the body's output varies with the local shard)
        init = jax.lax.pvary(jnp.zeros(Y_res.shape[0], Y_res.dtype),
                             ("snp",))
        mx, _ = jax.lax.scan(body, init, tiles)
        return jax.lax.pmax(mx, "snp")

    u_spec = () if identity else (P(),)
    fn = jax.jit(jax.shard_map(
        (lambda G_loc, sd, Q0, Y_res, rss0, dof:
         kernel(G_loc, None, sd, Q0, Y_res, rss0, dof)) if identity
        else kernel,
        mesh=mesh,
        in_specs=(P("snp", None),) + u_spec + (P(), P(), P(), P(), P()),
        out_specs=P()))
    _PERM_MESH_CACHE[key] = fn
    return fn


def emmax_perm_test(G, y, K=None, num_perm: int = 100,
                    X0: Optional[np.ndarray] = None, seed: int = 0,
                    alpha: float = 0.05, dtype=None, tile: int = 4096,
                    eig_k=None,
                    precision: Optional[str] = None,
                    mesh=None) -> Dict[str, np.ndarray]:
    """Returns the empirical min-p distribution and the alpha-quantile
    genome-wide threshold.

    A ResidentGenome runs the whole permutation sweep as one fused
    device dispatch off packed HBM; `precision` selects the rotation
    tier there (same names as emmax — threshold estimation is a
    quantile over max-F, tolerant of tier-level drift; int8 tiers need
    fully-observed dosages).

    mesh: a ('snp', 'sample') device mesh SNP-shards the sweep (VERDICT
    r4 #4): one sharded whole-matrix dispatch, per-perm max-F reduced
    across shards by GSPMD; host-source only, identical permutations
    (same seed) and min-p values as the single-device path."""
    y = np.asarray(y, dtype=np.float64).ravel()
    n = y.shape[0]
    if dtype is None:
        dtype = jnp.zeros(0).dtype
    from mixmogam_tpu.models.resident import ResidentGenome

    rg = G if isinstance(G, ResidentGenome) else None
    if mesh is not None and rg is not None and mesh.shape["sample"] != 1:
        raise ValueError(
            "mesh-distributed resident permutation shards 'snp' only; "
            "use a ('snp', 1) mesh")
    Gf = None if rg is not None else _as_dosage(G, dtype)
    M = rg.M if rg is not None else Gf.shape[0]
    if X0 is None:
        X0 = np.ones((n, 1))
    X0 = _as_design(X0, n)
    q = X0.shape[1]
    identity_k = K is None and eig_k is None
    if identity_k:
        # linear-model permutation test: identity whitening, no REML.
        # U = I and sd = 1, so all rotation matmuls below are skipped
        # (an explicit n x n identity would cost 2*M*n^2 wasted FLOPs
        # and 400 MB HBM at n=10k, for matmuls returning their inputs).
        U = None
        sd = jnp.ones(n, dtype=dtype)
        delta = jnp.asarray(1.0, dtype)
        X0_rot_star = jnp.asarray(X0, dtype)
    else:
        null = fit_null_model(y.astype(np.dtype(dtype).name), X0, K=K,
                              eig_k=eig_k)
        phi, U, delta = null.phi, null.U, null.delta
        sd = 1.0 / jnp.sqrt(phi + delta)
        X0_rot_star = (null.X0.T @ U).T * sd[:, None]
    rng = np.random.default_rng(seed)
    perms = np.stack([rng.permutation(n) for _ in range(num_perm)])
    Yp = y[perms]                                   # (P, n)
    Yp_d = jnp.asarray(Yp, dtype=dtype)
    Yp_rot = Yp_d if identity_k else Yp_d @ U       # rotate all perms
    Ys = Yp_rot * sd[None, :]
    Q0 = orthonormal_basis(X0_rot_star)
    Y_res = Ys - (Ys @ Q0) @ Q0.T
    rss0 = jnp.sum(Y_res * Y_res, axis=1)
    dof = n - q - 1

    if rg is not None:
        # packed HBM source: the entire perm sweep is ONE fused
        # dispatch (genome never materializes as float — 40 GB at
        # 1M x 10k; no per-tile round trips)
        from mixmogam_tpu.ops.scan import (normalize_rotate_tier,
                                           quantize_rotation,
                                           resolve_precision)

        import contextlib

        rd, mp = None, None
        if precision is not None:
            from mixmogam_tpu.ops.scan import probe_for_source

            rb, mp, _name = resolve_precision(
                precision, G=probe_for_source(rg))
            rd = normalize_rotate_tier(rb)
            if isinstance(rd, str) and rd.startswith("int8") \
                    and rg.has_missing:
                raise ValueError(
                    "int8 digit-plane tiers need fully-observed "
                    "dosages; use precision='exact'/'bf16'")
        if identity_k:
            W, w_scale = None, None
        else:
            W, w_scale = quantize_rotation(U * sd[None, :], rd,
                                           sd_dtype=sd.dtype)
        # matmul-precision tiers ('high') apply at TRACE time
        ctx = (jax.default_matmul_precision(mp) if mp
               else contextlib.nullcontext())
        dof_d = jnp.asarray(float(dof), Ys.dtype)
        with ctx:
            if mesh is not None:
                # SNP-sharded packed sweep (round 5): each chip runs the
                # fused kernel over its packed shard; the per-perm max
                # reduces across shards with ONE pmax
                from jax.sharding import PartitionSpec as P

                from mixmogam_tpu.parallel.distributed import (
                    shard_packed_rows)
                from mixmogam_tpu.parallel.mesh import (put_global,
                                                        replicated)

                packed = shard_packed_rows(rg, mesh, rg.tile)
                rep = replicated(mesh)

                def place(v):
                    return None if v is None else put_global(v, rep)

                args = tuple(place(v) for v in
                             (W, w_scale, sd, Q0, Y_res, rss0, dof_d))
                spec = tuple(None if v is None else P() for v in args)
                fn = jax.shard_map(
                    lambda p, *a: jax.lax.pmax(
                        _perm_scan_packed(p, *a, n=rg.n, tile=rg.tile,
                                          impute=rg.has_missing),
                        "snp"),
                    mesh=mesh, in_specs=(P("snp", None),) + spec,
                    out_specs=P())
                max_f = jax.jit(fn)(packed, *args)
            else:
                max_f = _perm_scan_packed(
                    rg.packed, W, w_scale, sd, Q0, Y_res, rss0,
                    dof_d, rg.n, rg.tile,
                    impute=rg.has_missing)
    else:
        # the host-tile path computes everything at the exact tier, so
        # tier names that RESOLVE to exact ('exact', None, and 'auto'
        # outside its int8 conditions) are a no-op, accepted for API
        # consistency with emmax/emmax_gxe (ADVICE r4); genuinely
        # tiered names still need the resident container.
        if precision is not None and str(precision) not in ("exact",
                                                            "auto"):
            raise ValueError(
                f"precision={precision!r}: tiered permutation sweeps "
                "need a ResidentGenome source (the host-tile path runs "
                "exact; 'exact'/'auto' are accepted as no-ops)")
        if mesh is not None:
            # SNP-sharded TILED sweep: zero pad rows are degenerate
            # (f = 0, never the max); null pieces replicate
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P

            from mixmogam_tpu.parallel.mesh import (pad_to_multiple,
                                                    put_global,
                                                    replicated)

            Gp, _ = pad_to_multiple(np.asarray(Gf),
                                    mesh.shape["snp"] * tile, axis=0)
            rep = replicated(mesh)
            Gd = put_global(Gp, NamedSharding(mesh, P("snp", None)))
            dof_d = put_global(jnp.asarray(float(dof), Ys.dtype), rep)
            fn = _perm_mesh_fn(mesh, tile, identity_k)
            args = (put_global(sd, rep), put_global(Q0, rep),
                    put_global(Y_res, rep), put_global(rss0, rep),
                    dof_d)
            if identity_k:
                max_f = fn(Gd, *args)
            else:
                max_f = fn(Gd, put_global(U, rep), *args)
        else:
            Gd = jnp.asarray(Gf)
            max_f = jnp.zeros(num_perm, dtype=Ys.dtype)
            for s in range(0, M, tile):
                e = min(s + tile, M)
                Gt = Gd[s:e]
                if e - s < tile:
                    Gt = jnp.pad(Gt, ((0, tile - (e - s)), (0, 0)))
                G_rot_tile = Gt if identity_k else Gt @ U
                max_f = _perm_tile_max_f(G_rot_tile, sd, Q0, Y_res,
                                         rss0, float(dof), max_f)
    min_ps = f_sf_host(np.asarray(max_f), 1.0, dof)
    thr = float(np.quantile(min_ps, alpha))
    return {"min_ps": np.sort(min_ps), "threshold": thr,
            "alpha": alpha, "num_perm": num_perm,
            "delta": float(delta)}
