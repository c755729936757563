"""Fixed-effects per-SNP tests (SURVEY.md A.6; reference:
linear_models.linear_model / anova + Kruskal-Wallis).

All three are matmul-shaped on device: OLS reuses the EMMAX scan kernel
with identity whitening; ANOVA and Kruskal-Wallis reduce per-genotype-class
sums with indicator-matrix matmuls (one (m,n)x(n,) product per class) —
no Python loop over SNPs."""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mixmogam_tpu.ops.eigen import orthonormal_basis
from mixmogam_tpu.ops.pack2 import unpack_2bit_device
from mixmogam_tpu.ops.scan import RotatedNull, emmax_scan_all
from mixmogam_tpu.ops.stats import f_sf_host, chi2_sf_host
from mixmogam_tpu.models.emmax import _as_design, _as_dosage


def _identity_rot(y: np.ndarray, X0: np.ndarray, dtype) -> RotatedNull:
    n, q = X0.shape
    yd = jnp.asarray(y, dtype=dtype)
    X0d = jnp.asarray(X0, dtype=dtype)
    Q0 = orthonormal_basis(X0d)
    y_res = yd - Q0 @ (Q0.T @ yd)
    rss0 = y_res @ y_res
    ones = jnp.ones(n, dtype=dtype)
    # W is never read on the pre_rotated path — don't allocate an n x n
    # identity (400 MB at n=10k)
    return RotatedNull(W=jnp.zeros((0, 0), dtype=dtype), sd=ones, Q0=Q0,
                       y_res=y_res, rss0=rss0,
                       dof=jnp.asarray(n - q - 1, dtype=dtype))


def linear_model(G, y, X0: Optional[np.ndarray] = None, dtype=None,
                 tile: int = 8192, with_betas: bool = True,
                 mesh=None) -> Dict[str, np.ndarray]:
    """Per-SNP OLS F-test (reference: linear_model): the EMMAX kernel with
    identity whitening (pre_rotated=True skips the rotation matmul).

    mesh: a device mesh SNP-shards the scan (packed ResidentGenome rows
    via shard_map on ('snp', 1) meshes; in-core rows via GSPMD). There
    is no n^2 operator to sample-shard in the fixed-effects model, so
    the 'sample' axis replicates on the in-core path."""
    y = np.asarray(y, dtype=np.float64).ravel()
    n = y.shape[0]
    if dtype is None:
        dtype = jnp.zeros(0).dtype
    if X0 is None:
        X0 = np.ones((n, 1))
    X0 = _as_design(X0, n)
    rot = _identity_rot(y, X0, dtype)
    from mixmogam_tpu.models.resident import (ResidentGenome,
                                              emmax_scan_packed)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from mixmogam_tpu.parallel.mesh import (pad_to_multiple,
                                                put_global, replicated)

        from mixmogam_tpu.parallel.mesh import gather_if_multiprocess

        rep = replicated(mesh)
        rot_d = jax.tree.map(lambda v: put_global(v, rep), rot)
        if isinstance(G, ResidentGenome):
            from mixmogam_tpu.parallel.distributed import (
                _resident_scan_jit, shard_packed_rows)

            packed = shard_packed_rows(G, mesh, G.tile)
            fn, _ = _resident_scan_jit(
                mesh, G.n, G.tile, bool(G.has_missing),
                mesh.shape["sample"], 2, True, pre_rotated=True)
            d = gather_if_multiprocess(fn(packed, rot_d), mesh)
            d = {k: np.asarray(v)[:G.M] for k, v in d.items()}
        else:
            from mixmogam_tpu.parallel.distributed import _scan_sharded

            Gp, M0 = pad_to_multiple(np.asarray(_as_dosage(G, dtype)),
                                     mesh.shape["snp"], axis=0)
            Gd = put_global(Gp, NamedSharding(mesh, P("snp", None)))
            d = gather_if_multiprocess(
                _scan_sharded(Gd, rot_d, pre_rotated=True), mesh)
            d = {k: np.asarray(v)[:M0] for k, v in d.items()}
    elif isinstance(G, ResidentGenome):
        # packed HBM source: identity whitening == pre-rotated scan
        # straight off the 2-bit rows (no 40 GB float genome at 1M x 10k)
        d = emmax_scan_packed(G.packed, rot, G.n, G.tile,
                              pre_rotated=True)
        d = {k: np.asarray(v)[:G.M] for k, v in d.items()}
    else:
        Gf = _as_dosage(G, dtype)
        d = emmax_scan_all(jnp.asarray(Gf), rot, tile=tile,
                           pre_rotated=True)
    f_stats = np.asarray(d["f_stats"], dtype=np.float64)
    dof = int(rot.dof)
    ps = np.where(np.asarray(d["mask"]), f_sf_host(f_stats, 1.0, dof), 1.0)
    out = {"ps": ps, "f_stats": f_stats, "mask": np.asarray(d["mask"]),
           "dof": dof}
    if with_betas:
        out["betas"] = np.asarray(d["betas"], dtype=np.float64)
        out["var_perc"] = np.asarray(d["var_perc"], dtype=np.float64)
    return out


@functools.partial(jax.jit, static_argnames=("n_classes",))
def _class_sums(G, w, n_classes: int):
    """Per-SNP, per-genotype-class counts and weighted sums via indicator
    matmuls. G: (m, n) int dosages (<0 = missing); w: (n,) weights.
    Returns (counts (m, C), sums (m, C))."""
    outs_c, outs_s = [], []
    ones = jnp.ones(G.shape[1], dtype=w.dtype)
    for g in range(n_classes):
        ind = (G == g).astype(w.dtype)
        outs_c.append(ind @ ones)
        outs_s.append(ind @ w)
    return jnp.stack(outs_c, axis=1), jnp.stack(outs_s, axis=1)


def _subdivide_tile(tile: int, target: int = 2048) -> int:
    """models.resident.subdivide_tile (shared; lazy import — linear is
    imported by the facade before the resident module)."""
    from mixmogam_tpu.models.resident import subdivide_tile

    return subdivide_tile(tile, target)


@functools.partial(jax.jit, static_argnames=("n", "tile", "n_classes"))
def _class_sums_packed(packed: jnp.ndarray, W: jnp.ndarray, n: int,
                       tile: int, n_classes: int) -> jnp.ndarray:
    """Per-SNP per-class weighted sums off a 2-bit packed genome
    resident in HBM (VERDICT r3 #1: anova/KW previously decoded the
    whole container to host RAM — 10.7 GB at 1M x 10,240). One
    indicator matmul per class per tile under a lax.map; zero host
    traffic; missing (-1) matches no class. W: (n, c) weight columns
    (e.g. [1, y, y^2] for ANOVA, [1, ranks] for KW). Returns
    (M_pad, n_classes, c); pad rows land in class 0 and are sliced off
    by the caller."""
    T = packed.shape[0] // tile
    tiles = packed.reshape(T, tile, packed.shape[1])

    def kern(pt):
        Gt = unpack_2bit_device(pt, n)
        return jnp.stack([(Gt == g).astype(W.dtype) @ W
                          for g in range(n_classes)], axis=1)

    out = jax.lax.map(kern, tiles)
    return out.reshape(T * tile, n_classes, W.shape[1])


def _as_classes(G: np.ndarray) -> np.ndarray:
    """int8 genotype classes with -1 = missing. Float input: NaN (the
    package's float missing convention) -> -1, fractional (mean-imputed)
    dosages classify by NEAREST class — the same documented choice as
    emmax_anova's diploid path. Without this, NaN->int8 is an undefined
    cast that silently lands missing samples in class 0."""
    if np.issubdtype(G.dtype, np.integer):
        return G.astype(np.int8)
    miss = np.isnan(G)
    return np.where(miss, -1, np.rint(np.where(miss, 0, G))).astype(np.int8)


def _infer_ploidy(G: np.ndarray) -> int:
    mx = (np.nanmax(G, initial=0) if np.issubdtype(G.dtype, np.floating)
          else G.max(initial=0))
    return 2 if mx > 1 else 1


#: jitted mesh programs for the class tests, keyed on the trace shape
#: (review r5-cont #4: repeated calls must not re-trace)
_CLASS_MESH_CACHE: Dict = {}


def _sharded_class_sums_packed(rg, W, C: int, mesh):
    """_class_sums_packed over SNP-sharded packed rows (mesh= on the
    A.6 class tests): the weight columns replicate, each device runs
    the indicator matmuls over its shard."""
    from jax.sharding import PartitionSpec as P

    from mixmogam_tpu.parallel.distributed import shard_packed_rows
    from mixmogam_tpu.parallel.mesh import (gather_if_multiprocess,
                                            put_global, replicated)

    if mesh.shape["sample"] != 1:
        raise ValueError("mesh-distributed packed class tests shard "
                         "'snp' only; use a ('snp', 1) mesh")
    tsub = _subdivide_tile(rg.tile)
    packed = shard_packed_rows(rg, mesh, tsub)
    key = ("class_sums", mesh, rg.n, tsub, C)
    fn = _CLASS_MESH_CACHE.get(key)
    if fn is None:
        fn = jax.jit(jax.shard_map(
            lambda p, Wd: _class_sums_packed(p, Wd, rg.n, tsub, C),
            mesh=mesh, in_specs=(P("snp", None), P()),
            out_specs=P("snp")))
        _CLASS_MESH_CACHE[key] = fn
    out = fn(packed, put_global(W, replicated(mesh)))
    return gather_if_multiprocess(out, mesh)


def _shard_class_rows(G: np.ndarray, mesh):
    """Row-shard int8 class rows over 'snp' (pad rows with -1 =
    missing -> they match no class and are sliced off by the caller)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mixmogam_tpu.parallel.mesh import put_global

    nshard = mesh.shape["snp"]
    M = G.shape[0]
    target = -(-M // nshard) * nshard
    if target != M:
        G = np.concatenate(
            [G, np.full((target - M, G.shape[1]), -1, G.dtype)])
    return put_global(G, NamedSharding(mesh, P("snp", None)))


def anova(G, y, ploidy: Optional[int] = None, dtype=None, mesh=None
          ) -> Dict[str, np.ndarray]:
    """Per-SNP one-way ANOVA over genotype classes (reference: anova).
    A ResidentGenome sources class sums from packed HBM (no host
    decode); host arrays use the in-core indicator matmuls. mesh:
    SNP-shard the class sums over a device mesh (packed rows shard
    'snp' only)."""
    from mixmogam_tpu.data.genotype import GenotypeData
    from mixmogam_tpu.models.resident import ResidentGenome

    y = np.asarray(y, dtype=np.float64).ravel()
    if dtype is None:
        dtype = jnp.zeros(0).dtype
    if isinstance(G, ResidentGenome):
        if G.n != y.shape[0]:
            raise ValueError(f"y has {y.shape[0]} samples but the "
                             f"resident genome holds {G.n}")
        ploidy = G.ploidy if ploidy is None else ploidy
        C = ploidy + 1
        W = jnp.asarray(np.column_stack([np.ones_like(y), y, y * y]),
                        dtype=dtype)
        if mesh is not None:
            out = _sharded_class_sums_packed(G, W, C, mesh)
        else:
            out = _class_sums_packed(G.packed, W, G.n,
                                     _subdivide_tile(G.tile), C)
        out = np.asarray(out, dtype=np.float64)[:G.M]
        cnt, s1, s2 = out[:, :, 0], out[:, :, 1], out[:, :, 2]
    else:
        if isinstance(G, GenotypeData):
            ploidy = G.ploidy if ploidy is None else ploidy
            G = G.matrix
        G = _as_classes(np.asarray(G))
        if ploidy is None:
            ploidy = _infer_ploidy(G)
        C = ploidy + 1
        M = G.shape[0]
        if mesh is not None:
            from mixmogam_tpu.parallel.mesh import put_global, replicated

            Gd = _shard_class_rows(G, mesh)
            yd = put_global(jnp.asarray(y, dtype=dtype),
                            replicated(mesh))
            y2d = put_global(jnp.asarray(y * y, dtype=dtype),
                             replicated(mesh))
        else:
            Gd = jnp.asarray(G)
            yd = jnp.asarray(y, dtype=dtype)
            y2d = yd * yd
        cnt, s1 = _class_sums(Gd, yd, C)
        _, s2 = _class_sums(Gd, y2d, C)
        if mesh is not None:
            from mixmogam_tpu.parallel.mesh import gather_if_multiprocess

            cnt, s1, s2 = gather_if_multiprocess((cnt, s1, s2), mesh)
        cnt = np.asarray(cnt, dtype=np.float64)[:M]
        s1 = np.asarray(s1, dtype=np.float64)[:M]
        s2 = np.asarray(s2, dtype=np.float64)[:M]
    N = cnt.sum(axis=1)
    T = s1.sum(axis=1)
    ss_tot = s2.sum(axis=1) - T**2 / np.maximum(N, 1)
    with np.errstate(divide="ignore", invalid="ignore"):
        ssb = np.where(cnt > 0, s1**2 / np.maximum(cnt, 1), 0.0).sum(axis=1) \
            - T**2 / np.maximum(N, 1)
    ssw = np.maximum(ss_tot - ssb, 0.0)
    k = (cnt > 0).sum(axis=1)
    d1 = np.maximum(k - 1, 1)
    d2 = np.maximum(N - k, 1)
    valid = (k >= 2) & (ssw > 0) & (N - k > 0)
    f = np.where(valid, (ssb / d1) / np.maximum(ssw / d2, 1e-300), 0.0)
    ps = np.where(valid, f_sf_host(f, d1, d2), 1.0)
    return {"ps": ps, "f_stats": f, "dof1": d1, "dof2": d2}


def _kw_missing_core(Gs, a_idx, b_idx, starts, ends, n_classes: int, fdt):
    """Kruskal-Wallis math for one tile of SNP rows with per-SNP missing
    genotype subsets, fully vectorized (VERDICT r1 #8 — replaces an O(M)
    host scipy loop). Shared by the in-core jit and the packed-HBM map.

    Gs: (m, n) int8 classes, columns SORTED by y ascending (<0 missing).
    a_idx/b_idx: (n,) start/end+1 position of each position's y-tie group.
    starts/ends: (n_grp,) tie-group boundaries. Within the observed
    subset of SNP j, the rank of an observed sample = (#observed before
    its tie group) + (observed-in-group + 1)/2 — mid-ranks, exactly
    scipy.stats.rankdata on the subset."""
    O = (Gs >= 0).astype(fdt)
    c = jnp.cumsum(O, axis=1)
    c0 = jnp.concatenate(
        [jnp.zeros((Gs.shape[0], 1), fdt), c], axis=1)  # exclusive prefix
    cA = c0[:, a_idx]
    cB = c0[:, b_idx]
    ranks = cA + (cB - cA + 1.0) / 2.0  # (m, n), valid where observed
    nj = c[:, -1]
    hnum = jnp.zeros_like(nj)
    kcls = jnp.zeros_like(nj)
    for g in range(n_classes):
        ind = (Gs == g).astype(fdt)
        cnt_g = ind.sum(axis=1)
        R_g = (ind * ranks).sum(axis=1)
        hnum = hnum + jnp.where(cnt_g > 0,
                                R_g * R_g / jnp.maximum(cnt_g, 1.0), 0.0)
        kcls = kcls + (cnt_g > 0).astype(fdt)
    denom = jnp.maximum(nj * (nj + 1.0), 1.0)
    h = 12.0 / denom * hnum - 3.0 * (nj + 1.0)
    # per-SNP tie correction over OBSERVED tie-group sizes
    d = c0[:, ends] - c0[:, starts]  # (m, n_grp)
    tie = 1.0 - (d**3 - d).sum(axis=1) / jnp.maximum(nj**3 - nj, 1.0)
    # scipy.stats.kruskal's validity rule: >=2 groups and not all y tied
    valid = (kcls >= 2) & (tie > 0)
    h = jnp.where(valid, h / jnp.where(valid, tie, 1.0), 0.0)
    return h, kcls, valid


@functools.partial(jax.jit, static_argnames=("n_classes", "fdt"))
def _kw_missing_tile(Gs, a_idx, b_idx, starts, ends, n_classes: int,
                     fdt=jnp.float64):
    """In-core entry: one host-provided tile of y-sorted class rows."""
    return _kw_missing_core(Gs, a_idx, b_idx, starts, ends, n_classes, fdt)


@functools.partial(jax.jit,
                   static_argnames=("n", "tile", "n_classes", "fdt"))
def _kw_missing_packed(packed, order, a_idx, b_idx, starts, ends,
                       n: int, tile: int, n_classes: int,
                       fdt=jnp.float64):
    """Missing-data KW off a 2-bit packed genome resident in HBM: each
    tile is unpacked, its columns gathered into y-sorted order on
    device, then the shared core runs — no host decode (VERDICT r3 #1).
    Pad rows are all class 0 -> kcls = 1 -> invalid (p = 1)."""
    T = packed.shape[0] // tile
    tiles = packed.reshape(T, tile, packed.shape[1])

    def kern(pt):
        Gt = unpack_2bit_device(pt, n)
        Gs = jnp.take(Gt, order, axis=1)
        return _kw_missing_core(Gs, a_idx, b_idx, starts, ends,
                                n_classes, fdt)

    h, k, v = jax.lax.map(kern, tiles)
    return h.reshape(-1), k.reshape(-1), v.reshape(-1)


def _kw_sorted_precompute(y: np.ndarray):
    """Sorted-order quantities for the missing-data KW kernels (depend
    on y only): order, per-position tie-group [start, end) indices and
    the distinct group boundaries."""
    n = y.shape[0]
    order = np.argsort(y, kind="stable")
    ys = y[order]
    new_grp = np.r_[True, ys[1:] != ys[:-1]] if n else np.zeros(0, bool)
    gid = np.cumsum(new_grp) - 1
    starts = np.flatnonzero(new_grp)
    ends = np.append(starts[1:], n)
    return order, starts[gid], ends[gid], starts, ends


def kruskal_wallis(G, y, ploidy: Optional[int] = None, dtype=None,
                   tile: int = 4096, mesh=None) -> Dict[str, np.ndarray]:
    """Per-SNP Kruskal-Wallis with tie correction (SURVEY.md A.6).

    Fully-observed genotypes: one global rank vector + class-sum matmuls.
    Missing genotypes: per-SNP subset ranks via sorted-order cumulative
    sums + tie-group gathers — still no Python loop over SNPs. A
    ResidentGenome sources both paths from packed HBM (no host decode).
    mesh: SNP-shard either path over a device mesh (the y-derived rank/
    tie-group vectors replicate; packed rows shard 'snp' only)."""
    import scipy.stats

    from mixmogam_tpu.data.genotype import GenotypeData
    from mixmogam_tpu.models.resident import ResidentGenome

    y = np.asarray(y, dtype=np.float64).ravel()
    n = y.shape[0]
    if dtype is None:
        dtype = jnp.zeros(0).dtype
    fdt = jnp.asarray(np.zeros(0, dtype)).dtype
    rg = G if isinstance(G, ResidentGenome) else None
    if rg is not None:
        if rg.n != n:
            raise ValueError(f"y has {n} samples but the resident "
                             f"genome holds {rg.n}")
        ploidy = rg.ploidy if ploidy is None else ploidy
        C = ploidy + 1
    else:
        if isinstance(G, GenotypeData):
            ploidy = G.ploidy if ploidy is None else ploidy
            G = G.matrix
        G = _as_classes(np.asarray(G))
        if ploidy is None:
            ploidy = _infer_ploidy(G)
        C = ploidy + 1
    if (rg.has_missing if rg is not None else (G < 0).any()):
        # sorted-order precompute depends on y only
        order, a, b, starts, ends = _kw_sorted_precompute(y)
        a_idx, b_idx = jnp.asarray(a), jnp.asarray(b)
        st_d, en_d = jnp.asarray(starts), jnp.asarray(ends)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from mixmogam_tpu.parallel.mesh import (
                gather_if_multiprocess, put_global, replicated)

            rep = replicated(mesh)
            if rg is not None:
                if mesh.shape["sample"] != 1:
                    raise ValueError(
                        "mesh-distributed packed class tests shard "
                        "'snp' only; use a ('snp', 1) mesh")
                from mixmogam_tpu.parallel.distributed import \
                    shard_packed_rows

                tsub = _subdivide_tile(rg.tile)
                packed = shard_packed_rows(rg, mesh, tsub)
                key = ("kw_packed", mesh, rg.n, tsub, C, str(fdt))
                fn = _CLASS_MESH_CACHE.get(key)
                if fn is None:
                    fn = jax.jit(jax.shard_map(
                        lambda p, o, a1, b1, s1_, e1: _kw_missing_packed(
                            p, o, a1, b1, s1_, e1, rg.n, tsub, C, fdt),
                        mesh=mesh,
                        in_specs=(P("snp", None),) + (P(),) * 5,
                        out_specs=(P("snp"),) * 3))
                    _CLASS_MESH_CACHE[key] = fn
                h, k, v = gather_if_multiprocess(fn(
                    packed, put_global(jnp.asarray(order), rep),
                    put_global(a_idx, rep), put_global(b_idx, rep),
                    put_global(st_d, rep), put_global(en_d, rep)), mesh)
                M_out = rg.M
            else:
                Gsrt = G[:, order]
                nshard = mesh.shape["snp"]
                M_out = G.shape[0]
                # cap the per-shard tile at the shard row count (tiny M
                # must not pad to nshard * default-tile dead rows)
                tile = min(tile, max(-(-M_out // nshard), 8))
                mult = nshard * tile
                target = -(-M_out // mult) * mult
                if target != M_out:
                    Gsrt = np.vstack([Gsrt, np.full(
                        (target - M_out, n), -1, np.int8)])
                key = ("kw_rows", mesh, tile, C, str(fdt))
                fn = _CLASS_MESH_CACHE.get(key)
                if fn is None:
                    def body(Gs_loc, a1, b1, s1_, e1):
                        nt = Gs_loc.shape[0] // tile
                        tls = Gs_loc.reshape(nt, tile, Gs_loc.shape[1])
                        h, k, v = jax.lax.map(
                            lambda t: _kw_missing_core(
                                t, a1, b1, s1_, e1, C, fdt), tls)
                        return (h.reshape(-1), k.reshape(-1),
                                v.reshape(-1))

                    fn = jax.jit(jax.shard_map(
                        body, mesh=mesh,
                        in_specs=(P("snp", None),) + (P(),) * 4,
                        out_specs=(P("snp"),) * 3))
                    _CLASS_MESH_CACHE[key] = fn
                h, k, v = gather_if_multiprocess(fn(
                    put_global(Gsrt, NamedSharding(mesh,
                                                   P("snp", None))),
                    put_global(a_idx, rep), put_global(b_idx, rep),
                    put_global(st_d, rep), put_global(en_d, rep)), mesh)
            hs = np.asarray(h, dtype=np.float64)[:M_out]
            ks = np.asarray(k, dtype=np.float64)[:M_out]
            vs = np.asarray(v)[:M_out]
        elif rg is not None:
            h, k, v = _kw_missing_packed(
                rg.packed, jnp.asarray(order), a_idx, b_idx, st_d, en_d,
                rg.n, _subdivide_tile(rg.tile), C, fdt)
            hs = np.asarray(h, dtype=np.float64)[:rg.M]
            ks = np.asarray(k, dtype=np.float64)[:rg.M]
            vs = np.asarray(v)[:rg.M]
        else:
            Gsrt = G[:, order]
            M = G.shape[0]
            hs = np.empty(M)
            ks = np.empty(M)
            vs = np.empty(M, dtype=bool)
            for s in range(0, M, tile):
                e = min(s + tile, M)
                chunk = Gsrt[s:e]
                if e - s < tile:
                    chunk = np.vstack(
                        [chunk, np.full((tile - (e - s), n), -1, np.int8)])
                h, k, v = _kw_missing_tile(jnp.asarray(chunk), a_idx,
                                           b_idx, st_d, en_d, C, fdt)
                hs[s:e] = np.asarray(h, dtype=np.float64)[: e - s]
                ks[s:e] = np.asarray(k, dtype=np.float64)[: e - s]
                vs[s:e] = np.asarray(v)[: e - s]
        ps = np.where(vs, chi2_sf_host(hs, np.maximum(ks - 1, 1)), 1.0)
        return {"ps": ps, "stats": np.where(vs, hs, 0.0)}
    ranks = scipy.stats.rankdata(y)
    # tie correction shared by all SNPs (same sample set everywhere)
    _, t = np.unique(y, return_counts=True)
    tie_c = 1.0 - np.sum(t**3 - t) / max(n**3 - n, 1)
    if rg is not None:
        W = jnp.asarray(np.column_stack([np.ones(n), ranks]), dtype=dtype)
        if mesh is not None:
            out = _sharded_class_sums_packed(rg, W, C, mesh)
        else:
            out = _class_sums_packed(rg.packed, W, rg.n,
                                     _subdivide_tile(rg.tile), C)
        out = np.asarray(out, dtype=np.float64)[:rg.M]
        cnt, rsum = out[:, :, 0], out[:, :, 1]
    else:
        M = G.shape[0]
        if mesh is not None:
            from mixmogam_tpu.parallel.mesh import put_global, replicated

            Gd = _shard_class_rows(G, mesh)
            rd = put_global(jnp.asarray(ranks, dtype=dtype),
                            replicated(mesh))
        else:
            Gd = jnp.asarray(G)
            rd = jnp.asarray(ranks, dtype=dtype)
        cnt, rsum = _class_sums(Gd, rd, C)
        if mesh is not None:
            from mixmogam_tpu.parallel.mesh import gather_if_multiprocess

            cnt, rsum = gather_if_multiprocess((cnt, rsum), mesh)
        cnt = np.asarray(cnt, dtype=np.float64)[:M]
        rsum = np.asarray(rsum, dtype=np.float64)[:M]
    with np.errstate(divide="ignore", invalid="ignore"):
        h = 12.0 / (n * (n + 1)) * np.where(
            cnt > 0, rsum**2 / np.maximum(cnt, 1), 0.0).sum(axis=1) \
            - 3.0 * (n + 1)
    k = (cnt > 0).sum(axis=1)
    valid = (k >= 2) & (tie_c > 0)
    h = np.where(valid, h / tie_c, 0.0)
    ps = np.where(valid, chi2_sf_host(h, np.maximum(k - 1, 1)), 1.0)
    return {"ps": ps, "stats": h}
