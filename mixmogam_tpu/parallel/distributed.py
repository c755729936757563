"""Multi-chip / multi-host GWAS (SURVEY.md §2.3, §5 'distributed comm
backend'; BASELINE north star):

- genotypes sharded SNP-wise: NamedSharding(mesh, P('snp', 'sample'))
- kinship accumulated across SNP shards with ONE psum of the (n, n)
  partial Gram matrix per run (~400 MB at n=10k over ICI — fine)
- the eigendecomposed null model (phi, U, delta, whitened residuals) is
  REPLICATED to every chip
- the scan phase needs ZERO cross-chip communication: each chip tests its
  own SNP shard against the replicated null; results are all_gather'ed
  once at the end — this is the scaling-efficiency story.

Everything is expressed as jit + sharding annotations (GSPMD): XLA inserts
the psum/all_gather collectives; there is no hand-written NCCL analog.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mixmogam_tpu.ops.reml import fit_null_model
from mixmogam_tpu.ops.scan import RotatedNull, build_rotated_null
from mixmogam_tpu.parallel.mesh import (make_mesh, pad_to_multiple,
                                        put_global, put_global_tree,
                                        replicated, snp_sharding)


# ---------------------------------------------------------------------------
# kinship: psum over SNP shards
# ---------------------------------------------------------------------------

def _ibs_partial(Gs: jnp.ndarray) -> jnp.ndarray:
    """Local IBS contribution 2 C'C - s(x)1 - 1(x)s + m J of a SNP shard
    (binary coding; see ops.kinship)."""
    dt = Gs.dtype
    CtC = jnp.dot(Gs.T, Gs, preferred_element_type=dt)
    s = jnp.sum(Gs, axis=0)
    m = jnp.asarray(Gs.shape[0], dt)
    return 2.0 * CtC - s[:, None] - s[None, :] + m


def distributed_kinship(G, mesh: Optional[Mesh] = None,
                        method: str = "ibs") -> np.ndarray:
    """Kinship over a SNP-sharded genotype matrix. The partial Gram matrix
    reduces across the 'snp' axis — expressed by asking for a REPLICATED
    output, which makes GSPMD emit the psum."""
    if mesh is None:
        mesh = make_mesh()
    G = np.asarray(G)
    # normative missing handling — the same per-SNP mean-imputation rule
    # as ops.kinship (_impute_chunk): negative sentinels in ANY signed
    # integer dtype / float NaN. Without this, -1 entries silently bias
    # C'C and the allele frequencies below.
    if ((np.issubdtype(G.dtype, np.integer) and (G < 0).any())
            or (np.issubdtype(G.dtype, np.floating) and np.isnan(G).any())):
        from mixmogam_tpu.ops.kinship import _impute_chunk

        G = _impute_chunk(G, np.float64)
    M = G.shape[0]
    nshard = mesh.shape["snp"]
    Gp, M0 = pad_to_multiple(G, nshard, axis=0)
    Gd = put_global(Gp, snp_sharding(mesh))

    if method == "ibs":
        if (G.max(initial=0) if not np.issubdtype(G.dtype, np.floating)
                else np.nanmax(G, initial=0)) > 1:
            raise ValueError(
                "distributed_kinship(method='ibs') implements the BINARY "
                "allele-sharing formula; for diploid dosages use "
                "method='vanraden' here or ops.kinship.kinship (diploid "
                "IBS) on the host path")
        # zero pad rows contribute C'C=0, s=0 but DO count in the +m J
        # term; subtract the pad count explicitly
        pad = Gp.shape[0] - M0

        @functools.partial(jax.jit,
                           out_shardings=replicated(mesh))
        def compute(Gd):
            return _ibs_partial(Gd) - jnp.asarray(pad, Gd.dtype)

        K = compute(Gd)
        return np.asarray(K, dtype=np.float64) / M0
    elif method in ("vanraden", "ibd"):
        p = Gp.mean(axis=1)  # host: per-SNP allele frequency (pad rows: 0)
        ploidy = 2 if G.max(initial=0) > 1 else 1
        pf = p / ploidy
        denom = float(ploidy * np.sum(pf[:M0] * (1.0 - pf[:M0])))
        Wp = Gp - (ploidy * pf)[:, None]
        Wp[M0:] = 0.0
        Wd = put_global(Wp, snp_sharding(mesh))

        @functools.partial(jax.jit, out_shardings=replicated(mesh))
        def compute(Wd):
            return jnp.dot(Wd.T, Wd, preferred_element_type=Wd.dtype)

        return np.asarray(compute(Wd), dtype=np.float64) / denom
    raise ValueError(f"unknown method {method!r}")


# ---------------------------------------------------------------------------
# scan: embarrassingly parallel over SNP shards, one gather at the end
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("pre_rotated",),
                   donate_argnums=())
def _scan_sharded(Gd, rot: RotatedNull, pre_rotated: bool = False):
    """Whole-matrix scan; with Gd SNP-sharded and rot replicated, XLA
    partitions every op row-wise — zero communication until outputs."""
    from mixmogam_tpu.ops.scan import emmax_scan_stats

    return emmax_scan_stats(Gd, rot, pre_rotated=pre_rotated)


def rot_shardings(mesh: Mesh, rot: RotatedNull):
    """Shardings for the RotatedNull pytree (SURVEY §2.3 TP row).

    With a 1-wide 'sample' axis everything replicates (the DP default).
    With sample > 1 the (n, n) rotate+whiten operator W — the HBM hog at
    large n (fp32 W alone is 10 GB at n = 50k) — is sharded over its
    CONTRACTION rows, matching G's column sharding in snp_sharding:
    each chip holds W[rows_s, :] and G[:, rows_s], computes the partial
    rotation locally, and XLA psums the (tile, n) partials over the
    'sample' axis — the classic tensor-parallel matmul. comm/compute =
    S/n per tile: negligible for n >> mesh width. The small n-vectors
    (sd, y_res) and (n, q) Q0 stay replicated."""
    if mesh.shape["sample"] == 1:
        return jax.tree.map(lambda _: replicated(mesh), rot)
    rep = replicated(mesh)
    w_spec = (P(None, "sample", None) if rot.W.ndim == 3  # (k, n, n) tiers
              else P("sample", None))
    return RotatedNull(
        W=NamedSharding(mesh, w_spec), sd=rep, Q0=rep, y_res=rep,
        rss0=rep, dof=rep,
        w_scale=None if rot.w_scale is None else rep)


_SCAN_GATHERED_CACHE: Dict = {}


def _scan_sharded_gathered(mesh: Mesh):
    """Like _scan_sharded but with REPLICATED outputs — the run's single
    all_gather (SURVEY §2.3), and the form every process can read when the
    mesh spans multiple processes (sharded outputs are only partially
    addressable there). Jitted once per mesh."""
    fn = _SCAN_GATHERED_CACHE.get(mesh)
    if fn is None:
        from mixmogam_tpu.ops.scan import emmax_scan_stats

        fn = jax.jit(lambda Gd, rot: emmax_scan_stats(Gd, rot),
                     out_shardings=replicated(mesh))
        _SCAN_GATHERED_CACHE[mesh] = fn
    return fn


def distributed_emmax(G, y, K=None, X0: Optional[np.ndarray] = None,
                      mesh: Optional[Mesh] = None, eig_k=None,
                      ngrids: int = 100, llim: float = -10.0,
                      ulim: float = 10.0, esp: float = 1e-6, dtype=None,
                      rotate_in_bf16=False, host_eigh: bool = True,
                      ) -> Dict[str, np.ndarray]:
    """EMMAX over a device mesh. Same numerics as models.emmax (parity
    tested mesh-shape-invariant); G may exceed single-chip HBM by the
    mesh 'snp' factor. rotate_in_bf16 selects the same precision tiers
    as models.emmax (False | True | 'x2' | 'x3' | 'x2c' | 'x3c' |
    'int8x2' | 'int8x3' | 'int8x4')."""
    from mixmogam_tpu.ops.stats import f_sf_host

    if mesh is None:
        mesh = make_mesh()
    y = np.asarray(y, dtype=np.float64).ravel()
    n = y.shape[0]
    if dtype is None:
        dtype = jnp.zeros(0).dtype
    from mixmogam_tpu.models.emmax import _as_design, _as_dosage

    Gf = _as_dosage(G, dtype)
    M = Gf.shape[0]
    if X0 is None:
        X0 = np.ones((n, 1))
    X0 = _as_design(X0, n)
    from mixmogam_tpu.ops.reml import esp_to_refine_iters

    null = fit_null_model(y.astype(np.dtype(dtype).name), X0, K=K,
                          eig_k=eig_k, ngrids=ngrids, llim=llim, ulim=ulim,
                          refine_iters=esp_to_refine_iters(
                              esp, ngrids, llim, ulim),
                          host_eigh=host_eigh)
    from mixmogam_tpu.ops.scan import normalize_rotate_tier

    from mixmogam_tpu.ops.scan import is_integer_dosage

    rd = normalize_rotate_tier(rotate_in_bf16)
    if (isinstance(rd, str) and rd.startswith("int8")
            and not is_integer_dosage(Gf)):
        raise ValueError(
            f"rotate_in_bf16={rotate_in_bf16!r} requires integer dosages "
            "(digit-plane matmuls round genotypes to int8)")
    rot = build_rotated_null(null, rotate_dtype=rd)
    nshard = mesh.shape["snp"]
    Gp, M0 = pad_to_multiple(Gf, nshard, axis=0)
    if mesh.shape["sample"] > 1 and Gp.shape[1] % mesh.shape["sample"]:
        # sample axis must split evenly for the TP sharding: zero-pad
        # sample columns and the matching CONTRACTION rows of W (zero
        # cols x zero rows contribute nothing to the rotation)
        Gp, _ = pad_to_multiple(Gp, mesh.shape["sample"], axis=1)
        rot = dataclasses.replace(rot, W=_pad_w_rows(rot.W, Gp.shape[1]))
    # null model: replicated on a DP mesh; W row-sharded over 'sample'
    # on a TP mesh (see rot_shardings); genotypes SNP-sharded either way
    rot = jax.tree.map(put_global, rot, rot_shardings(mesh, rot))
    Gd = put_global(Gp, snp_sharding(mesh))
    d = (_scan_sharded(Gd, rot) if jax.process_count() == 1
         else _scan_sharded_gathered(mesh)(Gd, rot))
    f_stats = np.asarray(d["f_stats"], dtype=np.float64)[:M0]
    mask = np.asarray(d["mask"])[:M0]
    dof = int(null.y.shape[0] - X0.shape[1] - 1)
    ps = np.where(mask, f_sf_host(f_stats, 1.0, dof), 1.0)
    return {"ps": ps, "f_stats": f_stats, "mask": mask,
            "betas": np.asarray(d["betas"], dtype=np.float64)[:M0],
            "var_perc": np.asarray(d["var_perc"], dtype=np.float64)[:M0],
            "pseudo_heritability": float(null.pseudo_heritability),
            "delta": float(null.delta), "dof": dof,
            "sigma_g2": float(null.sigma_g2),
            "sigma_e2": float(null.sigma_e2),
            "ll_null": float(null.ll)}


def _tp_resident_kernel(n: int, tile: int, impute: bool):
    """shard_map body for the SAMPLE-SHARDED packed scan (SURVEY §2.3
    TP row; VERDICT r4 #3). Each device holds a (rows_local, rb_local)
    byte block = 4*rb_local consecutive samples of its SNP shard, and
    the matching CONTRACTION-row block of the (zero-row-padded) rotation
    operator W. Per tile: unpack locally, cross-shard mean-impute via
    psum'd moments (missing data), partial-rotate, reduce over 'sample'
    (int8 planes reduce in int32 — bit-identical to single-device), and
    run the shared epilogue on the full whitened rows. Outputs are
    replicated over 'sample' (everything after the psum is identical on
    every sample shard)."""
    from mixmogam_tpu.ops.pack2 import unpack_2bit_device
    from mixmogam_tpu.ops.scan import apply_rotation_psum, scan_epilogue

    def kernel(p_loc, rot_loc):
        dt = rot_loc.sd.dtype
        rb_local = p_loc.shape[1]
        n_local = 4 * rb_local
        col0 = jax.lax.axis_index("sample") * n_local
        T = p_loc.shape[0] // tile
        tiles = p_loc.reshape(T, tile, rb_local)

        def kern(pt):
            Gt = unpack_2bit_device(pt, n_local)
            # pad sample columns (>= n, zero bytes -> dosage 0) meet
            # ZERO rows of the padded W, so only the imputation moments
            # need the validity mask
            if impute:
                valid = (col0 + jnp.arange(n_local)) < n
                miss = Gt < 0
                obs = jnp.where(miss | ~valid[None, :], 0.0,
                                Gt.astype(dt))
                cnt = jax.lax.psum(
                    jnp.sum((~miss) & valid[None, :], axis=1), "sample")
                mu = (jax.lax.psum(jnp.sum(obs, axis=1), "sample")
                      / jnp.maximum(cnt, 1).astype(dt))
                Gf = jnp.where(valid[None, :],
                               jnp.where(miss, mu[:, None],
                                         Gt.astype(dt)), 0.0)
                Xs = apply_rotation_psum(Gf, rot_loc.W, rot_loc.w_scale,
                                         dt, "sample",
                                         rot_loc.sd.shape[0])
            else:
                Xs = apply_rotation_psum(Gt, rot_loc.W, rot_loc.w_scale,
                                         dt, "sample",
                                         rot_loc.sd.shape[0])
            return scan_epilogue(Xs, rot_loc)

        out = jax.lax.map(kern, tiles)
        return {k: v.reshape(T * tile) for k, v in out.items()}

    return kernel


def shard_packed_rows(rg, mesh: Mesh, tile: int,
                      sample_axis: bool = False):
    """Device placement of a ResidentGenome's packed rows over the mesh,
    MEMOIZED per (mesh, row pad, byte pad) on the container (review r5
    #1/#6): repeated sharded calls over one genome — per-chromosome
    LOCO, GxE + permutation sweeps — reuse one transfer instead of
    re-copying and re-uploading ~GBs per call. Rows pad to
    nshard*tile; sample_axis=True additionally pads the byte axis to
    whole bytes per 'sample' shard and shards P('snp', 'sample').
    Returns the placed array."""
    nshard = mesh.shape["snp"]
    S = mesh.shape["sample"] if sample_axis else 1
    key = (mesh, nshard * tile, S)
    cache = getattr(rg, "_shard_cache", None)
    if cache is None:
        cache = {}
        try:
            rg._shard_cache = cache
        except AttributeError:
            return _place_packed(rg, mesh, tile, S)
    if key not in cache:
        cache[key] = _place_packed(rg, mesh, tile, S)
    return cache[key]


def _place_packed(rg, mesh: Mesh, tile: int, S: int):
    hp = (rg.host_packed if rg.host_packed is not None
          else np.asarray(rg.packed))
    host_packed, _ = pad_to_multiple(np.asarray(hp),
                                     mesh.shape["snp"] * tile, axis=0)
    if S > 1:
        host_packed, _ = pad_to_multiple(host_packed, S, axis=1)
        spec = P("snp", "sample")
    else:
        spec = P("snp", None)
    return put_global(host_packed, NamedSharding(mesh, spec))


#: jitted resident shard_map programs, keyed on everything that shapes
#: the trace — per-chromosome LOCO (22 calls over one mesh) then traces
#: ONCE (review r5 #1; the rot rides as an ARGUMENT, never baked in)
_RES_SCAN_CACHE: Dict = {}


def _resident_scan_jit(mesh: Mesh, n: int, tile: int, impute: bool,
                       S: int, w_ndim: int, wscale_none: bool,
                       pre_rotated: bool = False):
    from mixmogam_tpu.models.resident import emmax_scan_packed

    key = (mesh, n, tile, impute, S, w_ndim, wscale_none, pre_rotated)
    fn = _RES_SCAN_CACHE.get(key)
    if fn is not None:
        return fn
    if pre_rotated and S != 1:
        raise ValueError("the pre-rotated (identity-whitening) scan has "
                         "no rotation operator to sample-shard; use a "
                         "('snp', 1) mesh")
    if S == 1:
        rot_spec = RotatedNull(
            W=P(), sd=P(), Q0=P(), y_res=P(), rss0=P(), dof=P(),
            w_scale=None if wscale_none else P())
        body = (lambda p, r: emmax_scan_packed(p, r, n, tile,
                                               impute=impute,
                                               pre_rotated=pre_rotated))
        row_spec = P("snp", None)
    else:
        w_spec = (P(None, "sample", None) if w_ndim == 3
                  else P("sample", None))
        rot_spec = RotatedNull(
            W=w_spec, sd=P(), Q0=P(), y_res=P(), rss0=P(), dof=P(),
            w_scale=None if wscale_none else P())
        body = _tp_resident_kernel(n, tile, impute)
        row_spec = P("snp", "sample")
    fn = jax.jit(jax.shard_map(body, mesh=mesh,
                               in_specs=(row_spec, rot_spec),
                               out_specs=P("snp")))
    _RES_SCAN_CACHE[key] = (fn, rot_spec)
    return fn, rot_spec


def _pad_w_rows(W: jnp.ndarray, n_pad: int) -> jnp.ndarray:
    """Zero-pad the rotation operator's CONTRACTION rows to the
    byte-aligned padded sample count (pad samples x zero rows = no
    contribution, for every tier representation)."""
    if W.ndim == 3:                       # stacked tiers (k, n, n)
        pad = n_pad - W.shape[1]
        return W if pad == 0 else jnp.pad(W, ((0, 0), (0, pad), (0, 0)))
    pad = n_pad - W.shape[0]              # (n, n) / concat (n, k*n)
    return W if pad == 0 else jnp.pad(W, ((0, pad), (0, 0)))


def distributed_emmax_resident(rg, y, K=None, X0: Optional[np.ndarray] = None,
                               mesh: Optional[Mesh] = None, eig_k=None,
                               ngrids: int = 100, llim: float = -10.0,
                               ulim: float = 10.0, esp: float = 1e-6,
                               dtype=None, rotate_in_bf16=False,
                               host_eigh: bool = True,
                               ) -> Dict[str, np.ndarray]:
    """EMMAX over a sharded 2-bit packed genome (models.resident) on a
    device mesh: each chip holds its packed shard (1/nshard of 2 bits/
    genotype — 16 chips hold a 16M x 10k genome at 2.7 GB/chip), the
    null model replicates, and each chip runs the single-dispatch
    unpack+rotate+scan program over its shard via shard_map. On a
    DP-only ('snp', 1) mesh there is ZERO cross-chip communication
    until the final result gather.

    A 2-D ('snp', 'sample') mesh additionally SAMPLE-SHARDS the packed
    byte axis (VERDICT r4 #3): the byte axis is padded to a multiple of
    the sample-axis width so each shard holds whole bytes (4 samples/
    byte), W is row-sharded over its contraction axis with zero-padded
    rows for the pad samples, and each tile's partial rotation reduces
    over 'sample' (int8 digit planes reduce their int32 accumulators —
    bit-identical to the single-device scan). This splits BOTH the
    packed genome's HBM AND the n^2 operator W across the sample axis —
    the large-n story where W alone outgrows one chip."""
    from mixmogam_tpu.models.emmax import _as_design
    from mixmogam_tpu.ops.reml import esp_to_refine_iters
    from mixmogam_tpu.ops.scan import normalize_rotate_tier
    from mixmogam_tpu.ops.stats import f_sf_host

    if mesh is None:
        mesh = make_mesh()
    S = mesh.shape["sample"]
    y = np.asarray(y, dtype=np.float64).ravel()
    n = y.shape[0]
    if n != rg.n:
        raise ValueError(f"y has {n} samples, resident genome {rg.n}")
    if dtype is None:
        dtype = jnp.zeros(0).dtype
    if X0 is None:
        X0 = np.ones((n, 1))
    X0 = _as_design(X0, n)
    null = fit_null_model(y.astype(np.dtype(dtype).name), X0, K=K,
                          eig_k=eig_k, ngrids=ngrids, llim=llim, ulim=ulim,
                          refine_iters=esp_to_refine_iters(
                              esp, ngrids, llim, ulim),
                          host_eigh=host_eigh)
    rd = normalize_rotate_tier(rotate_in_bf16)
    if isinstance(rd, str) and rd.startswith("int8") and rg.has_missing:
        raise ValueError("int8 tiers need fully-observed dosages")
    rot = build_rotated_null(null, rotate_dtype=rd)

    tile = rg.tile
    # packed shards + the jitted shard_map program are both MEMOIZED
    # (review r5 #1): per-chromosome LOCO calls this 22 times over one
    # container/mesh — one upload + one trace, not 22
    packed = shard_packed_rows(rg, mesh, tile, sample_axis=S > 1)
    if S > 1:
        # sample-TP: W rows pad to the byte-padded sample count
        rot = dataclasses.replace(
            rot, W=_pad_w_rows(rot.W, 4 * packed.shape[1]))
    fn, rot_spec = _resident_scan_jit(
        mesh, rg.n, tile, rg.has_missing, S,
        getattr(rot.W, "ndim", 2), rot.w_scale is None)
    rot_d = jax.tree.map(
        lambda v, s: put_global(v, NamedSharding(mesh, s)),
        rot, rot_spec)
    d = fn(packed, rot_d)
    if jax.process_count() > 1:
        # sharded outputs are only partially addressable across
        # processes; replicate = the run's one all_gather
        d = jax.jit(lambda t: t, out_shardings=replicated(mesh))(d)
    M = rg.M
    f_stats = np.asarray(d["f_stats"], dtype=np.float64)[:M]
    mask = np.asarray(d["mask"])[:M]
    dof = int(n - X0.shape[1] - 1)
    ps = np.where(mask, f_sf_host(f_stats, 1.0, dof), 1.0)
    return {"ps": ps, "f_stats": f_stats, "mask": mask,
            "betas": np.asarray(d["betas"], dtype=np.float64)[:M],
            "var_perc": np.asarray(d["var_perc"], dtype=np.float64)[:M],
            "pseudo_heritability": float(null.pseudo_heritability),
            "delta": float(null.delta), "dof": dof,
            "sigma_g2": float(null.sigma_g2),
            "sigma_e2": float(null.sigma_e2),
            "ll_null": float(null.ll)}


# ---------------------------------------------------------------------------
# the full multi-chip 'training step' (graft dryrun entry): kinship psum +
# REML + multi-trait sharded scan + device-side top-k gather
# ---------------------------------------------------------------------------

def distributed_train_step(mesh: Mesh, G: np.ndarray, Y: np.ndarray,
                           top_k: int = 8) -> Dict[str, np.ndarray]:
    """One end-to-end GWAS 'step' jitted over the mesh with the real
    shardings: dp ('snp') for genotypes, tp ('sample') available on the
    second axis, multi-trait batch as the EP-analog axis (replicated),
    kinship psum, replicated null, per-shard scan, device top-k + gather.

    Tiny-shape dry runs of THIS function validate the multi-chip program
    (driver: __graft_entry__.dryrun_multichip)."""
    from mixmogam_tpu.ops.eigen import eigen_k, projected_spectrum
    from mixmogam_tpu.ops.reml import reml_from_spectrum

    G = np.asarray(G, dtype=np.float32)
    Y = np.atleast_2d(np.asarray(Y, dtype=np.float32))   # (T, n)
    T, n = Y.shape
    nshard = mesh.shape["snp"]
    Gp, M0 = pad_to_multiple(G, nshard, axis=0)
    Gd = put_global(Gp, snp_sharding(mesh))
    Yd = put_global(Y, replicated(mesh))
    pad = Gp.shape[0] - M0

    # K via psum (on-device, sharded in / replicated out)
    @functools.partial(jax.jit, out_shardings=replicated(mesh))
    def kin(Gd):
        return (_ibs_partial(Gd) - jnp.asarray(pad, Gd.dtype)) / M0

    K = kin(Gd)
    # one-time eigendecompositions (host, SURVEY §7), then replicated
    phi, U = eigen_k(np.asarray(K, dtype=np.float64), host=True)
    X0 = np.ones((n, 1), dtype=np.float32)
    xi, V = projected_spectrum(np.asarray(K, np.float64), X0, host=True)
    phi = put_global(jnp.asarray(phi, jnp.float32), replicated(mesh))
    U = put_global(jnp.asarray(U, jnp.float32), replicated(mesh))
    xi = put_global(jnp.asarray(xi, jnp.float32), replicated(mesh))
    V = put_global(jnp.asarray(V, jnp.float32), replicated(mesh))
    X0d = put_global(jnp.asarray(X0), replicated(mesh))

    @functools.partial(
        jax.jit,
        out_shardings=(replicated(mesh), replicated(mesh),
                       replicated(mesh)))
    def step(Gd, Yd, phi, U, xi, V, X0d):
        # per-trait REML (vmapped over the trait axis — the 'EP' analog)
        eta2 = (Yd @ V) ** 2
        remls = jax.vmap(lambda e: reml_from_spectrum(e, xi))(eta2)
        deltas = remls["delta"]                       # (T,)

        # per-trait whitened nulls in the eigenbasis
        sd = 1.0 / jnp.sqrt(phi[None, :] + deltas[:, None])     # (T, n)
        Y_rot = Yd @ U
        X0_rot = U.T @ X0d
        Ys = Y_rot * sd
        X0s = X0_rot[None] * sd[:, :, None]                      # (T, n, q)
        from mixmogam_tpu.ops.xreml import inv_small

        A = jnp.einsum("tnp,tnq->tpq", X0s, X0s)
        binv = inv_small(A)                   # q tiny; unrolled, no LAPACK
        coef = jnp.einsum("tpq,tq->tp", binv,
                          jnp.einsum("tnp,tn->tp", X0s, Ys))
        y_res = Ys - jnp.einsum("tnp,tp->tn", X0s, coef)
        rss0 = jnp.sum(y_res * y_res, axis=1)

        # sharded scan: rotate each chip's SNP shard, test all traits
        G_rot = Gd @ U                                           # sharded
        def per_trait(sd_t, y_res_t, rss0_t, X0s_t, binv_t):
            Xs = G_rot * sd_t[None, :]
            c = Xs @ X0s_t
            ss = jnp.sum(Xs * Xs, axis=1)
            xx = ss - jnp.einsum("mq,qp,mp->m", c, binv_t, c)
            xy = Xs @ y_res_t
            eps = 100.0 * jnp.finfo(Xs.dtype).eps
            mk = xx > eps * jnp.maximum(ss, jnp.finfo(Xs.dtype).tiny)
            expl = jnp.where(mk, jnp.minimum(
                xy * xy / jnp.where(mk, xx, 1.0), rss0_t), 0.0)
            f = expl * (n - 2) / jnp.maximum(rss0_t - expl,
                                             jnp.finfo(Xs.dtype).tiny)
            return jnp.where(mk, f, 0.0)

        F = jax.vmap(per_trait)(sd, y_res, rss0, X0s, binv)      # (T, Mp)
        # device-side top-k per trait; the gather to replicated output is
        # the run's single all_gather
        topv, topi = jax.lax.top_k(F, top_k)
        return topv, topi, deltas

    topv, topi, deltas = step(Gd, Yd, phi, U, xi, V, X0d)
    return {"top_f": np.asarray(topv), "top_idx": np.asarray(topi),
            "deltas": np.asarray(deltas), "K": np.asarray(K)}
