"""Two-SNP / epistasis scans (SURVEY.md §0 'Two-SNP / interaction scans';
reference: linear_models.emmax_two_snps).

For a focal SNP set A and a partner set B (defaults: A = B = all SNPs is
O(|A||B|) — the reference restricts A to top hits/regions, and so should
callers), each pair (a, b) gets:

  - 'cond' p: g_b tested with g_a as a cofactor  ([X0, g_a] vs + g_b)
  - 'inter' p: the product term g_a*g_b tested on top of [X0, g_a, g_b]

Vectorization: for each focal a (host loop, |A| is small), the partner axis
is one standard vectorized scan — conditional scans reuse pre-rotated
genotypes; interaction columns are formed in sample space and rotated with
one extra matmul per focal SNP."""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from mixmogam_tpu.models.emmax import _as_design, _as_dosage
from mixmogam_tpu.ops.eigen import eigen_k
from mixmogam_tpu.ops.reml import fit_null_model
from mixmogam_tpu.ops.scan import emmax_scan_all
from mixmogam_tpu.ops.stats import f_sf_host
from mixmogam_tpu.models.stepwise import _rot_null_from_delta


def emmax_two_snps(G, y, K=None, focal_idx: Optional[Sequence[int]] = None,
                   X0: Optional[np.ndarray] = None, eig_k=None,
                   ngrids: int = 100, llim: float = -10.0, ulim: float = 10.0,
                   dtype=None, tile: int = 8192,
                   refit_delta_per_focal: bool = False,
                   from_result=None, top_k: int = 32, mesh=None
                   ) -> Dict[str, np.ndarray]:
    """Pairwise scan of each focal SNP against all M partners.

    The focal set must be chosen explicitly: pass focal_idx (SNP row
    indices), or from_result (a prior scan's p-value array or dict with
    'ps', or a results.Result) to take its top_k hits. Passing neither
    raises — silently scanning an arbitrary subset would misreport the
    epistasis surface (all-pairs is O(M^2); restrict A like the
    reference does, to top hits or a candidate region).

    mesh: a device mesh shards the PARTNER axis ('snp'); the per-focal
    null replicates, and both the conditional scan and the pairwise
    interaction kernel are row-parallel (zero communication until the
    per-focal readback). The focal loop stays on host (|A| is small).

    Returns dict with 'cond_ps' and 'inter_ps' of shape (|A|, M), plus
    'focal_idx'. delta is fit once on the global null (EMMAX convention);
    refit_delta_per_focal=True re-fits REML with each focal cofactor
    (slower, closer to a per-pair mixed model)."""
    y = np.asarray(y, dtype=np.float64).ravel()
    n = y.shape[0]
    if dtype is None:
        dtype = jnp.zeros(0).dtype
    Gf = _as_dosage(G, dtype)
    M = Gf.shape[0]
    if focal_idx is None:
        if from_result is None:
            raise ValueError(
                "emmax_two_snps needs an explicit focal set: pass "
                "focal_idx=[...] (SNP row indices) or "
                "from_result=<prior scan> to use its top_k hits")
        ps = from_result
        if isinstance(ps, dict):
            ps = ps["ps"]
        elif hasattr(ps, "scores"):  # results.Result
            if ps.score_type == "pvals":
                ps = ps.scores
            elif ps.score_type == "neg_log_pvals":
                ps = np.power(10.0, -np.asarray(ps.scores))
            else:
                raise ValueError(
                    f"from_result Result has score_type "
                    f"{ps.score_type!r}; cannot rank hits — pass "
                    "p-values (score_type 'pvals'/'neg_log_pvals') or "
                    "an explicit focal_idx")
        ps = np.asarray(ps, dtype=np.float64).ravel()
        if ps.shape[0] != M:
            raise ValueError(
                f"from_result has {ps.shape[0]} p-values but G has {M} "
                "SNPs — the prior scan must cover the same SNP set")
        focal_idx = np.argsort(ps, kind="stable")[:min(top_k, M)]
    focal_idx = np.asarray(list(focal_idx), dtype=np.int64)
    if focal_idx.size == 0:
        raise ValueError("focal_idx is empty")
    if focal_idx.min() < 0 or focal_idx.max() >= M:
        raise ValueError(f"focal_idx out of range [0, {M})")
    if X0 is None:
        X0 = np.ones((n, 1))
    X0 = _as_design(X0, n)
    q = X0.shape[1]
    if eig_k is None:
        phi, U = eigen_k(K, host=True)
    else:
        phi, U = eig_k
    phi = jnp.asarray(phi, dtype=dtype)
    U = jnp.asarray(U, dtype=dtype)
    null = fit_null_model(y.astype(np.dtype(dtype).name), X0,
                          eig_k=(phi, U), ngrids=ngrids, llim=llim,
                          ulim=ulim)
    y_rot = U.T @ jnp.asarray(y, dtype=dtype)
    X0_rot = U.T @ jnp.asarray(X0, dtype=dtype)
    if mesh is not None:
        # partner axis sharded; the focal row gathers + the small
        # per-focal null replicate (eager ops preserve shardings)
        from jax.sharding import NamedSharding, PartitionSpec as P

        from mixmogam_tpu.parallel.mesh import (pad_to_multiple,
                                                put_global, replicated)

        Gp, _ = pad_to_multiple(Gf, mesh.shape["snp"], axis=0)
        Gd = put_global(Gp, NamedSharding(mesh, P("snp", None)))
        U = put_global(U, replicated(mesh))
        rep = replicated(mesh)
    else:
        Gd = jnp.asarray(Gf)
        rep = None
    G_rot = Gd @ U

    A = len(focal_idx)
    cond_ps = np.ones((A, M))
    inter_ps = np.ones((A, M))
    for i, a in enumerate(focal_idx):
        ga_rot = G_rot[a][:, None]
        Xa_rot = jnp.concatenate([X0_rot, ga_rot], axis=1)
        if refit_delta_per_focal:
            from mixmogam_tpu.ops.xreml import explicit_reml

            delta = explicit_reml(phi, y_rot, Xa_rot, ngrids=ngrids,
                                  llim=llim, ulim=ulim)["delta"]
        else:
            delta = null.delta
        # conditional scan: partner SNPs against [X0, g_a]
        rot_a = _rot_null_from_delta(phi, delta, y_rot, Xa_rot, dtype)
        if mesh is not None:
            import jax as _jax

            from mixmogam_tpu.parallel.distributed import _scan_sharded
            from mixmogam_tpu.parallel.mesh import gather_if_multiprocess

            rot_a = _jax.tree.map(lambda v: _jax.device_put(v, rep),
                                  rot_a)
            d = gather_if_multiprocess(
                _scan_sharded(G_rot, rot_a, pre_rotated=True), mesh)
        else:
            d = emmax_scan_all(G_rot, rot_a, tile=tile, pre_rotated=True)
        f = np.asarray(d["f_stats"], dtype=np.float64)[:M]
        cond_ps[i] = np.where(np.asarray(d["mask"])[:M],
                              f_sf_host(f, 1.0, rot_a.dof), 1.0)
        # interaction: product columns, null = [X0, g_a, g_b] per pair.
        # The null design differs per PAIR; testing the product on top of
        # [X0, g_a] + g_b as cofactor-of-the-pair is handled by scanning
        # the product against [X0, g_a] jointly with g_b:
        # build products in sample space, rotate once for this focal SNP
        ga = Gd[a]
        prod_rot = (Gd * ga[None, :]) @ U
        # residualize the product against [X0, g_a, g_b]: approximate the
        # per-pair null by conditioning on g_a (shared) and projecting g_b
        # per pair inside the scan via the 2-column trick: scan the product
        # with cofactors [X0, g_a] and partner g_b appended pairwise.
        # Implemented exactly: for the F-test of the product with per-pair
        # null, use the identity rss(pair null) = rss([X0,g_a]) - expl(g_b),
        # and test the product's residual against BOTH bases:
        dpair = _pairwise_interaction(G_rot, prod_rot, rot_a)
        if mesh is not None:
            from mixmogam_tpu.parallel.mesh import gather_if_multiprocess

            dpair = gather_if_multiprocess(dpair, mesh)
        inter_f = np.asarray(dpair["f_stats"], dtype=np.float64)[:M]
        inter_ps[i] = np.where(np.asarray(dpair["mask"])[:M],
                               f_sf_host(inter_f, 1.0,
                                         float(rot_a.dof) - 1.0), 1.0)
    return {"cond_ps": cond_ps, "inter_ps": inter_ps,
            "focal_idx": focal_idx, "delta": float(null.delta),
            "pseudo_heritability": float(null.pseudo_heritability)}


def _pairwise_interaction(G_rot, prod_rot, rot_a):
    """Exact per-pair interaction F-test in the whitened basis.

    For each pair: null = span(Q0a, b*), test column = p* (the whitened
    product). Gram-Schmidt the pair against the shared orthonormal Q0a,
    then against each other — all elementwise over the partner axis.
    rot_a is passed as a pytree ARGUMENT (closing over it would bake its
    arrays into the executable and recompile per focal SNP); the kernel
    lives at module scope so all |A| focal iterations share ONE trace
    (review r5-cont: a per-call inner @jit re-traced per focal SNP)."""
    return _pairwise_run(G_rot, prod_rot, rot_a)


def _make_pairwise_run():
    import jax

    @jax.jit
    def run(G_rot, prod_rot, rot_a):
        sd = rot_a.sd
        Q0 = rot_a.Q0
        y_res = rot_a.y_res
        rss0 = rot_a.rss0
        B = G_rot * sd[None, :]                     # whitened partners
        P = prod_rot * sd[None, :]                  # whitened products
        dt = B.dtype
        eps = 100.0 * jnp.finfo(dt).eps

        def orth(X):  # residualize rows of X against Q0
            return X - (X @ Q0) @ Q0.T

        Br = orth(B)
        Pr = orth(P)
        bb = jnp.sum(Br * Br, axis=1)
        maskb = bb > eps * jnp.maximum(jnp.sum(B * B, axis=1),
                                       jnp.finfo(dt).tiny)
        bb_safe = jnp.where(maskb, bb, 1.0)
        # residualize product against the partner direction
        pb = jnp.sum(Pr * Br, axis=1)
        Pr2 = Pr - (pb / bb_safe)[:, None] * Br
        pp = jnp.sum(Pr2 * Pr2, axis=1)
        maskp = pp > eps * jnp.maximum(jnp.sum(P * P, axis=1),
                                       jnp.finfo(dt).tiny)
        pp_safe = jnp.where(maskp, pp, 1.0)
        # rss of pair null = rss0 - (b'y)^2/bb
        by = Br @ y_res
        rss_pair = rss0 - jnp.where(maskb, by * by / bb_safe, 0.0)
        py = Pr2 @ y_res
        expl = jnp.where(maskp, jnp.minimum(py * py / pp_safe, rss_pair), 0.0)
        rss1 = jnp.maximum(rss_pair - expl, jnp.finfo(dt).tiny)
        dof = jnp.asarray(rot_a.dof, dt) - 1.0  # one more pair-null column
        f = expl * dof / rss1
        mask = maskb & maskp
        return {"f_stats": jnp.where(mask, f, 0.0), "mask": mask}

    return run


_pairwise_run = _make_pairwise_run()
