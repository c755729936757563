"""EMMAX: one REML fit + fully vectorized per-SNP rotated-GLS F-tests
(SURVEY.md A.3, §3.1; reference: linear_models.emmax / emmax_f_test).

Pipeline (device unless noted):
  host   parse/impute -> float tiles
  host   eigh(K), eigh(S(K+I)S)          [one-time; see ops.eigen]
  device REML grid+bisection             [ops.reml]
  device scan: tiles of (G @ W) + epilogue  [ops.scan]
  host   float64 p-values from F stats   [ops.stats]
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from mixmogam_tpu.ops.reml import fit_null_model
from mixmogam_tpu.ops.scan import build_rotated_null, emmax_scan_all
from mixmogam_tpu.ops.stats import f_sf_host


def _as_dosage(G, dtype) -> np.ndarray:
    """GenotypeData or array -> (M, n) float array with mean imputation."""
    from mixmogam_tpu.data.genotype import GenotypeData

    if isinstance(G, GenotypeData):
        return G.dosage_f64().astype(dtype)
    G = np.asarray(G)
    if G.dtype == np.int8 and (G < 0).any():
        Gf = G.astype(np.float64)
        Gf[G < 0] = np.nan
        mu = np.nanmean(Gf, axis=1)
        idx = np.where(np.isnan(Gf))
        Gf[idx] = mu[idx[0]]
        return Gf.astype(dtype)
    return G.astype(dtype)


def emmax(G, y, K=None, X0=None, eig_k: Optional[Tuple] = None,
          ngrids: int = 100, llim: float = -10.0, ulim: float = 10.0,
          esp: float = 1e-6, with_betas: bool = True,
          dtype=None, tile: int = 8192, host_eigh: bool = True,
          rotate_in_bf16: bool = False,
          ) -> Dict[str, np.ndarray]:
    """EMMAX scan. G: GenotypeData or (M, n) dosages; y: (n,) phenotype;
    K: (n, n) kinship (or pass eig_k=(phi, U)); X0: (n, q) null design
    (default intercept; append cofactor columns for conditioned scans).

    Returns {'ps','f_stats','betas','var_perc','mask',
             'pseudo_heritability','delta','sigma_g2','sigma_e2','dof'}
    with float64 host p-values (esp kept for signature parity with the
    reference; the device optimizer's fixed bisection is tighter).
    """
    del esp  # device bisection is tighter than the reference's tolerance
    y = np.asarray(y, dtype=np.float64).ravel()
    n = y.shape[0]
    if dtype is None:
        dtype = jnp.zeros(0).dtype  # respects jax_enable_x64
    Gf = _as_dosage(G, dtype)
    if X0 is None:
        X0 = np.ones((n, 1))
    X0 = np.atleast_2d(np.asarray(X0, dtype=np.float64))
    null = fit_null_model(y.astype(dtype), X0.astype(dtype), K=K,
                          eig_k=eig_k, ngrids=ngrids, llim=llim, ulim=ulim,
                          host_eigh=host_eigh)
    import jax.numpy as _jnp

    rot = build_rotated_null(
        null, rotate_dtype=_jnp.bfloat16 if rotate_in_bf16 else None)
    d = emmax_scan_all(jnp.asarray(Gf), rot, tile=tile)
    f_stats = np.asarray(d["f_stats"], dtype=np.float64)
    dof = int(rot.dof)
    ps = f_sf_host(f_stats, 1.0, dof)
    ps = np.where(np.asarray(d["mask"]), ps, 1.0)
    out = {
        "ps": ps, "f_stats": f_stats, "mask": np.asarray(d["mask"]),
        "pseudo_heritability": float(null.pseudo_heritability),
        "delta": float(null.delta), "sigma_g2": float(null.sigma_g2),
        "sigma_e2": float(null.sigma_e2), "dof": dof,
        "ll_null": float(null.ll),
    }
    if with_betas:
        out["betas"] = np.asarray(d["betas"], dtype=np.float64)
        out["var_perc"] = np.asarray(d["var_perc"], dtype=np.float64)
    return out


def emmax_anova(G, y, K=None, **kw) -> Dict[str, np.ndarray]:
    """EMMAX with the SNP coded as categorical (genotype-class means) —
    reference: emmax_anova. For binary coding this equals emmax();
    for diploid coding the heterozygote gets its own dof (F with d1=2).

    v1: implemented for binary data via emmax(); diploid categorical
    coding is handled by expanding G into indicator columns per class
    upstream."""
    return emmax(G, y, K=K, **kw)
