"""Statistical distributions for GWAS tests.

The reference leans on scipy.stats.f.sf / chi2.sf (SURVEY.md §3.1). On
device we compute F statistics; p-values are finalized EITHER on device via
betainc (good to ~1e-6 relative in float64, fp32-limited otherwise) OR on
host in float64 scipy (default — preserves p ~ 1e-300 tails exactly;
SURVEY.md §7 'p-value tails in fp32')."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def f_sf(f_stat, d1, d2):
    """Survival function of the F(d1, d2) distribution, via the regularized
    incomplete beta: sf = I_{d2/(d2+d1 f)}(d2/2, d1/2)."""
    f_stat = jnp.asarray(f_stat)
    x = d2 / (d2 + d1 * jnp.maximum(f_stat, 0.0))
    return jax.scipy.special.betainc(d2 / 2.0, d1 / 2.0, x)


def chi2_sf(x, df):
    return jax.scipy.special.gammaincc(df / 2.0, jnp.asarray(x) / 2.0)


def f_sf_host(f_stat, d1, d2) -> np.ndarray:
    """Float64 host finalization (scipy) — the default output path."""
    import scipy.stats

    return scipy.stats.f.sf(np.asarray(f_stat, dtype=np.float64), d1, d2)


def chi2_sf_host(x, df) -> np.ndarray:
    import scipy.stats

    return scipy.stats.chi2.sf(np.asarray(x, dtype=np.float64), df)


def neg_log10_f_sf(f_stat, d1, d2):
    """-log10 p on device without underflow (for device-side top-k ranking
    when p < 1e-38 would flush to 0 in fp32): via log-beta asymptotics is
    overkill — monotonicity of F is enough for ranking, so we rank by F and
    only report -log10 p from the host path. Provided for completeness."""
    p = f_sf(f_stat, d1, d2)
    tiny = jnp.finfo(p.dtype).tiny
    return -jnp.log10(jnp.maximum(p, tiny))
