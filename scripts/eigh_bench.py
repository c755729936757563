"""eigh strategy sweep for the one O(n^3) step (BASELINE metric 'REML
eigh wall-time', SURVEY §7 hard-parts).

Host part (no TPU): scipy drivers evr (scipy default) / evd (divide &
conquer = LAPACK dsyevd, what numpy.linalg.eigh calls) / ev, plus
float32 ssyevd, at n=10,240 on this 2-vCPU host.

Device part (TPU): jnp.linalg.eigh in float32 at the same n — compile
wall (remote toolchain, persistent cache) + run wall + accuracy vs the
float64 host decomposition (residual, eigenvalue drift, and the
downstream REML-delta / p-value drift that actually matters).

Usage: python scripts/eigh_bench.py host|device [n]
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
CACHE = os.path.expanduser("~/.cache/mixmogam_bench")


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, file=sys.stderr, flush=True)


def get_k(n):
    p = os.path.join(CACHE, f"sim_{n}x65536.npz")
    if os.path.exists(p):
        with np.load(p) as z:
            return z["K"].astype(np.float64), z["y"]
    big = os.path.join(CACHE, f"K_{n}x1048576.npy")
    if os.path.exists(big):
        with np.load(os.path.join(CACHE, f"simbig_{n}x1048576_y.npz")) as z:
            y = z["y"]
        return np.load(big).astype(np.float64), y
    raise SystemExit(f"no cached K at n={n}; run bench.py once first")


def host(n):
    import scipy.linalg

    K, _ = get_k(n)
    log(f"K: {K.shape} from cache")
    out = {}
    for name, fn in [
        ("scipy_evr_f64", lambda: scipy.linalg.eigh(K, driver="evr")),
        ("scipy_evd_f64", lambda: scipy.linalg.eigh(K, driver="evd")),
        ("numpy_eigh_f64", lambda: np.linalg.eigh(K)),
        ("scipy_evd_f32", lambda: scipy.linalg.eigh(
            K.astype(np.float32), driver="evd")),
    ]:
        t0 = time.time()
        w, v = fn()
        dt = time.time() - t0
        res = float(np.linalg.norm(
            K.astype(w.dtype) @ v[:, -4:] - v[:, -4:] * w[-4:][None, :]))
        out[name] = dt
        log(f"{name}: {dt:.1f}s (top-4 residual {res:.2e})")
    print(out, flush=True)


def device(n):
    import jax
    import jax.numpy as jnp

    K64, y = get_k(n)
    log(f"backend={jax.default_backend()}")
    t0 = time.time()
    np.asarray(jnp.zeros(8))
    log(f"claim: {time.time()-t0:.1f}s")

    Kd = jnp.asarray(K64.astype(np.float32))
    jax.block_until_ready(Kd)
    t0 = time.time()
    w, v = jnp.linalg.eigh(Kd)
    jax.block_until_ready((w, v))
    t_first = time.time() - t0
    log(f"device eigh f32 n={n}: first call (compile+run) {t_first:.1f}s")
    t0 = time.time()
    w, v = jnp.linalg.eigh(Kd)
    jax.block_until_ready((w, v))
    t_run = time.time() - t0
    log(f"device eigh f32 n={n}: warm run {t_run:.1f}s")

    wh = np.asarray(w)[::-1].astype(np.float64)
    vh = np.asarray(v)[:, ::-1].astype(np.float64)
    # accuracy: residual + downstream REML delta vs f64 host eigh
    res = float(np.linalg.norm(K64 @ vh[:, :4] - vh[:, :4] * wh[:4][None, :]))
    import scipy.linalg

    t0 = time.time()
    w64, v64 = scipy.linalg.eigh(K64, driver="evd")
    log(f"host evd f64 (reference): {time.time()-t0:.1f}s")
    dphi = float(np.abs(wh - w64[::-1]).max())

    from mixmogam_tpu.ops.reml import fit_null_model

    t0 = time.time()
    null_dev = fit_null_model(y.astype(np.float32),
                              np.ones((n, 1), np.float32),
                              eig_k=(wh.astype(np.float32),
                                     vh.astype(np.float32)))
    t_fit = time.time() - t0
    null_host = fit_null_model(y.astype(np.float32),
                               np.ones((n, 1), np.float32),
                               eig_k=(w64[::-1].copy(), v64[:, ::-1].copy()))
    log(f"explicit null fit from eig: {t_fit:.2f}s; "
        f"delta dev={float(null_dev.delta):.6g} "
        f"host={float(null_host.delta):.6g}")
    print({"t_first": t_first, "t_run": t_run, "residual_top4": res,
           "max_dphi": dphi,
           "delta_dev": float(null_dev.delta),
           "delta_host": float(null_host.delta),
           "fit_s": t_fit}, flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "host"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10_240
    (host if mode == "host" else device)(n)
