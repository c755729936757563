"""Device compute ops (JAX/XLA/Pallas): the TPU-native replacements for the
reference's numpy/scipy hot paths (SURVEY.md L0/L3/L4)."""

import os as _os


def _setup_compilation_cache() -> None:
    """Enable JAX's persistent compilation cache (compiles through this
    image's remote TPU toolchain cost seconds-to-minutes; the on-disk cache
    makes every repeat CLI/test invocation start warm — measured 0.8s ->
    0.04s across processes)."""
    try:
        import jax

        if jax.config.jax_compilation_cache_dir is None:
            jax.config.update(
                "jax_compilation_cache_dir",
                _os.environ.get("MIXMOGAM_JAX_CACHE",
                                _os.path.expanduser("~/.cache/mixmogam_jax")))
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              0.5)
    except Exception:  # cache is an optimization, never fatal
        pass


_setup_compilation_cache()


def _pin_matmul_precision() -> None:
    """Pin float matmuls to true fp32 (6-pass bf16 emulation on the MXU).

    Measured on this image's v5e (scripts/scan_tuning.py): JAX's implicit
    default precision executes float32 dots as ONE bf16 pass — F-stat
    p-values drift by up to 6e-3, silently breaking the documented fp32
    envelope (tests/test_kernels.py::TestFp32Characterization). With
    'highest' the fp32 scan is bit-true fp32 (21M SNP-tests/s/chip at
    n=1024 — the exact tier); the faster approximate tiers are explicit
    opt-ins (rotate_in_bf16, matmul_precision='high'). Override with
    MIXMOGAM_MATMUL_PRECISION=default|high|highest."""
    val = _os.environ.get("MIXMOGAM_MATMUL_PRECISION", "highest")
    if val not in ("default", "high", "highest"):
        raise ValueError(
            f"MIXMOGAM_MATMUL_PRECISION={val!r}: use default|high|highest")
    try:
        import jax

        jax.config.update("jax_default_matmul_precision", val)
    except Exception as e:  # pragma: no cover - config API drift
        # failing to pin means f32 dots silently run as 1-pass bf16 on
        # TPU — never swallow that silently
        import sys

        print(f"mixmogam_tpu: WARNING could not pin matmul precision "
              f"({type(e).__name__}: {e}); TPU f32 results may be "
              f"bf16-grade", file=sys.stderr)


_pin_matmul_precision()


def _warm_device_transfers() -> None:
    """Fire a tiny device->host transfer on a background thread.

    On this image the FIRST D2H per process pays a slow, variable tunnel
    dial (measured 140-225s for 4 BYTES; later transfers run at >500MB/s).
    Warming it concurrently with host-side setup (parsing, simulation,
    host eigh) hides most of that latency. No-op on CPU backends; disable
    with MIXMOGAM_NO_WARMUP=1."""
    if _os.environ.get("MIXMOGAM_NO_WARMUP"):
        return

    def _w():
        try:
            import jax
            import numpy as _np

            if jax.default_backend() != "tpu":
                return
            import jax.numpy as jnp

            _np.asarray(jnp.zeros(8))
        except Exception:
            pass

    import threading

    threading.Thread(target=_w, daemon=True, name="mixmogam-d2h-warmup").start()


_warm_device_transfers()

from mixmogam_tpu.ops.eigen import eigen_k, projected_spectrum
from mixmogam_tpu.ops.reml import (reml_from_spectrum, NullModel,
                                   fit_null_model, h2_profile_ci)
from mixmogam_tpu.ops.scan import emmax_scan_stats, RotatedNull, build_rotated_null

__all__ = [
    "eigen_k", "projected_spectrum", "reml_from_spectrum", "NullModel",
    "fit_null_model", "h2_profile_ci", "emmax_scan_stats", "RotatedNull", "build_rotated_null",
]
