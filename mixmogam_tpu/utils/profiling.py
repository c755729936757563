"""Tracing / profiling / metrics (SURVEY.md §5: the reference has only
bare print progress; the build owes per-phase timers, SNPs/s + roofline
reporting, jax.profiler hooks, and a JSON metrics artifact per run)."""

from __future__ import annotations

import contextlib
import json
import logging
import os
import time
from typing import Any, Dict, Optional

logger = logging.getLogger("mixmogam_tpu")
if not logger.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter(
        "%(asctime)s %(name)s %(levelname)s %(message)s"))
    logger.addHandler(_h)
    logger.setLevel(os.environ.get("MIXMOGAM_LOGLEVEL", "INFO"))
    # we attached our own handler; propagating to root would print
    # every line twice under logging.basicConfig()/pytest capture
    logger.propagate = False


class RunMetrics:
    """Per-run phase timings + throughput metrics, dumpable to JSON.

    Phases are fenced with jax.block_until_ready on the values returned
    from the phase body (async dispatch would otherwise attribute device
    time to the wrong phase)."""

    def __init__(self, run_name: str = "run"):
        self.run_name = run_name
        self.phases: Dict[str, float] = {}
        self.metrics: Dict[str, Any] = {}
        self._t0 = time.time()

    @contextlib.contextmanager
    def phase(self, name: str, fence: Any = None):
        t0 = time.time()
        box = {}
        try:
            yield box
        finally:
            val = box.get("fence", fence)
            if val is not None:
                try:
                    import jax

                    jax.block_until_ready(val)
                except Exception:
                    pass
            dt = time.time() - t0
            self.phases[name] = self.phases.get(name, 0.0) + dt
            logger.info("phase %-12s %8.3f s", name, dt)

    def set(self, key: str, value) -> None:
        self.metrics[key] = value

    def throughput(self, key: str, count: int, phase: str) -> float:
        rate = count / max(self.phases.get(phase, 0.0), 1e-12)
        self.metrics[key] = rate
        return rate

    def as_dict(self) -> Dict[str, Any]:
        return {"run": self.run_name, "total_s": time.time() - self._t0,
                "phases_s": {k: round(v, 4) for k, v in self.phases.items()},
                "metrics": self.metrics}

    def write(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.as_dict(), f, indent=2, default=float)


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """jax.profiler trace around a region (view with TensorBoard/XProf);
    no-op when log_dir is None."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """SURVEY.md §5 'sanitizers': jax_debug_nans around a suspect region
    (the functional-purity analog of a race detector for device code)."""
    import jax

    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
