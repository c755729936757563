"""Multi-host orchestration (SURVEY.md §2.3 'distributed comm backend':
jax.distributed runtime; XLA emits ICI/DCN collectives from shardings).

One physical chip is available in this development image, so this module
is exercised only under the virtual-device mesh (tests) — but it is the
production entry path: N hosts each run the same program, each loads ONLY
its SNP shard, and the GSPMD program from parallel.distributed runs
unchanged over the global mesh.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with env-var fallbacks (no-op when
    single-process)."""
    import jax

    if num_processes in (None, 1):
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def host_snp_range(M: int, num_hosts: int, host_id: int,
                   tile: int = 256) -> Tuple[int, int]:
    """The half-open SNP row range host `host_id` should LOAD from disk.
    Ranges are tile-aligned so shard boundaries coincide with device tile
    boundaries (even splits; the last host takes the remainder)."""
    per = math.ceil(M / num_hosts / tile) * tile
    lo = min(host_id * per, M)
    hi = min(lo + per, M)
    return lo, hi


def make_global_snp_array(local_rows: np.ndarray, M: int, mesh):
    """Assemble a globally-sharded (M, n) genotype array from per-host
    row blocks via jax.make_array_from_process_local_data — each host
    contributes only the rows it loaded."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("snp", "sample"))
    n = local_rows.shape[1]
    return jax.make_array_from_process_local_data(
        sharding, np.ascontiguousarray(local_rows), (M, n))
