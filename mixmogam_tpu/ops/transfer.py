"""Device->host transfer helper.

This image's TPU tunnel moves a single large D2H fetch at ~17-20 MB/s,
while H2D runs 77-83 MB/s (scripts/transfer_probe.py). Splitting the
fetch into row blocks and issuing copy_to_host_async on ALL of them
before collecting overlaps the per-request turnarounds and nearly
doubles the effective rate (~33 MB/s at 16 x 26 MB blocks; 64 blocks
regress — scripts/d2h_probe.py). On a production TPU host (PCIe DMA)
both paths are link-speed and this helper is a no-op-cost wrapper.

Used for the big D2H results (the n x n kinship); small arrays fall
through to plain np.asarray.
"""

from __future__ import annotations

import numpy as np

# ~26 MB blocks measured best on the tunnel (16 blocks for a 420 MB K)
_CHUNK_BYTES = 26 << 20


def fetch_array(x, chunk_bytes: int = _CHUNK_BYTES) -> np.ndarray:
    """Fetch a device array to host, chunked-async along axis 0 when it
    is large. Falls back to np.asarray for small/host/1-row inputs."""
    nbytes = getattr(x, "nbytes", 0)
    shape = getattr(x, "shape", ())
    if nbytes < 2 * chunk_bytes or not shape or shape[0] < 2 \
            or not hasattr(x, "addressable_shards"):
        return np.asarray(x)
    import jax

    n_rows = shape[0]
    row_bytes = max(nbytes // n_rows, 1)
    rows_per = max(int(chunk_bytes // row_bytes), 1)
    k = -(-n_rows // rows_per)
    if k < 2:
        return np.asarray(x)
    parts = [jax.lax.slice_in_dim(x, i * rows_per,
                                  min((i + 1) * rows_per, n_rows), axis=0)
             for i in range(k)]
    parts = [jax.block_until_ready(p) for p in parts]
    for p in parts:
        try:
            p.copy_to_host_async()
        except Exception:
            pass  # fetch below still works, just without the overlap
    return np.concatenate([np.asarray(p) for p in parts], axis=0)
