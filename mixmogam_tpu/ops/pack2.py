"""2-bit genotype transport: pack on host (native/fast_parse.cpp or
numpy), unpack ON DEVICE.

The streamed paths ship (tile, n) int8 genotype tiles host->device; on
this image the TPU sits behind a TCP tunnel measured at ~40-60 MB/s, so
a 10 GB genome costs ~3 minutes of pure transfer. Genotype dosages fit
in 2 bits (0..2 + missing), so packing 4 samples/byte cuts transfer 4x;
the unpack is a few VPU shift/mask ops per tile — negligible next to
the rotation matmul. Codes: 0/1/2 = dosage, 3 = missing (-1), sample k
at bits 2k (matches native.pack_2bit / fast_parse.cpp)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("n",))
def unpack_2bit_device(packed: jnp.ndarray, n: int) -> jnp.ndarray:
    """(m, ceil(n/4)) uint8 -> (m, n) int8 with code 3 -> -1 (missing)."""
    m = packed.shape[0]
    shifts = (jnp.arange(4, dtype=jnp.uint8) * 2)[None, None, :]
    codes = (packed[:, :, None] >> shifts) & jnp.uint8(3)   # (m, rb, 4)
    codes = codes.reshape(m, -1)[:, :n].astype(jnp.int8)
    return jnp.where(codes == 3, jnp.int8(-1), codes)


def packable(chunk: np.ndarray) -> bool:
    """True when the dosage range fits the 2-bit code book."""
    return (chunk.dtype == np.int8 and chunk.size > 0
            and chunk.min() >= -1 and chunk.max() <= 2)


def default_pack_transfer() -> bool:
    """Pack by default on non-CPU backends (host->device links are the
    streamed paths' bottleneck there; on CPU the 'transfer' is a copy)."""
    return jax.default_backend() != "cpu"


def ship_int8_tile(chunk: np.ndarray, n: int, pack: bool) -> jnp.ndarray:
    """Host int8 (m, n) tile -> device int8 (m, n), via 2-bit transport
    when pack=True and the range allows; raw int8 otherwise."""
    if pack and packable(chunk):
        from mixmogam_tpu import native

        return unpack_2bit_device(jnp.asarray(native.pack_2bit(chunk)), n)
    return jnp.asarray(chunk)
