"""Device mesh construction (SURVEY.md §2.3 — the normative parallelism
table).

Axes:
  'snp'    — data-parallel over markers (the reference's only scaling axis
             analog: SNP chunking; here it shards across chips/hosts).
  'sample' — tensor-parallel fallback for very large n (kinship/eigenvector
             matmuls); size 1 until n outgrows per-chip HBM.

Multi-host: call jax.distributed.initialize() before make_mesh() and the
same code runs over ICI+DCN; no code here is host-count-aware (XLA emits
the collectives from the sharding annotations)."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Tuple[int, int]] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Mesh with ('snp', 'sample') axes; default (n_devices, 1)."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices), 1)
    if int(np.prod(shape)) != len(devices):
        raise ValueError(f"mesh shape {shape} != {len(devices)} devices")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, ("snp", "sample"))


def snp_sharding(mesh: Mesh) -> NamedSharding:
    """Genotype rows (SNPs) split across the 'snp' axis; samples along
    'sample' (usually unsharded)."""
    return NamedSharding(mesh, P("snp", "sample"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_global(x, sharding: NamedSharding):
    """device_put that also works when the mesh spans MULTIPLE PROCESSES:
    every process holds the same full host array and contributes only its
    addressable shards (jax.device_put requires fully-addressable target
    shardings; make_array_from_callback slices per addressable shard)."""
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding,
                                        lambda idx: x[idx])


def put_global_tree(tree, sharding: NamedSharding):
    """put_global over a pytree (e.g. a RotatedNull replicated to every
    device of a multi-process mesh)."""
    return jax.tree.map(lambda v: put_global(v, sharding), tree)


def gather_if_multiprocess(tree, mesh: Mesh):
    """Replicate sharded outputs when the mesh spans multiple processes
    (sharded arrays are only partially addressable there — np.asarray
    would raise); the run's single all_gather. No-op single-process."""
    if jax.process_count() == 1:
        return tree
    return jax.jit(lambda t: t,
                   out_shardings=replicated(mesh))(tree)


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0
                    ) -> Tuple[np.ndarray, int]:
    """Pad axis to a multiple (sharding needs even splits); returns
    (padded, original_size)."""
    size = x.shape[axis]
    target = -(-size // multiple) * multiple
    if target == size:
        return x, size
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, target - size)
    return np.pad(x, widths), size
