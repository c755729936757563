"""Multi-host helper tests (single-process semantics on the virtual
mesh)."""

import numpy as np

from mixmogam_tpu.parallel.multihost import host_snp_range, make_global_snp_array
from mixmogam_tpu.parallel.mesh import make_mesh


def test_host_snp_range_partition():
    M, tile = 1000, 64
    for hosts in (1, 2, 3, 4):
        ranges = [host_snp_range(M, hosts, h, tile) for h in range(hosts)]
        # disjoint, ordered, covering
        assert ranges[0][0] == 0
        assert ranges[-1][1] == M
        for (a0, a1), (b0, b1) in zip(ranges, ranges[1:]):
            assert a1 == b0
        for lo, hi in ranges[:-1]:
            assert (hi - lo) % tile == 0 or hi == M


def test_make_global_snp_array_single_process():
    import jax

    mesh = make_mesh((4, 1), devices=jax.devices()[:4])
    rows = np.arange(32 * 6, dtype=np.int8).reshape(32, 6)
    arr = make_global_snp_array(rows, 32, mesh)
    np.testing.assert_array_equal(np.asarray(arr), rows)
