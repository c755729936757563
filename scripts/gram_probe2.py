"""gram_probe.py showed a SINGLE 16k x 10240 int8 gram dispatch is
RTT-bound (<= 34 ms incl. the ~27 ms tunnel round trip), yet the fused
resident kinship runs 0.28 s/tile inside ONE dispatch. This probe times
the fused-loop structure itself (T=16 tiles, one blocking dispatch per
variant, per-tile cost reported) to find what the loop context adds:

  loop_gram      fori_loop, body = unpack + CtC gram, carry (n,n) int32
  loop_gram_noup same, pre-unpacked int8 tiles resident (no unpack)
  loop_2gram     + the [a=0][b=2] corr gram (the diploid kernel's body)
  loop_full      the shipped _ibs_resident_fused body (grams + a2)
  loop_scan      control: body = unpack + (t,n)@(n,n) int8 matmul,
                 carry (n,) int32 (the scan's known-fast shape)
  loop_gram_map  lax.map + tree-sum instead of fori carry (T partials)
"""

import functools
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

T_TILES, TILE, N = 16, 16384, 10240


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    from scripts.baseline_configs import claim_device

    import jax
    import jax.numpy as jnp

    from mixmogam_tpu.ops.pack2 import unpack_2bit_device

    claim_device()
    DEFAULT = jax.lax.Precision.DEFAULT
    dims = (((0,), (0,)), ((), ()))
    rng = np.random.default_rng(0)
    G_host = rng.integers(0, 3, size=(T_TILES * TILE, N), dtype=np.int8)
    from mixmogam_tpu import native

    packed = jnp.asarray(native.pack_2bit(G_host))
    Gd = jnp.asarray(G_host)          # pre-unpacked variant (2.7 GB int8)
    jax.block_until_ready((packed, Gd))

    def tile_from(packed, i):
        pt = jax.lax.dynamic_slice_in_dim(packed, i * TILE, TILE, axis=0)
        return unpack_2bit_device(pt, N)

    @jax.jit
    def loop_gram(packed):
        def body(i, S):
            Gt = tile_from(packed, i)
            return S + jax.lax.dot_general(
                Gt, Gt, dims, preferred_element_type=jnp.int32,
                precision=DEFAULT)
        return jax.lax.fori_loop(0, T_TILES, body,
                                 jnp.zeros((N, N), jnp.int32))

    @jax.jit
    def loop_gram_noup(Gd):
        def body(i, S):
            Gt = jax.lax.dynamic_slice_in_dim(Gd, i * TILE, TILE, axis=0)
            return S + jax.lax.dot_general(
                Gt, Gt, dims, preferred_element_type=jnp.int32,
                precision=DEFAULT)
        return jax.lax.fori_loop(0, T_TILES, body,
                                 jnp.zeros((N, N), jnp.int32))

    @jax.jit
    def loop_2gram(packed):
        def body(i, carry):
            S, C2 = carry
            Gt = tile_from(packed, i)
            S = S + jax.lax.dot_general(
                Gt, Gt, dims, preferred_element_type=jnp.int32,
                precision=DEFAULT)
            W0 = (Gt == 0).astype(jnp.int8)
            W2 = (Gt == 2).astype(jnp.int8)
            C2 = C2 + jax.lax.dot_general(
                W0, W2, dims, preferred_element_type=jnp.int32,
                precision=DEFAULT)
            return S, C2
        return jax.lax.fori_loop(0, T_TILES, body,
                                 (jnp.zeros((N, N), jnp.int32),
                                  jnp.zeros((N, N), jnp.int32)))

    @jax.jit
    def loop_full(packed):
        from mixmogam_tpu.models.resident import _ibs_resident_fused

        return _ibs_resident_fused(packed, N, TILE, T_TILES * TILE, 2)

    W = jnp.asarray(rng.integers(-127, 127, size=(N, N), dtype=np.int8))

    @jax.jit
    def loop_scan(packed, W):
        def body(i, acc):
            Gt = tile_from(packed, i)
            r = jax.lax.dot_general(Gt, W, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32,
                                    precision=DEFAULT)
            return acc + jnp.sum(r, axis=0)
        return jax.lax.fori_loop(0, T_TILES, body,
                                 jnp.zeros((N,), jnp.int32))

    @jax.jit
    def loop_gram_map(packed):
        tiles = packed.reshape(T_TILES, TILE, packed.shape[1])

        def one(pt):
            Gt = unpack_2bit_device(pt, N)
            return jax.lax.dot_general(
                Gt, Gt, dims, preferred_element_type=jnp.int32,
                precision=DEFAULT)
        return jnp.sum(jax.lax.map(one, tiles), axis=0)

    gram_tops = 2.0 * TILE * N * N / 1e12
    for name, fn, args, grams in [
        ("loop_gram (unpack+1 gram)", loop_gram, (packed,), 1),
        ("loop_gram_noup (1 gram)", loop_gram_noup, (Gd,), 1),
        ("loop_2gram (diploid body)", loop_2gram, (packed,), 2),
        ("loop_full (_ibs_resident_fused)", loop_full, (packed,), 2),
        ("loop_scan (control)", loop_scan, (packed, W), 1),
        ("loop_gram_map (map+sum)", loop_gram_map, (packed,), 1),
    ]:
        try:
            jax.block_until_ready(fn(*args))
        except Exception as e:  # noqa: BLE001
            log(f"{name}: FAILED {type(e).__name__}: {e}")
            continue
        best = np.inf
        for _ in range(2):
            t0 = time.time()
            jax.block_until_ready(fn(*args))
            best = min(best, time.time() - t0)
        per = best / T_TILES
        log(f"{name}: {best:6.2f} s total, {per*1e3:7.1f} ms/tile "
            f"-> {grams * gram_tops / per:6.1f} TOPS")


if __name__ == "__main__":
    main()
