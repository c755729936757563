"""Scaling-efficiency harness (BASELINE: 'SNPs/s efficiency measured at
1 chip, 1 host, >= 2 hosts').

Hardware reality of this environment: ONE physical TPU chip. Real multi-
chip scaling cannot be measured here; this harness does two honest things:

1. On CPU with N virtual devices, verifies the DISTRIBUTED PROGRAM is
   mesh-shape invariant and measures the partitioned-compute speedup the
   program achieves when XLA actually has N devices (functional scaling,
   noisy on a 2-vCPU host).
2. On the real chip, measures 1-chip throughput and derives the expected
   aggregate for v5e-16 from the program's communication structure: the
   scan phase is zero-communication until one final gather (SURVEY.md
   §2.3), so scaling is bounded by the gather (M floats, once) and the
   replicated-null broadcast — both negligible next to the per-shard scan.

Usage: JAX_PLATFORM_NAME=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
           python scripts/scaling_report.py --cpu
       python scripts/scaling_report.py --tpu   (single real chip)
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def cpu_mesh_scaling(out):
    import jax

    from mixmogam_tpu.parallel.distributed import distributed_emmax
    from mixmogam_tpu.parallel.mesh import make_mesh
    from mixmogam_tpu.data.simulate import (simulate_genotypes,
                                            simulate_phenotype)
    from mixmogam_tpu import oracle

    devs = jax.devices()
    n, M = 256, 32768
    G, _, _ = simulate_genotypes(n, M, seed=0)
    y, _ = simulate_phenotype(G, h2=0.5, seed=0)
    K = oracle.scale_k(oracle.ibs_kinship(G.astype(np.float64)))
    Gf = G.astype(np.float32)
    rows = {}
    ref_ps = None
    for nd in (1, 2, 4, 8):
        if nd > len(devs):
            break
        mesh = make_mesh((nd, 1), devices=devs[:nd])
        r = distributed_emmax(Gf, y.astype(np.float32),
                              K=K.astype(np.float32), mesh=mesh)
        t0 = time.time()
        for _ in range(3):
            r = distributed_emmax(Gf, y.astype(np.float32),
                                  K=K.astype(np.float32), mesh=mesh)
        dt = (time.time() - t0) / 3
        rows[nd] = {"wall_s": round(dt, 3),
                    "snp_per_s": round(M / dt)}
        if ref_ps is None:
            ref_ps = r["ps"]
        else:
            rows[nd]["max_p_diff_vs_1dev"] = float(
                np.max(np.abs(r["ps"] - ref_ps)))
    out["cpu_virtual_mesh"] = {
        "note": "2 physical cores under N virtual devices — validates the "
                "distributed program + invariance, not hardware scaling",
        "n": n, "M": M, "by_devices": rows}


def tpu_single_chip(out):
    import jax
    import jax.numpy as jnp

    from mixmogam_tpu.ops.reml import fit_null_model
    from mixmogam_tpu.ops.scan import build_rotated_null, emmax_scan_all
    from mixmogam_tpu import oracle
    from mixmogam_tpu.data.simulate import (simulate_genotypes,
                                            simulate_phenotype)
    from mixmogam_tpu.ops import kinship as dk

    n, M = 1024, 262_144
    cache = os.path.expanduser(f"~/.cache/mixmogam_bench/sim_{n}x{M}.npz")
    if os.path.exists(cache):
        with np.load(cache) as z:
            G, y = z["G"], z["y"]
    else:
        G, _, _ = simulate_genotypes(n, M, seed=0)
        y, _ = simulate_phenotype(G, h2=0.5, seed=0)
    np.asarray(jnp.zeros(4))  # claim
    K = oracle.scale_k(dk.kinship(G, method="ibs", chunk=65536))
    null = fit_null_model(y.astype(np.float32), np.ones((n, 1), np.float32),
                          K=K.astype(np.float32))
    rot = build_rotated_null(null)
    Gd = jnp.asarray(G.astype(np.float32))
    jax.block_until_ready(emmax_scan_all(Gd, rot, tile=65536))
    R = 16
    t0 = time.time()
    outs = [emmax_scan_all(Gd, rot, tile=65536) for _ in range(R)]
    jax.block_until_ready(outs)
    per_chip = M / ((time.time() - t0) / R)
    # communication model: gather of M fp32 once per scan over ICI
    ici_gbps = 100e9  # conservative per-link
    gather_s = M * 4 / ici_gbps
    scan_s = M / per_chip
    eff_16 = scan_s / (scan_s / 16 + gather_s) / 16
    out["tpu_single_chip"] = {
        "n": n, "M": M, "snp_tests_per_s_chip": round(per_chip),
        "derived_v5e16_aggregate": round(per_chip * 16 * eff_16),
        "derived_16chip_efficiency": round(eff_16, 4),
        "note": "one physical chip available; 16-chip figure derived from "
                "the zero-comm scan + single-gather structure",
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--out", default="scaling_report.json")
    args = ap.parse_args()
    out = {}
    if args.cpu:
        cpu_mesh_scaling(out)
    if args.tpu:
        tpu_single_chip(out)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
