"""Round-5 parity report (VERDICT r4 #6): device-vs-oracle parity at the
CURRENT surface — every entry point in one table, plus per-tier drift
columns and the refreshed config #2 EMMA-vs-EMMAX comparison.

Two parts (run as separate processes — the 1e-6 oracle gate is defined
on the x64 device path, the tier drift on the real TPU):

  part cpu   (x64, CPU): run every entry point through the DEVICE CODE
             at float64 and diff against the float64 scipy oracle
             (SURVEY Appendix A). Writes docs/parity_r5_cpu.json and
             caches the dataset + oracle p-values for part tpu.
  part tpu   (real TPU, f32): per-tier p-drift (exact / int8x3 /
             int8x2+rescore / bf16) vs the oracle on the SAME dataset,
             plus the config #2-scale EMMA-vs-EMMAX comparison and the
             GxE tier drift. Writes docs/parity_r5_tpu.json.
  part render: merge both JSONs into docs/parity_r5.{json,md}.

Usage:
  MIXMOGAM_NO_WARMUP=1 JAX_PLATFORMS='' JAX_PLATFORM_NAME=cpu \
      python scripts/parity_r5.py --part cpu
  timeout 2400 python scripts/parity_r5.py --part tpu
  python scripts/parity_r5.py --part render
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CACHE = os.path.expanduser("~/.cache/mixmogam_bench")
DOCS = os.path.join(REPO, "docs")
DATA = os.path.join(CACHE, "parity_r5_data.npz")
ORACLE_PS = os.path.join(CACHE, "parity_r5_oracle.npz")

N2, M2 = 1344, 215_040          # BASELINE config #2 shape
N, M = 1344, 32_768             # oracle-affordable table shape


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def max_dp(a, b, mask=None):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    if mask is not None:
        a, b = a[mask], b[mask]
    return float(np.max(np.abs(a - b))) if a.size else 0.0


def build_data(seed=0):
    """Shared dataset: binary config-#2-like + a diploid variant for the
    class tests. Cached so part cpu and part tpu see identical bytes."""
    from mixmogam_tpu import oracle
    from mixmogam_tpu.data.simulate import (simulate_genotypes,
                                            simulate_phenotype)

    if os.path.exists(DATA):
        with np.load(DATA) as z:
            return dict(z)
    log(f"simulating {N} x {M} (+ config #2 {N2} x {M2}) ...")
    G, ch, po = simulate_genotypes(N, M, seed=seed)
    y, causal = simulate_phenotype(G, h2=0.5, n_causal=15,
                                   causal_effect=0.6, seed=seed)
    K = oracle.scale_k(oracle.ibs_kinship(G.astype(np.float64)))
    rng = np.random.default_rng(seed + 1)
    Gd_dip = np.clip(G[:8192].astype(np.int8)
                     + (rng.random((8192, N)) < 0.3).astype(np.int8),
                     0, 2)
    env = (rng.random(N) < 0.5).astype(np.float64)
    # chromosomes for LOCO: 4 contiguous blocks over the first 16384
    ch_loco = np.repeat(np.arange(1, 5), 4096)
    Y_multi = np.stack([
        simulate_phenotype(G, h2=0.5, n_causal=10, seed=seed + 10 + t)[0]
        for t in range(4)])
    G2, _, _ = simulate_genotypes(N2, M2, seed=seed + 99)
    y2, _ = simulate_phenotype(G2, h2=0.5, n_causal=15,
                               causal_effect=0.6, seed=seed + 99)
    d = {"G": G, "y": y, "K": K, "Gd_dip": Gd_dip, "env": env,
         "ch_loco": ch_loco, "Y_multi": Y_multi, "G2": G2, "y2": y2}
    os.makedirs(CACHE, exist_ok=True)
    np.savez(DATA, **d)
    return d


def part_cpu():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import scipy.stats

    from mixmogam_tpu import oracle
    from mixmogam_tpu.models.emma import emma
    from mixmogam_tpu.models.emmax import emmax
    from mixmogam_tpu.models.gxe import emmax_gxe
    from mixmogam_tpu.models.linear import anova, kruskal_wallis, linear_model
    from mixmogam_tpu.models.loco import emmax_loco
    from mixmogam_tpu.models.multitrait import emmax_multi_trait
    from mixmogam_tpu.models.permutation import emmax_perm_test
    from mixmogam_tpu.models.stepwise import emmax_step_wise

    d = build_data()
    G, y, K = d["G"], d["y"], d["K"]
    rows = {}
    oracle_ps = {}

    # ---- emmax ----
    t0 = time.time()
    dev = emmax(G, y, K=K)
    orc = oracle.emmax_scan(G.astype(np.float64), y, K)
    rows["emmax"] = max_dp(dev["ps"], orc["ps"])
    oracle_ps["emmax"] = orc["ps"]
    log(f"emmax: {rows['emmax']:.2e} ({time.time()-t0:.0f}s)")

    # ---- emma (exact per-SNP REML; O(M n^3) oracle -> subset) ----
    t0 = time.time()
    sub = slice(0, 256)
    dev = emma(G[sub], y, K=K)
    orc = oracle.emma_scan(G[sub].astype(np.float64), y, K)
    rows["emma"] = max_dp(dev["ps"], orc["ps"])
    log(f"emma: {rows['emma']:.2e} ({time.time()-t0:.0f}s)")

    # ---- lm / anova / kw ----
    t0 = time.time()
    dev = linear_model(G[:8192], y)
    orc = oracle.ols_scan(G[:8192].astype(np.float64), y)
    rows["lm"] = max_dp(dev["ps"], orc["ps"])
    Gd_dip = d["Gd_dip"]
    dev = anova(Gd_dip, y)
    orc = oracle.anova_scan(Gd_dip.astype(np.float64), y)
    rows["anova"] = max_dp(dev["ps"], orc["ps"])
    dev = kruskal_wallis(Gd_dip, y)
    orc = oracle.kruskal_wallis_scan(Gd_dip.astype(np.float64), y)
    rows["kw"] = max_dp(dev["ps"], orc["ps"])
    log(f"lm/anova/kw: {rows['lm']:.2e} {rows['anova']:.2e} "
        f"{rows['kw']:.2e} ({time.time()-t0:.0f}s)")

    # ---- stepwise MLMM ----
    t0 = time.time()
    dev = emmax_step_wise(G[:8192], y, K=K, max_steps=3)
    orc = oracle.mlmm_step_wise(G[:8192].astype(np.float64), y, K,
                                max_steps=3)
    same_cof = all(a["cofactors"] == b["cofactors"]
                   for a, b in zip(dev["steps"], orc["steps"]))
    rows["stepwise_minp"] = max(
        abs(a["min_p"] - b["min_p"])
        for a, b in zip(dev["steps"], orc["steps"])
        if np.isfinite(a.get("min_p", np.nan)))
    rows["stepwise_cofactors_equal"] = bool(same_cof)
    log(f"stepwise: cof_equal={same_cof} minp {rows['stepwise_minp']:.2e}"
        f" ({time.time()-t0:.0f}s)")

    # ---- GxE (brute-force f64 oracle at the device's delta) ----
    t0 = time.time()
    env = d["env"]
    Gs = G[:4096]
    dev = emmax_gxe(Gs, y, env, K=K)
    phi, U = np.linalg.eigh(K)
    His = (U / np.sqrt(phi + dev["delta"])) @ U.T
    X0e = np.column_stack([np.ones(N), env])
    ys = His @ y
    X0s = His @ X0e
    q = X0e.shape[1]

    def rss(cols):
        X = np.column_stack([X0s] + cols)
        r = ys - X @ np.linalg.lstsq(X, ys, rcond=None)[0]
        return float(r @ r)

    rss0 = rss([])
    om, oi, oj = [], [], []
    for j in range(Gs.shape[0]):
        x = Gs[j].astype(np.float64)
        xs = His @ x
        ps_ = His @ (x * env)
        r1 = rss([xs])
        r2 = rss([xs, ps_])
        d1, d2 = N - q - 1, N - q - 2
        om.append(scipy.stats.f.sf((rss0 - r1) / (r1 / d1), 1, d1))
        oi.append(scipy.stats.f.sf((r1 - r2) / (r2 / d2), 1, d2))
        oj.append(scipy.stats.f.sf(((rss0 - r2) / 2) / (r2 / d2), 2, d2))
    rows["gxe_marginal"] = max_dp(dev["marginal_ps"], np.asarray(om),
                                  dev["mask"])
    rows["gxe_inter"] = max_dp(dev["inter_ps"], np.asarray(oi),
                               dev["mask_inter"])
    rows["gxe_joint"] = max_dp(dev["joint_ps"], np.asarray(oj),
                               dev["mask_inter"])
    log(f"gxe: {rows['gxe_inter']:.2e} ({time.time()-t0:.0f}s)")

    # ---- LOCO (oracle: per-chromosome scan under complement kinship) ----
    t0 = time.time()
    ch = d["ch_loco"]
    Gl = G[:len(ch)]
    dev = emmax_loco(Gl, y, chromosomes=ch, ploidy=1)
    worst = 0.0
    for c in np.unique(ch):
        Kl = oracle.scale_k(oracle.ibs_kinship(
            Gl[ch != c].astype(np.float64)))
        orc = oracle.emmax_scan(Gl[ch == c].astype(np.float64), y, Kl)
        worst = max(worst, max_dp(dev["ps"][ch == c], orc["ps"]))
    rows["loco"] = worst
    log(f"loco: {rows['loco']:.2e} ({time.time()-t0:.0f}s)")

    # ---- multi-trait (incl. missing phenotypes) ----
    t0 = time.time()
    Y = d["Y_multi"].copy()
    rng = np.random.default_rng(5)
    Y[1, rng.choice(N, 100, replace=False)] = np.nan  # a missing pattern
    dev = emmax_multi_trait(G[:8192], Y, K=K)
    worst = 0.0
    for t in range(Y.shape[0]):
        obs = ~np.isnan(Y[t])
        Kt = oracle.prepare_k(K, list(range(N)),
                              list(np.flatnonzero(obs)))
        orc = oracle.emmax_scan(G[:8192, obs].astype(np.float64),
                                Y[t][obs], Kt)
        worst = max(worst, max_dp(dev["ps"][t], orc["ps"]))
    rows["multitrait"] = worst
    log(f"multitrait: {rows['multitrait']:.2e} ({time.time()-t0:.0f}s)")

    # ---- permutation (oracle: same perms, f64 rotated scans) ----
    t0 = time.time()
    Gp = G[:2048]
    dev = emmax_perm_test(Gp, y, K=K, num_perm=8, seed=3, tile=512)
    null = oracle.reml(y, np.ones((N, 1)), K=K)
    His = (U / np.sqrt(phi + null["delta"])) @ U.T
    X0s = His @ np.ones((N, 1))
    Q0, _ = np.linalg.qr(X0s)
    Gr = Gp.astype(np.float64) @ His.T
    rngp = np.random.default_rng(3)
    perms = np.stack([rngp.permutation(N) for _ in range(8)])
    min_ps = []
    for p in perms:
        ysr = His @ y[p]
        yres = ysr - Q0 @ (Q0.T @ ysr)
        rss0 = yres @ yres
        Xr = Gr - (Gr @ Q0) @ Q0.T
        xx = np.sum(Xr * Xr, axis=1)
        xy = Xr @ yres
        ok = xx > 1e-12
        expl = np.where(ok, xy**2 / np.where(ok, xx, 1), 0.0)
        fs = expl * (N - 2) / np.maximum(rss0 - expl, 1e-300)
        min_ps.append(scipy.stats.f.sf(np.max(fs), 1, N - 2))
    rows["perm_minp"] = max_dp(np.sort(dev["min_ps"]),
                               np.sort(np.asarray(min_ps)))
    log(f"perm: {rows['perm_minp']:.2e} ({time.time()-t0:.0f}s)")

    out = {"shape": [N, M], "x64_rows": rows}
    os.makedirs(DOCS, exist_ok=True)
    with open(os.path.join(DOCS, "parity_r5_cpu.json"), "w") as f:
        json.dump(out, f, indent=1)
    np.savez(ORACLE_PS, emmax=oracle_ps["emmax"])
    log("wrote docs/parity_r5_cpu.json")


def part_tpu():
    import jax
    import jax.numpy as jnp

    from mixmogam_tpu.models.emma import emma
    from mixmogam_tpu.models.emmax import emmax
    from mixmogam_tpu.models.gxe import emmax_gxe

    log(f"backend={jax.default_backend()}")
    t0 = time.time()
    np.asarray(jnp.zeros(8))
    log(f"claim: {time.time()-t0:.1f}s")
    d = build_data()
    with np.load(ORACLE_PS) as z:
        orc_ps = z["emmax"]
    G, y, K = d["G"], d["y"], d["K"]
    res = {"tiers": {}}

    # per-tier drift vs the f64 oracle on the table dataset
    dev_exact = None
    for tier in ("exact", "int8x3", "int8x2", "bf16"):
        t0 = time.time()
        kw = {"precision": tier} if tier != "exact" else {}
        if tier == "int8x2":
            kw["rescore_top"] = 1024     # the 'fast' contract pairing
        dev = emmax(G, y, K=K, **kw)
        if tier == "exact":
            dev_exact = dev
        thr = 0.05 / G.shape[0]
        sub = orc_ps < thr
        res["tiers"][tier] = {
            "max_dp_vs_oracle": max_dp(dev["ps"], orc_ps),
            "max_dp_subthreshold": max_dp(dev["ps"], orc_ps, sub),
            "max_dp_vs_device_exact": (
                0.0 if dev_exact is None
                else max_dp(dev["ps"], dev_exact["ps"])),
            "wall_s": round(time.time() - t0, 2),
        }
        log(f"tier {tier}: vs oracle {res['tiers'][tier]['max_dp_vs_oracle']:.2e}"
            f" sub-thr {res['tiers'][tier]['max_dp_subthreshold']:.2e}")

    # config #2 full-scale EMMA vs EMMAX (current code, f32 device)
    G2, y2 = d["G2"], d["y2"]
    from mixmogam_tpu.ops import kinship as dk
    from mixmogam_tpu.oracle.kinship import scale_k

    t0 = time.time()
    K2 = scale_k(dk.kinship(G2, method="ibs"))
    log(f"config #2 kinship: {time.time()-t0:.0f}s")
    t0 = time.time()
    r_emmax = emmax(G2, y2, K=K2)
    t_emmax = time.time() - t0
    t0 = time.time()
    r_emma = emma(G2, y2, K=K2)
    t_emma = time.time() - t0
    lp_x = -np.log10(np.maximum(r_emmax["ps"], 1e-300))
    lp_e = -np.log10(np.maximum(r_emma["ps"], 1e-300))
    top_x = set(np.argsort(r_emmax["ps"])[:100].tolist())
    top_e = set(np.argsort(r_emma["ps"])[:100].tolist())
    res["config2"] = {
        "shape": [N2, M2],
        "neglogp_corr": float(np.corrcoef(lp_x, lp_e)[0, 1]),
        "max_abs_neglogp_diff": float(np.max(np.abs(lp_x - lp_e))),
        "top100_overlap": len(top_x & top_e),
        "emmax_wall_s": round(t_emmax, 1),
        "emma_wall_s": round(t_emma, 1),
    }
    log(f"config2: corr {res['config2']['neglogp_corr']:.6f} "
        f"overlap {res['config2']['top100_overlap']}/100 "
        f"emmax {t_emmax:.1f}s emma {t_emma:.1f}s")

    # GxE tier drift (device f32, int8x3 vs exact, top-100 interaction)
    env = d["env"]
    Gs = G[:32_768]
    gx_ex = emmax_gxe(Gs, y, env, K=K)
    gx_i8 = emmax_gxe(Gs, y, env, K=K, precision="int8x3")
    top = np.argsort(gx_ex["inter_ps"])[:100]
    res["gxe_tier_int8x3_top100_dp"] = max_dp(gx_i8["inter_ps"][top],
                                              gx_ex["inter_ps"][top])
    log(f"gxe int8x3 top-100 dp: {res['gxe_tier_int8x3_top100_dp']:.2e}")

    with open(os.path.join(DOCS, "parity_r5_tpu.json"), "w") as f:
        json.dump(res, f, indent=1)
    log("wrote docs/parity_r5_tpu.json")


def part_render():
    with open(os.path.join(DOCS, "parity_r5_cpu.json")) as f:
        cpu = json.load(f)
    with open(os.path.join(DOCS, "parity_r5_tpu.json")) as f:
        tpu = json.load(f)
    merged = {"cpu_x64": cpu, "tpu_f32": tpu}
    with open(os.path.join(DOCS, "parity_r5.json"), "w") as f:
        json.dump(merged, f, indent=1)
    lines = [
        "# Round-5 parity report (device vs oracle, current surface)",
        "",
        f"Table dataset: {cpu['shape'][0]} x {cpu['shape'][1]} simulated "
        "binary genotypes (config #2 sample count); oracle = float64 "
        "scipy (SURVEY Appendix A; mixmogam implements these published "
        "formulas directly).",
        "",
        "## Exact tier, x64 device path vs oracle (gate: <= 1e-6)",
        "",
        "| entry point | max \\|dp\\| (masked where applicable) |",
        "|---|---|",
    ]
    for k, v in cpu["x64_rows"].items():
        if isinstance(v, bool):
            lines.append(f"| {k} | {'yes' if v else 'NO'} |")
        else:
            lines.append(f"| {k} | {v:.2e} |")
    lines += [
        "",
        "## Precision-tier drift on the real TPU (f32 device)",
        "",
        "| tier | max \\|dp\\| vs oracle | sub-threshold (reported) "
        "| vs device exact | wall (s) |",
        "|---|---|---|---|---|",
    ]
    for t, v in tpu["tiers"].items():
        lines.append(
            f"| {t} | {v['max_dp_vs_oracle']:.2e} | "
            f"{v['max_dp_subthreshold']:.2e} | "
            f"{v['max_dp_vs_device_exact']:.2e} | {v['wall_s']} |")
    c2 = tpu["config2"]
    lines += [
        "",
        "## Config #2: EMMA exact vs EMMAX "
        f"({c2['shape'][0]} x {c2['shape'][1]}, TPU f32)",
        "",
        "| quantity | value |",
        "|---|---|",
        f"| -log10(p) correlation | {c2['neglogp_corr']:.6f} |",
        f"| max abs -log10(p) diff | {c2['max_abs_neglogp_diff']:.4f} |",
        f"| top-100 overlap | {c2['top100_overlap']}/100 |",
        f"| EMMAX wall | {c2['emmax_wall_s']} s |",
        f"| EMMA exact wall | {c2['emma_wall_s']} s |",
        "",
        f"GxE int8x3 top-100 interaction drift vs exact tier: "
        f"{tpu['gxe_tier_int8x3_top100_dp']:.2e}",
        "",
        "The int8x2 row pairs the tier with its threshold-complete "
        "rescore contract (round 5): the sub-threshold column is the "
        "drift on everything a user would report — exact-grade.",
    ]
    with open(os.path.join(DOCS, "parity_r5.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    log("wrote docs/parity_r5.{json,md}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--part", choices=["cpu", "tpu", "render"],
                    required=True)
    args = ap.parse_args()
    {"cpu": part_cpu, "tpu": part_tpu, "render": part_render}[args.part]()
