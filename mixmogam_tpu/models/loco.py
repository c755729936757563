"""Leave-one-chromosome-out (LOCO) mixed-model association.

Capability extension beyond the reference (mixmogam fits one global
kinship; SURVEY.md §2.1 kinship.py): LOCO removes proximal contamination
— the tested SNP (and everything linked to it) is excluded from the
random effect, the standard practice in modern LMM GWAS tools.

TPU-first design: every kinship accumulation in this package is a sum
of per-SNP gram contributions (ops/kinship.py), so the C per-chromosome
LOCO matrices cost ONE extra pass over the genome, not C of them:

    num_loco(c) = num_total - num(c),  den_loco(c) = den_total - den(c)

with (num, den) = (sharing counts, a*M) for IBS and (W'W, ploidy*sum
p(1-p)) for VanRaden — the per-chromosome grams ride the same int8 MXU
update kernels as the global kinship (a ResidentGenome sources them
from packed-HBM row slices, zero host traffic). The per-chromosome
null re-fits (REML + host eigh of each K_loco) are the irreducible
LOCO surcharge: round 4 PIPELINES them — chromosome c+1's host eigh
runs in a worker thread under chromosome c's null fit + device scan,
so the end-to-end wall approaches max(sum eighs, sum fits+scans)
instead of their sum. precision='fast' takes the f32 ssyevd tier
(measured 1.45x) and the scan's int8x2+rescore tier. Measured at
config #3 (1M x 10,240, 22 chromosomes): see docs/PERFORMANCE.md
§LOCO / docs/baseline_r4.json.
"""

from __future__ import annotations

import logging
import time as _time
from typing import Dict, List, Optional, Tuple

import numpy as np

__all__ = ["loco_kinships", "emmax_loco"]

_log = logging.getLogger("mixmogam_tpu.loco")


def _chrom_ranges(chromosomes: np.ndarray) -> List[Tuple[object, int, int]]:
    """[(chrom, start, end)] for a chromosome-sorted SNP axis; raises if
    a chromosome's rows are not contiguous (the container invariant —
    GenotypeData keeps SNPs chromosome-major)."""
    chromosomes = np.asarray(chromosomes)
    if chromosomes.ndim != 1:
        raise ValueError("chromosomes must be a 1-D per-SNP array")
    out = []
    seen = set()
    s = 0
    for i in range(1, len(chromosomes) + 1):
        if i == len(chromosomes) or chromosomes[i] != chromosomes[s]:
            c = chromosomes[s].item() if hasattr(chromosomes[s], "item") \
                else chromosomes[s]
            if c in seen:
                raise ValueError(
                    f"chromosome {c!r} appears in non-contiguous blocks; "
                    "sort SNPs chromosome-major first")
            seen.add(c)
            out.append((c, s, i))
            s = i
    return out


def _eigh_host_np(K, factor_dtype=None) -> Tuple[np.ndarray, np.ndarray]:
    """(phi, U) descending (EMMA convention) as HOST numpy arrays.

    emmax_loco's pipeline keeps eigendecompositions on host: the null
    REML runs in host float64 anyway, so returning device arrays (as
    eigen_k does) would cost a 420 MB H2D upload AND a 420 MB D2H
    readback per chromosome through this image's tunnel; the scan's
    one W upload happens inside build_rotated_null regardless."""
    from mixmogam_tpu.ops.eigen import _host_eigh

    w, v = _host_eigh(K, np.float64 if factor_dtype is None
                      else factor_dtype)
    return w[::-1].copy(), v[:, ::-1].copy()


def _source_content_key(G) -> Optional[str]:
    """Stable content identity of a genotype source for the LOCO eigen
    cache (VERDICT r4 weak #4): ResidentGenome hashes its packed rows,
    GenotypeData has content_hash(), small bare arrays hash directly;
    None (no caching) for unhashable/huge bare sources."""
    import hashlib

    from mixmogam_tpu.models.resident import ResidentGenome

    if isinstance(G, ResidentGenome):
        return G.content_key()
    if hasattr(G, "content_hash"):
        return G.content_hash()[:16]
    arr = G.matrix if hasattr(G, "matrix") else G
    if isinstance(arr, np.ndarray) and arr.nbytes <= (1 << 30):
        return hashlib.sha256(
            np.ascontiguousarray(arr).tobytes()).hexdigest()[:16]
    return None


def _eigen_cache_path(cache_dir: str, key: str) -> str:
    import os

    os.makedirs(cache_dir, exist_ok=True)
    return os.path.join(cache_dir, f"loco_eigen_{key}.npz")


def _eigen_cache_load(path: str):
    import os

    if not os.path.exists(path):
        return None
    try:
        with np.load(path, allow_pickle=False) as z:
            return z["phi"], z["U"]
    except Exception:
        # a corrupt/truncated artifact (e.g. two campaigns racing the
        # same cache_dir) must fall back to recomputing the eigh, not
        # abort the resume (review r5 #5)
        _log.warning("unreadable LOCO eigen cache entry %s; recomputing",
                     path)
        return None


def _eigen_cache_save(path: str, phi: np.ndarray, U: np.ndarray) -> None:
    import os

    # uncompressed: U is ~420 MB f32 at n=10,240 and savez_compressed
    # would add ~a minute of host CPU per chromosome on this 2-vCPU
    # image; write via a PID-unique temp file + atomic replace so a
    # killed run never leaves a truncated artifact and concurrent
    # campaigns sharing a cache_dir cannot interleave writes
    tmp = f"{path}.tmp{os.getpid()}.npz"
    np.savez(tmp, phi=phi, U=U)
    os.replace(tmp, path)


def _rows(G, s: int, e: int) -> np.ndarray:
    """Host int8/float rows [s, e) from any kinship source."""
    from mixmogam_tpu.models.resident import ResidentGenome

    if isinstance(G, ResidentGenome):
        return G[s:e]
    mat = G.matrix if hasattr(G, "matrix") else G
    return np.asarray(mat[s:e])


def _vanraden_den(rows: np.ndarray, ploidy: int) -> float:
    """ploidy * sum_j p_j (1 - p_j) with the kernel's imputation rule
    (ops.kinship._impute_chunk: per-SNP mean over observed)."""
    from mixmogam_tpu.ops.kinship import _impute_chunk

    den = 0.0
    for s in range(0, rows.shape[0], 8192):
        C = _impute_chunk(rows[s:s + 8192], "float64")
        p = C.mean(axis=1) / ploidy
        den += float(ploidy * np.sum(p * (1.0 - p)))
    return den


def loco_kinships(G, chromosomes=None, method: str = "ibs",
                  ploidy: Optional[int] = None, scale: bool = True,
                  K_total: Optional[np.ndarray] = None,
                  **kin_kw) -> Dict[object, np.ndarray]:
    """{chrom: K_loco} — kinship from every chromosome EXCEPT the key.

    G: GenotypeData (chromosomes taken from it when not given),
    ResidentGenome, or an (M, n) array + explicit per-SNP chromosomes.
    K_total: reuse an already-built whole-genome kinship of the SAME
    method (un-scaled); None builds it (ResidentGenome total rides the
    fused HBM kernel). scale: scale_k-normalize each LOCO matrix (the
    facade convention before REML).
    """
    from mixmogam_tpu.ops.kinship import kinship
    from mixmogam_tpu.oracle.kinship import scale_k

    if chromosomes is None:
        chromosomes = getattr(G, "chromosomes", None)
        if chromosomes is None:
            raise ValueError("pass chromosomes= for a bare matrix source")
    ranges = _chrom_ranges(chromosomes)
    if len(ranges) < 2:
        raise ValueError("LOCO needs at least 2 chromosomes")
    M = len(np.asarray(chromosomes))
    shp = getattr(G, "shape", None)
    if shp is not None and shp[0] != M:
        raise ValueError(f"chromosomes has {M} entries but the source "
                         f"holds {shp[0]} SNPs")
    if ploidy is None:
        ploidy = getattr(G, "ploidy", None)
    if ploidy is None:
        # resolve ONCE from the whole matrix so per-chromosome calls
        # can't auto-detect differently (a chromosome with no dosage-2
        # would otherwise be treated haploid)
        mat = G.matrix if hasattr(G, "matrix") else np.asarray(G)
        ploidy = 2 if mat.max(initial=0) > 1 else 1

    vr = method in ("vanraden", "ibd")
    if K_total is None:
        K_total = kinship(G, method=method, ploidy=ploidy, **kin_kw)
    K_total = np.asarray(K_total, dtype=np.float64)

    from mixmogam_tpu.models.resident import (ResidentGenome,
                                              kinship_resident_range)

    rg = G if isinstance(G, ResidentGenome) else None
    out: Dict[object, np.ndarray] = {}
    nums: Dict[object, np.ndarray] = {}
    dens: Dict[object, float] = {}
    for c, s, e in ranges:
        if rg is not None:
            # per-chromosome gram straight off packed HBM — no host
            # decode; the range-masked fused kernel gives ONE compile
            # across all chromosomes (round 4)
            K_c, den = kinship_resident_range(rg, s, e, method=method,
                                              ploidy=ploidy,
                                              return_den=True)
            dens[c] = den
        else:
            rows = _rows(G, s, e)
            K_c = kinship(rows, method=method, ploidy=ploidy, **kin_kw)
            dens[c] = (_vanraden_den(rows, ploidy) if vr
                       else float(e - s))
        nums[c] = np.asarray(K_c, np.float64) * dens[c]
    if vr:
        den_tot = sum(dens.values())
    else:
        den_tot = float(M)
    num_tot = K_total * den_tot
    for c, s, e in ranges:
        Kl = (num_tot - nums[c]) / (den_tot - dens[c])
        out[c] = scale_k(Kl) if scale else Kl
    return out


def emmax_loco(G, y, chromosomes=None, method: str = "ibs",
               X0=None, ploidy: Optional[int] = None,
               kinships: Optional[Dict] = None,
               ngrids: int = 100, llim: float = -10.0, ulim: float = 10.0,
               esp: float = 1e-6, with_betas: bool = True,
               precision: Optional[str] = None,
               dtype=None, pipeline_eigh: bool = True,
               cache_dir: Optional[str] = None,
               mesh=None, **kw) -> Dict[str, np.ndarray]:
    """EMMAX where each chromosome is scanned under the null whose
    random effect excludes that chromosome (LOCO).

    Returns the models.emmax dict (arrays in source SNP order) plus
    'loco': {chrom: {delta, pseudo_heritability, ll_null}}. Cost note:
    one REML + one host eigh PER chromosome — the irreducible LOCO
    surcharge (precision='fast' runs the eighs in f32/ssyevd, measured
    1.45x). pipeline_eigh overlaps chromosome c+1's host eigh with
    chromosome c's null fit + device scan in a single worker thread
    (prefetch depth 1 — two (phi, U) pairs live at once, ~0.9 GB at
    n=10,240 f32). A ResidentGenome source with kinships=None goes
    further: each K_loco is built lazily inside the worker (range-
    masked device gram + D2H + recombination algebra + eigh), so the
    whole kinship bill ALSO overlaps the scans and only ~2 LOCO
    matrices are alive at once. The scans source packed HBM and ride
    the precision tiers; no host decode anywhere. kinships: reuse
    loco_kinships output (e.g. cached); built here otherwise.

    cache_dir (VERDICT r4 weak #4): persist each chromosome's (phi, U)
    keyed by source CONTENT + chromosome range + method/ploidy/eigh
    dtype. A killed or repeated campaign then resumes scan-bound
    (minutes) instead of re-paying the ~22 x 100-300 s eigh wall; when
    EVERY chromosome is cached, the total-kinship gram is skipped too.
    kinships passed explicitly are keyed by their own content hash.

    mesh (VERDICT r4 #4): a ('snp', 'sample') device mesh routes every
    per-chromosome scan through the sharded paths — a ResidentGenome
    source scans its packed shards (distributed_emmax_resident, incl.
    sample-TP meshes), host sources scan SNP-sharded rows
    (distributed_emmax); null fits + eighs stay on host, pipelined as
    usual. Runs the exact tier (pass precision=None/'exact').
    """
    from concurrent.futures import ThreadPoolExecutor

    from mixmogam_tpu.models.emmax import emmax
    from mixmogam_tpu.models.resident import ResidentGenome

    if chromosomes is None:
        chromosomes = getattr(G, "chromosomes", None)
        if chromosomes is None:
            raise ValueError("pass chromosomes= for a bare matrix source")
    chromosomes = np.asarray(chromosomes)
    ranges = _chrom_ranges(chromosomes)
    if len(ranges) < 2:
        # the lazy path must refuse too (review r4 #1: den_tot - den_c
        # == 0 would make K_loco = 0/0 -> NaN -> all-p=1 garbage)
        raise ValueError("LOCO needs at least 2 chromosomes")
    y = np.asarray(y, dtype=np.float64).ravel()
    M = len(chromosomes)
    rg = G if isinstance(G, ResidentGenome) else None
    if mesh is not None:
        if precision not in (None, "exact"):
            raise ValueError(
                "mesh-distributed LOCO runs the exact tier; pass "
                "precision=None/'exact'")
        if kw:
            raise TypeError(
                f"mesh-distributed LOCO does not accept {sorted(kw)}")
    factor_dtype = np.float32 if str(precision) == "fast" else None
    ftag = "f32" if factor_dtype is np.float32 else "f64"
    lazy = kinships is None and rg is not None and pipeline_eigh
    # the source-content key feeds ONLY the lazy path's range cache;
    # computing it on the non-lazy path would hash the full source for
    # nothing (review r5 #3 — the explicit-kinship cache keys on the
    # kinship content instead)
    src_key = (_source_content_key(G)
               if cache_dir is not None and lazy else None)
    if kinships is None and not lazy:
        kinships = loco_kinships(G, chromosomes, method=method,
                                 ploidy=ploidy)

    def _range_cache_path(pl, s_c: int, e_c: int) -> Optional[str]:
        if cache_dir is None or src_key is None:
            return None
        return _eigen_cache_path(
            cache_dir, f"{src_key}_{method}_p{pl}_{s_c}_{e_c}_{ftag}")

    def _eigh_k_cached(K_c) -> Tuple[np.ndarray, np.ndarray]:
        """Non-lazy path: eigh of a caller-supplied K_loco, cached by
        the KINSHIP's own content (the source key would be wrong for a
        user-built/unscaled kinships dict)."""
        cpath = None
        if cache_dir is not None:
            import hashlib

            kh = hashlib.sha256(np.ascontiguousarray(
                K_c, dtype=np.float64).tobytes()).hexdigest()[:16]
            cpath = _eigen_cache_path(cache_dir, f"K{kh}_{ftag}")
            hit = _eigen_cache_load(cpath)
            if hit is not None:
                return hit
        eig = _eigh_host_np(K_c, factor_dtype)
        if cpath is not None:
            _eigen_cache_save(cpath, np.asarray(eig[0], np.float64),
                              eig[1])
        return eig

    if lazy:
        # build each K_loco INSIDE the worker, right before its eigh:
        # the per-chromosome device gram, its D2H fetch (the dominant
        # cost on this image's ~20 MB/s link — 22 x 420 MB), the
        # recombination algebra AND the eigh all overlap the main
        # thread's null fits + device scans, and only ~2 LOCO matrices
        # are ever alive (vs 22 x 0.8 GB precomputed)
        from mixmogam_tpu.models.resident import (kinship_resident,
                                                  kinship_resident_range)
        from mixmogam_tpu.oracle.kinship import scale_k

        pl = rg.ploidy if ploidy is None else ploidy
        # total kinship built on FIRST need, inside the (single) worker
        # thread: when every chromosome's eigen is cached, the whole
        # gram + D2H bill is skipped
        tot: Dict[str, object] = {}

        def _ensure_tot():
            if "num" not in tot:
                K_tot, den_tot = kinship_resident(rg, method=method,
                                                  ploidy=pl,
                                                  return_den=True)
                tot["num"] = np.asarray(K_tot, np.float64) * den_tot
                tot["den"] = den_tot
            return tot["num"], tot["den"]

        def prep_eig(s_c: int, e_c: int):
            cpath = _range_cache_path(pl, s_c, e_c)
            if cpath is not None:
                hit = _eigen_cache_load(cpath)
                if hit is not None:
                    _log.info("loco prep [%d,%d): eigen cache hit",
                              s_c, e_c)
                    return hit
            num_tot, den_tot = _ensure_tot()
            t0 = _time.time()
            K_c, den_c = kinship_resident_range(rg, s_c, e_c,
                                                method=method,
                                                ploidy=pl,
                                                return_den=True)
            t1 = _time.time()
            Kl = (num_tot - np.asarray(K_c, np.float64) * den_c) \
                / (den_tot - den_c)
            eig = _eigh_host_np(scale_k(Kl), factor_dtype)
            _log.info("loco prep [%d,%d): gram+fetch %.1fs, "
                      "algebra+eigh %.1fs", s_c, e_c, t1 - t0,
                      _time.time() - t1)
            if cpath is not None:
                _eigen_cache_save(cpath, np.asarray(eig[0], np.float64),
                                  eig[1])
            return eig
    merged: Dict[str, np.ndarray] = {}
    loco_info: Dict[object, Dict[str, float]] = {}
    with ThreadPoolExecutor(max_workers=1) as ex:
        futs: Dict[object, object] = {}

        def submit(i: int) -> None:
            if pipeline_eigh and i < len(ranges):
                c_i, s_i, e_i = ranges[i]
                futs[c_i] = (ex.submit(prep_eig, s_i, e_i) if lazy
                             else ex.submit(_eigh_k_cached,
                                            kinships[c_i]))

        # host-source slices pad to ONE fixed row count so all 22
        # per-chromosome scans share a single compile (CLAUDE.md
        # shared-compile rule; review r5-cont: distinct (e-s, n) shapes
        # recompiled the scan per chromosome). Zero pad rows are
        # monomorphic -> masked, and the assembly below slices [:e-s].
        m_fix = max((e_ - s_ for _, s_, e_ in ranges), default=0)

        def _rows_fixed(s_, e_):
            R = _rows(G, s_, e_)
            if R.shape[0] < m_fix:
                R = np.vstack([R, np.zeros((m_fix - R.shape[0],
                                            R.shape[1]), R.dtype)])
            return R

        submit(0)
        for i, (c, s, e) in enumerate(ranges):
            submit(i + 1)  # c+1's eigh runs under c's fit + scan
            t_w = _time.time()
            eig = futs.pop(c).result() if pipeline_eigh else None
            t_fit = _time.time()
            # resident source: scan the FULL container under this
            # chromosome's null and keep rows [s, e) — one scan compile
            # total, where per-chromosome packed slices would each
            # recompile (22 distinct shapes x ~25 s on the remote
            # toolchain); the discarded rows cost ~e-s/M of a 1.4-3.6 s
            # scan, far below one compile
            K_c = None if eig is not None else kinships[c]
            if mesh is not None:
                from mixmogam_tpu.parallel.distributed import (
                    distributed_emmax, distributed_emmax_resident)

                if rg is not None:
                    res = distributed_emmax_resident(
                        rg, y, K=K_c, eig_k=eig, X0=X0, mesh=mesh,
                        ngrids=ngrids, llim=llim, ulim=ulim, esp=esp,
                        dtype=dtype)
                else:
                    res = distributed_emmax(
                        _rows_fixed(s, e), y, K=K_c, eig_k=eig, X0=X0,
                        mesh=mesh, ngrids=ngrids, llim=llim, ulim=ulim,
                        esp=esp, dtype=dtype)
            else:
                src = rg if rg is not None else _rows_fixed(s, e)
                res = emmax(src, y, K=K_c, eig_k=eig, X0=X0,
                            ngrids=ngrids, llim=llim, ulim=ulim, esp=esp,
                            with_betas=with_betas, precision=precision,
                            dtype=dtype, **kw)
            _log.info("loco chrom %s: waited-on-eigh %.1fs, "
                      "fit+scan %.1fs", c, t_fit - t_w,
                      _time.time() - t_fit)
            loco_info[c] = {
                "delta": res["delta"],
                "pseudo_heritability": res["pseudo_heritability"],
                "ll_null": res["ll_null"],
            }
            for k in ("ps", "f_stats", "mask", "betas", "var_perc"):
                if k not in res or res[k] is None:
                    continue
                if k not in merged:
                    merged[k] = np.empty((M,) + np.shape(res[k])[1:],
                                         dtype=np.asarray(res[k]).dtype)
                rows_out = (np.asarray(res[k])[s:e] if rg is not None
                            else np.asarray(res[k])[: e - s])
                merged[k][s:e] = rows_out
    merged["loco"] = loco_info
    merged["dof"] = res["dof"]
    return merged
