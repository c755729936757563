"""Cohort-scale VCF parse measurement (VERDICT r3 #8 / ADVICE r3):
generate a ~1 GB simulated VCF once (cached), then measure wall + peak
RSS for (a) read_vcf_packed — the memory-bounded chunked parse into the
2-bit container — and (b) read_vcf — the full (M, n) int8 matrix — each
in a fresh subprocess so ru_maxrss is the parse's own peak. CPU-only
(no TPU claim: JAX stays unimported in the parse children;
read_vcf_packed's device upload is skipped via MIXMOGAM_PACK_HOST_ONLY
measuring the parse+pack phase, which is the subject here).

Appends a record to docs/baseline_r4.json."""

import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
CACHE = os.path.expanduser("~/.cache/mixmogam_bench")
N, M = 4000, 65536  # ~1.0 GB plain text, ~16 KB/line


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def gen(path):
    rng = np.random.default_rng(0)
    codes = np.array([b"0/0", b"0/1", b"1/1", b"./."])
    t0 = time.time()
    with open(path, "wb") as f:
        f.write(b"##fileformat=VCFv4.2\n")
        f.write(b"#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
                + b"\t".join(f"s{i}".encode() for i in range(N)) + b"\n")
        chunk = 2048
        for s in range(0, M, chunk):
            m = min(chunk, M - s)
            g = rng.integers(0, 3, size=(m, N))
            g[rng.random((m, N)) < 0.01] = 3  # ./.
            rows = codes[g]  # (m, N) of 3-byte calls
            for j in range(m):
                pos = s + j + 1
                f.write(b"1\t" + str(pos).encode()
                        + b"\t.\tA\tG\t.\t.\t.\tGT\t"
                        + b"\t".join(rows[j]) + b"\n")
    log(f"generated {os.path.getsize(path)/1e9:.2f} GB VCF in "
        f"{time.time()-t0:.0f}s")


CHILD = r"""
import json, resource, sys, time
sys.path.insert(0, REPO_PLACEHOLDER)
mode, path = sys.argv[1], sys.argv[2]
t0 = time.time()
if mode == "packed":
    from mixmogam_tpu.data.vcf import _vcf_header_samples, _iter_vcf_python
    from mixmogam_tpu import native
    # parse+pack WITHOUT the jax upload (pure host phase): mirror
    # read_vcf_packed's consume loop
    samples = _vcf_header_samples(path)
    packed = []
    n_rows = 0
    if native.available():
        it = ((mat, pos) for (mat, pos, _c, _n, _a, _ar)
              in native.iter_vcf(path, len(samples), chunk_rows=16384))
    else:
        it = ((mat, pos) for (_s, mat, pos, _n, _a, _ar)
              in _iter_vcf_python(path, chunk_rows=16384))
    for mat, _pos in it:
        packed.append(native.pack_2bit(mat))
        n_rows += mat.shape[0]
    import numpy as np
    hp = np.vstack(packed)
    out_bytes = hp.nbytes
else:
    from mixmogam_tpu.data.vcf import read_vcf
    gd = read_vcf(path)
    n_rows = gd.num_snps
    out_bytes = gd.matrix.nbytes
wall = time.time() - t0
peak_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
print(json.dumps({"mode": mode, "rows": n_rows, "wall_s": round(wall, 1),
                  "peak_rss_mb": round(peak_mb), "out_mb": out_bytes >> 20}))
"""


def run_child(mode, path):
    env = dict(os.environ, MIXMOGAM_NO_WARMUP="1", JAX_PLATFORMS="",
               JAX_PLATFORM_NAME="cpu")
    r = subprocess.run([sys.executable, "-c",
                        CHILD.replace("REPO_PLACEHOLDER", repr(REPO)),
                        mode, path], capture_output=True, text=True,
                       env=env, timeout=3600)
    line = r.stdout.strip().splitlines()[-1]
    rec = json.loads(line)
    log(f"{mode}: {rec}")
    return rec


def main():
    os.makedirs(CACHE, exist_ok=True)
    path = os.path.join(CACHE, f"cohort_{N}x{M}.vcf")
    if not os.path.exists(path):
        gen(path)
    size_gb = os.path.getsize(path) / 1e9
    rp = run_child("packed", path)
    rf = run_child("full", path)
    rec = {"phase": "vcf_cohort_parse", "ts": time.strftime("%F %T"),
           "n": N, "M": M, "file_gb": round(size_gb, 2),
           "packed": rp, "full_matrix": rf,
           "rss_ratio": round(rf["peak_rss_mb"]
                              / max(rp["peak_rss_mb"], 1), 2)}
    p = os.path.join(REPO, "docs", "baseline_r4.json")
    d = json.load(open(p)) if os.path.exists(p) else []
    d.append(rec)
    json.dump(d, open(p, "w"), indent=2)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
