"""VCF genotype input/output (capability extension).

The reference reads only its own CSV/HDF5 formats (dataParsers.py per
SURVEY.md §2.1 — the mount was empty; no reference file to cite); modern
cohorts ship as VCF, so this closes the same gap as data/plink.py does
for PLINK filesets. GT-field parsing only (the association models consume
hard-call dosages); plain-text and gzip/bgzip-compressed files.

Conventions:
- Dosage counts ALT alleles (the VCF/PLINK "--keep-allele-order"
  convention; NOT necessarily the minor allele). ``alleles`` stores
  [REF, ALT] per site.
- Multi-allelic sites: the dosage counts allele index 1 (the FIRST ALT);
  any call carrying an allele index >= 2 is coded missing — the same
  "third allele -> missing" rule as the nucleotide CSV decoder
  (data/parsers.py).
- Ploidy is the maximum GT arity observed (diploid '0/1' -> 2, haploid
  '0' -> 1); phased '|' and unphased '/' are equivalent. A haploid call
  in a diploid file contributes its literal copy count (chrX-style mixed
  ploidy is preserved per call, not doubled).
- Chromosome names: a leading 'chr' prefix is stripped; numeric names
  keep their value; non-numeric names (X, Y, MT, scaffolds) get
  sequential integer codes above the largest numeric code, in first-
  appearance order. ``read_vcf(..., return_chrom_map=True)`` also
  returns the {name: code} dict.
"""

from __future__ import annotations

import gzip
from typing import Dict, List, Optional, Tuple, Union

import numpy as np

from mixmogam_tpu.data.genotype import GenotypeData, MISSING

_MISSING_GT = {".", "./.", ".|."}


def _open_text(path: str):
    if path.endswith(".gz"):
        return gzip.open(path, "rt")
    return open(path)


def _chrom_code(name: str, numeric_max: List[int],
                mapping: Dict[str, int]) -> int:
    if name in mapping:
        return mapping[name]
    stripped = name[3:] if name.lower().startswith("chr") else name
    try:
        code = int(stripped)
        numeric_max[0] = max(numeric_max[0], code)
    except ValueError:
        code = None
    mapping[name] = code  # may be None for now; resolved in a 2nd pass
    return code


def _parse_gt(tok: str) -> Optional[Tuple[int, ...]]:
    """GT string -> tuple of allele indices, or None if missing.
    '0/1' -> (0, 1); '0|0' -> (0, 0); '1' -> (1,); './.' / '.' -> None.
    A partial call like './1' keeps the observed allele only."""
    if tok in _MISSING_GT:
        return None
    out = []
    for a in tok.replace("|", "/").split("/"):
        if a == ".":
            continue
        try:
            out.append(int(a))
        except ValueError:
            return None
    return tuple(out) if out else None


def _read_vcf_native(path: str):
    """(GenotypeData, chrom_map) via the threaded C++ parser
    (native/fast_vcf.cpp), or None -> pure-Python path (gzip, missing
    toolchain, or any structural irregularity — the Python reader then
    raises a descriptive error where one is due)."""
    try:
        from mixmogam_tpu import native
    except Exception:
        return None
    samples = None
    try:
        with open(path) as f:
            for line in f:
                if line.startswith("##"):
                    continue
                if line.startswith("#CHROM"):
                    parts = line.rstrip("\n").split("\t")
                    if len(parts) < 10 or parts[8] != "FORMAT":
                        return None  # Python path raises properly
                    samples = parts[9:]
                break
    except (OSError, UnicodeDecodeError):
        return None
    if not samples:
        return None
    out = native.parse_vcf(path, len(samples))
    if out is None:
        return None
    mat, poss, codes, names, alleles, arity = out
    # resolve chromosome codes with the Python reader's exact
    # semantics: numeric names keep their value; non-numeric names get
    # sequential codes above the largest numeric code, in
    # first-appearance order of the ORIGINAL name
    name_strs = [bytes(r).rstrip(b"\0").decode() for r in names] \
        if len(names) else []
    mapping: Dict[str, int] = {}
    numeric_max = int(codes[codes >= 0].max()) if (codes >= 0).any() else 0
    chrom_out = np.asarray(codes, dtype=np.int32).copy()
    pending = []
    for i, nm in enumerate(name_strs):
        if nm not in mapping:
            mapping[nm] = int(codes[i])
            if codes[i] < 0:
                pending.append(nm)
    next_code = numeric_max
    for nm in pending:
        next_code += 1
        mapping[nm] = next_code
    if pending:
        lut = np.asarray([mapping[nm] for nm in name_strs],
                         dtype=np.int32)
        chrom_out = lut
    gd = GenotypeData(
        matrix=mat, chromosomes=chrom_out, positions=poss,
        accessions=samples, ploidy=int(arity),
        alleles=alleles if len(alleles) else None)
    return gd, mapping


def read_vcf(path: str, return_chrom_map: bool = False
             ) -> Union[GenotypeData, Tuple[GenotypeData, Dict[str, int]]]:
    """Parse a VCF (.vcf or .vcf.gz) into a GenotypeData of hard-call
    ALT dosages. See the module docstring for coding conventions.
    Plain-text files route through the threaded C++ parser
    (native/fast_vcf.cpp) when available; gzip and anything irregular
    take the pure-Python path below (identical output, parity-pinned
    in tests/test_vcf.py)."""
    if not path.endswith(".gz"):
        nat = _read_vcf_native(path)
        if nat is not None:
            gd, mapping = nat
            return (gd, mapping) if return_chrom_map else gd
    chrom_names: List[str] = []
    poss: List[int] = []
    rows: List[np.ndarray] = []
    alleles: List[Tuple[str, str]] = []
    samples: List[str] = []
    max_arity = 1
    numeric_max = [0]
    mapping: Dict[str, Optional[int]] = {}
    with _open_text(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            if line.startswith("##"):
                continue
            if line.startswith("#CHROM"):
                parts = line.split("\t")
                if len(parts) < 10 or parts[8] != "FORMAT":
                    raise ValueError(
                        "VCF has no sample/FORMAT columns: " + parts[0])
                samples = parts[9:]
                continue
            if not samples:
                raise ValueError("VCF data line before #CHROM header")
            parts = line.split("\t")
            if len(parts) < 9:
                raise ValueError(
                    f"truncated VCF record ({len(parts)} tab-separated "
                    f"fields, need >= 9): {line[:80]!r}")
            chrom, pos, _id, ref, alt = parts[:5]
            fmt = parts[8].split(":")
            try:
                gt_idx = fmt.index("GT")
            except ValueError:
                continue  # no GT for this record -> skip
            _chrom_code(chrom, numeric_max, mapping)
            chrom_names.append(chrom)
            poss.append(int(pos))
            alt0 = alt.split(",")[0]
            alleles.append((ref, alt0))
            row = np.full(len(samples), MISSING, dtype=np.int8)
            for i, call in enumerate(parts[9:9 + len(samples)]):
                gt_tok = call.split(":")[gt_idx] if ":" in call else call
                gt = _parse_gt(gt_tok)
                if gt is None or any(a > 1 for a in gt):
                    continue  # missing, or carries a 2nd ALT allele
                max_arity = max(max_arity, len(gt))
                row[i] = sum(gt)
            rows.append(row)
    # resolve non-numeric chromosome codes above the numeric range
    next_code = numeric_max[0]
    for name in mapping:
        if mapping[name] is None:
            next_code += 1
            mapping[name] = next_code
    n = len(samples)
    matrix = np.vstack(rows) if rows else np.zeros((0, n), dtype=np.int8)
    gd = GenotypeData(
        matrix=matrix,
        chromosomes=np.asarray([mapping[c] for c in chrom_names],
                               dtype=np.int32),
        positions=np.asarray(poss, dtype=np.int64),
        accessions=samples,
        ploidy=max_arity,
        alleles=np.asarray(alleles) if alleles else None,
    )
    if return_chrom_map:
        return gd, {k: int(v) for k, v in mapping.items()}
    return gd


def write_vcf(gd: GenotypeData, path: str,
              chrom_names: Optional[Dict[int, str]] = None) -> None:
    """Write a GenotypeData as a minimal GT-only VCF (gzipped iff the
    path ends in .gz). Dosages are emitted as unphased hard calls
    counting the ALT allele; ``gd.alleles`` columns map to [REF, ALT]
    (placeholder A/C when absent). Round-trips through read_vcf."""
    ploidy = gd.ploidy
    if gd.matrix.size and int(gd.matrix.max(initial=0)) > ploidy:
        raise ValueError(
            f"dosages up to {int(gd.matrix.max())} exceed ploidy="
            f"{ploidy}; fix the container's ploidy before writing VCF")
    # generic GT codes for ANY ploidy (read_vcf can produce ploidy > 2
    # from polyploid files — ADVICE r3): dosage d -> (ploidy-d) REF
    # copies then d ALT copies, e.g. ploidy=4 d=3 -> '0/1/1/1'
    codes = {d: "/".join(["0"] * (ploidy - d) + ["1"] * d)
             for d in range(ploidy + 1)}
    codes[MISSING] = "/".join(["."] * ploidy)
    out = gzip.open(path, "wt") if path.endswith(".gz") else open(path, "w")
    with out as f:
        f.write("##fileformat=VCFv4.2\n")
        f.write("##source=mixmogam_tpu\n")
        f.write('##FORMAT=<ID=GT,Number=1,Type=String,Description='
                '"Genotype">\n')
        f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
                + "\t".join(gd.accessions) + "\n")
        A = gd.alleles
        for j in range(gd.num_snps):
            chrom = int(gd.chromosomes[j])
            name = chrom_names.get(chrom, str(chrom)) if chrom_names \
                else str(chrom)
            ref, alt = (str(A[j, 0]), str(A[j, 1])) if A is not None \
                else ("A", "C")
            calls = "\t".join(codes[int(g)] for g in gd.matrix[j])
            f.write(f"{name}\t{int(gd.positions[j])}\t"
                    f"snp_{chrom}_{int(gd.positions[j])}\t{ref}\t{alt}"
                    f"\t.\t.\t.\tGT\t{calls}\n")
