"""Genotype file parsing (reference: dataParsers.py + hdf5_data.py,
SURVEY.md §2.1 L2).

Formats:
- 'binary'/'dosage' CSV: header 'Chromosome,Position,acc1,...'; rows of
  integer dosages (0/1 binary-coded inbred data like the reference's
  bundled Arabidopsis set, or 0/1/2 diploid), NA = missing.
- 'nucleotides' CSV: same layout but A/C/G/T calls; decoded to 0/1 against
  the per-SNP major allele (two most frequent alleles kept, others ->
  missing), alleles recorded.
- HDF5: the framework's native container (see GenotypeData.read_hdf5).

Parsing streams line-by-line into preallocated int8 — the entire genome is
one packed matrix, ready for device tiling (no per-chromosome Python
lists)."""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from mixmogam_tpu.data.genotype import GenotypeData, MISSING

_MISSING_TOKENS = {"", "NA", "N", "NaN", "nan", "-", "?"}


def _try_native_dosage(path: str):
    """C++ threaded parser (mixmogam_tpu.native); None -> Python fallback."""
    try:
        from mixmogam_tpu import native

        return native.parse_dosage_csv(path)
    except Exception:
        return None


def parse_snp_data(path: str, data_format: str = "binary",
                   delimiter: str = ",", ploidy: Optional[int] = None
                   ) -> GenotypeData:
    """Parse a genotype file into a GenotypeData
    (reference: dataParsers.parse_snp_data)."""
    if path.endswith((".h5", ".hdf5")):
        return GenotypeData.read_hdf5(path)
    if data_format in ("binary", "dosage", "int"):
        return _parse_dosage_csv(path, delimiter, ploidy)
    if data_format in ("nucleotides", "nt"):
        return _parse_nucleotide_csv(path, delimiter)
    raise ValueError(f"unknown data_format {data_format!r}")


def _read_header(f, delimiter: str) -> List[str]:
    header = f.readline().rstrip("\n").split(delimiter)
    if len(header) < 3:
        raise ValueError("genotype CSV needs Chromosome,Position,acc...")
    return [a.strip() for a in header[2:]]


def _parse_dosage_csv(path: str, delimiter: str,
                      ploidy: Optional[int]) -> GenotypeData:
    if delimiter == ",":
        native = _try_native_dosage(path)
        if native is not None:
            matrix, chroms_a, poss_a, n = native
            with open(path) as f:
                accessions = _read_header(f, delimiter)
            if len(accessions) == n:
                if ploidy is None:
                    ploidy = 2 if matrix.max(initial=0) > 1 else 1
                return GenotypeData(matrix=matrix, chromosomes=chroms_a,
                                    positions=poss_a,
                                    accessions=accessions, ploidy=ploidy)
    chroms: List[int] = []
    poss: List[int] = []
    rows: List[np.ndarray] = []
    with open(path) as f:
        accessions = _read_header(f, delimiter)
        n = len(accessions)
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            parts = line.split(delimiter)
            chroms.append(int(parts[0]))
            poss.append(int(parts[1]))
            row = np.full(n, MISSING, dtype=np.int8)
            for i, tok in enumerate(parts[2:2 + n]):
                tok = tok.strip()
                if tok not in _MISSING_TOKENS:
                    row[i] = int(tok)
            rows.append(row)
    matrix = np.vstack(rows) if rows else np.zeros((0, n), dtype=np.int8)
    if ploidy is None:
        ploidy = 2 if matrix.max(initial=0) > 1 else 1
    return GenotypeData(matrix=matrix,
                        chromosomes=np.asarray(chroms, dtype=np.int32),
                        positions=np.asarray(poss, dtype=np.int64),
                        accessions=accessions, ploidy=ploidy)


def _parse_nucleotide_csv(path: str, delimiter: str) -> GenotypeData:
    chroms: List[int] = []
    poss: List[int] = []
    rows: List[np.ndarray] = []
    alleles: List[List[str]] = []
    with open(path) as f:
        accessions = _read_header(f, delimiter)
        n = len(accessions)
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            parts = line.split(delimiter)
            chroms.append(int(parts[0]))
            poss.append(int(parts[1]))
            calls = np.array([t.strip().upper() for t in parts[2:2 + n]])
            obs = ~np.isin(calls, list(_MISSING_TOKENS))
            vals, counts = np.unique(calls[obs], return_counts=True)
            order = np.argsort(-counts)
            # assign dosages on OBSERVED calls only: the 'N' placeholder
            # recorded for absent major/minor alleles is also a missing
            # token, so matching it against raw calls would hand real
            # dosages to missing calls (monomorphic SNPs would gain a
            # fake minor allele perfectly correlated with missingness)
            row = np.full(n, MISSING, dtype=np.int8)
            major, minor = "N", "N"
            if len(vals):
                major = vals[order[0]]
                row[obs & (calls == major)] = 0
            if len(vals) > 1:
                minor = vals[order[1]]
                row[obs & (calls == minor)] = 1
            rows.append(row)
            alleles.append([major, minor])
    matrix = np.vstack(rows) if rows else np.zeros((0, n), dtype=np.int8)
    return GenotypeData(matrix=matrix,
                        chromosomes=np.asarray(chroms, dtype=np.int32),
                        positions=np.asarray(poss, dtype=np.int64),
                        accessions=accessions, ploidy=1,
                        alleles=np.asarray(alleles))
