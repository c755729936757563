"""Results layer, mtcorr, data IO round-trips, facade + CLI
(SURVEY.md checklist: Result layer, Bonferroni/BH/BHY, plots, facade)."""

import json
import os

import numpy as np
import pytest

from mixmogam_tpu.results import (Result, bonferroni_threshold,
                                  get_bh_thres, get_bhy_thres)
from mixmogam_tpu.results.result import Gene


class TestMtcorr:
    def test_bonferroni(self):
        assert bonferroni_threshold(1000) == 0.05 / 1000

    def test_bh_known_case(self):
        # classic BH example: m=10
        p = np.array([0.001, 0.008, 0.039, 0.041, 0.042, 0.06, 0.074,
                      0.205, 0.212, 0.216])
        r = get_bh_thres(p, 0.05)
        # k: largest i with p_(i) <= i/10*0.05 -> i=5? p5=0.042 > 0.025;
        # i=4: 0.041 > 0.02; i=3: 0.039>0.015; i=2: 0.008<=0.01 -> k=2
        assert r["thres_i"] == 2
        assert np.isclose(r["thes_pval"], 0.008)

    def test_bhy_stricter_than_bh(self):
        rng = np.random.default_rng(0)
        p = rng.random(500) ** 2
        bh = get_bh_thres(p, 0.05)
        bhy = get_bhy_thres(p, 0.05)
        assert bhy["thres_i"] <= bh["thres_i"]

    def test_bh_no_rejections(self):
        r = get_bh_thres(np.array([0.9, 0.95, 0.99]), 0.05)
        assert r["thres_i"] == 0


class TestResult:
    def _mk(self):
        ps = np.array([1e-8, 0.5, 1e-3, 0.2, 1e-6])
        return Result(ps, np.array([1, 1, 2, 2, 3]),
                      np.array([100, 200, 100, 300, 50]),
                      mafs=np.array([0.1, 0.4, 0.05, 0.3, 0.2]),
                      macs=np.array([10, 40, 5, 30, 20]),
                      additional={"betas": np.arange(5.0)})

    def test_neg_log_trans(self):
        r = self._mk().neg_log_trans()
        assert np.isclose(r.scores[0], 8.0)
        assert r.score_type == "neg_log_pvals"

    def test_top_k_and_order(self):
        top = self._mk().get_top_snps(2)
        assert list(top.positions) == [100, 50]
        assert np.isclose(top.additional["betas"][0], 0.0)

    def test_filter_attr(self):
        r = self._mk().filter_attr("mafs", min_val=0.1)
        assert len(r) == 4

    def test_region(self):
        r = self._mk().get_region_result(2, 0, 200)
        assert len(r) == 1 and r.positions[0] == 100

    def test_gene_queries(self):
        r = self._mk()
        genes = [Gene(1, 90, 110, "g1"), Gene(3, 1000, 2000, "g2")]
        hits = r.get_genes_within(genes)
        assert [g.name for g in hits] == ["g1"]
        d = r.min_distances_to_genes(genes)
        assert d[0] == 0 and d[1] == 950

    def test_write_read(self, tmp_path):
        p = tmp_path / "res.csv"
        self._mk().write_to_file(str(p))
        lines = p.read_text().strip().split("\n")
        assert len(lines) == 6
        assert lines[0].startswith("chromosomes,positions,scores")
        # first data row is the best hit
        assert lines[1].split(",")[1] == "100"


class TestParsers:
    def test_csv_roundtrip_binary(self, tmp_path):
        from mixmogam_tpu.data.genotype import GenotypeData
        from mixmogam_tpu.data.parsers import parse_snp_data
        from mixmogam_tpu.data.simulate import simulate_genotypes

        G, ch, po = simulate_genotypes(10, 30, missing_rate=0.1, seed=3)
        gd = GenotypeData(G, ch, po, [f"s{i}" for i in range(10)])
        p = tmp_path / "g.csv"
        gd.write_csv(str(p))
        gd2 = parse_snp_data(str(p), data_format="binary")
        np.testing.assert_array_equal(gd.matrix, gd2.matrix)
        assert gd.accessions == gd2.accessions

    def test_nucleotide_parsing(self, tmp_path):
        p = tmp_path / "nt.csv"
        p.write_text("Chromosome,Position,a,b,c,d\n"
                     "1,100,A,A,T,T\n"
                     "1,200,C,G,C,N\n"
                     "2,50,G,G,G,G\n")
        from mixmogam_tpu.data.parsers import parse_snp_data

        gd = parse_snp_data(str(p), data_format="nucleotides")
        assert gd.matrix.shape == (3, 4)
        assert list(gd.matrix[0]) == [0, 0, 1, 1]
        assert gd.matrix[1, 3] == -1  # N -> missing
        assert list(gd.matrix[2]) == [0, 0, 0, 0]

    def test_hdf5_dispatch(self, tmp_path):
        from mixmogam_tpu.data.genotype import GenotypeData
        from mixmogam_tpu.data.parsers import parse_snp_data
        from mixmogam_tpu.data.simulate import simulate_genotypes

        G, ch, po = simulate_genotypes(8, 20, seed=1)
        gd = GenotypeData(G, ch, po, [f"s{i}" for i in range(8)])
        p = tmp_path / "g.h5"
        gd.write_hdf5(str(p))
        gd2 = parse_snp_data(str(p))
        np.testing.assert_array_equal(gd.matrix, gd2.matrix)


class TestCaching:
    def test_kinship_cache_roundtrip(self, tmp_path):
        from mixmogam_tpu.data.genotype import GenotypeData
        from mixmogam_tpu.data.simulate import simulate_genotypes
        from mixmogam_tpu.utils.caching import cached_kinship

        G, ch, po = simulate_genotypes(20, 100, seed=5)
        gd = GenotypeData(G, ch, po, [f"s{i}" for i in range(20)])
        K1 = cached_kinship(gd, "ibs", cache_dir=str(tmp_path))
        files = os.listdir(tmp_path)
        assert any(f.startswith("kinship_") for f in files)
        K2 = cached_kinship(gd, "ibs", cache_dir=str(tmp_path))
        np.testing.assert_allclose(K1, K2, atol=1e-12)

    def test_save_load_named(self, tmp_path):
        from mixmogam_tpu.utils.caching import (load_kinship_from_file,
                                                save_kinship_to_file)

        K = np.eye(3)
        save_kinship_to_file(str(tmp_path / "k"), K, ["a", "b", "c"])
        K2, acc = load_kinship_from_file(str(tmp_path / "k"))
        np.testing.assert_array_equal(K, K2)
        assert acc == ["a", "b", "c"]


class TestEndToEnd:
    @pytest.fixture(scope="class")
    def sim_files(self, tmp_path_factory):
        tmp = tmp_path_factory.mktemp("e2e")
        from mixmogam_tpu.cli import main

        rc = main(["simulate", "-n", "80", "-m", "400", "--h2", "0.6",
                   "--n-causal", "3", "--seed", "11",
                   "-o", str(tmp / "sim")])
        assert rc == 0
        return tmp

    def test_run_gwas_emmax(self, sim_files):
        from mixmogam_tpu.api import run_gwas

        out = run_gwas(str(sim_files / "sim.genotypes.csv"),
                       str(sim_files / "sim.phenotypes.csv"),
                       method="emmax", min_mac=3,
                       out_prefix=str(sim_files / "out"))
        assert out["result"] is not None
        assert os.path.exists(sim_files / "out.pvals.csv")
        assert os.path.exists(sim_files / "out.manhattan.png")
        assert os.path.exists(sim_files / "out.qq.png")
        with open(sim_files / "out.summary.json") as f:
            s = json.load(f)
        assert 0 <= s["pseudo_heritability"] <= 1
        assert s["n_samples"] == 80

    def test_cli_run_lm(self, sim_files, capsys):
        from mixmogam_tpu.cli import main

        rc = main(["run", str(sim_files / "sim.genotypes.csv"),
                   str(sim_files / "sim.phenotypes.csv"),
                   "--method", "lm", "--min-mac", "3", "--no-plots",
                   "-o", str(sim_files / "lmout")])
        assert rc == 0
        assert "min p" in capsys.readouterr().out

    def test_cli_run_emmax_precision_tier(self, sim_files, capsys):
        """--precision high routes matmul_precision to the scan (on CPU
        x64 this is numerically identical to exact; the flag wiring and
        the full pipeline are what's under test)."""
        from mixmogam_tpu.cli import main

        rc = main(["run", str(sim_files / "sim.genotypes.csv"),
                   str(sim_files / "sim.phenotypes.csv"),
                   "--method", "emmax", "--min-mac", "3", "--no-plots",
                   "--precision", "high",
                   "-o", str(sim_files / "hiout")])
        assert rc == 0
        assert "min p" in capsys.readouterr().out

    def test_cli_kinship(self, sim_files, capsys):
        from mixmogam_tpu.cli import main

        rc = main(["kinship", str(sim_files / "sim.genotypes.csv"),
                   "-o", str(sim_files / "K.npz")])
        assert rc == 0
        assert os.path.exists(sim_files / "K.npz")

    def test_run_gwas_with_covariates(self, sim_files, tmp_path):
        """A second phenotype column can enter as a fixed-effect
        covariate; its own SNP associations should be absorbed."""
        import numpy as np

        from mixmogam_tpu.api import parse_phenotype_file, run_gwas

        # rewrite the phenotype file with an extra covariate column
        phend = parse_phenotype_file(str(sim_files / "sim.phenotypes.csv"))
        rng = np.random.default_rng(0)
        ecos = phend.get_ecotypes(1)
        phend.add_phenotype(2, "covariate", ecos,
                            list(rng.normal(size=len(ecos))))
        pfile = str(tmp_path / "phen2.csv")
        phend.write_to_file(pfile)
        out = run_gwas(str(sim_files / "sim.genotypes.csv"), pfile,
                       pid=1, covariate_pids=[2], method="lm",
                       min_mac=3, plots=False)
        out0 = run_gwas(str(sim_files / "sim.genotypes.csv"), pfile,
                        pid=1, method="lm", min_mac=3, plots=False)
        # same SNP count, slightly different ps (one extra dof consumed)
        assert len(out["scan"]["ps"]) == len(out0["scan"]["ps"])
        assert out["scan"]["dof"] == out0["scan"]["dof"] - 1

    def test_run_gwas_emma(self, sim_files):
        from mixmogam_tpu.api import run_gwas

        out = run_gwas(str(sim_files / "sim.genotypes.csv"),
                       str(sim_files / "sim.phenotypes.csv"),
                       method="emma", min_mac=3, plots=False,
                       tile=256)
        assert out["scan"]["ps"] is not None
        assert "deltas" in out["scan"]

    def test_phenotype_hdf5_roundtrip(self, tmp_path):
        from mixmogam_tpu.data.phenotype import PhenotypeData

        pd = PhenotypeData.from_arrays(1, "t1", ["a", "b", "c"],
                                       [1.0, 2.0, 3.0])
        pd.add_phenotype(2, "t2", ["a", "b"], [5.0, 6.0])
        p = str(tmp_path / "ph.h5")
        pd.write_hdf5(p)
        pd2 = PhenotypeData.read_hdf5(p)
        assert pd2.phenotype_ids() == [1, 2]
        np.testing.assert_allclose(pd2.get_values(1), [1.0, 2.0, 3.0])
        assert pd2.get_name(2) == "t2"

    def test_transform_most_normal(self, sim_files):
        from mixmogam_tpu.api import run_gwas

        out = run_gwas(str(sim_files / "sim.genotypes.csv"),
                       str(sim_files / "sim.phenotypes.csv"),
                       method="lm", transform="most_normal", min_mac=3,
                       plots=False)
        assert out["scan"]["ps"] is not None
