"""Plot rendering smoke tests (reference: plotResults.py roles)."""

import os

import numpy as np

from mixmogam_tpu.plotting import manhattan_plot, qq_plot
from mixmogam_tpu.results import Result


def _result(m=500, seed=0):
    rng = np.random.default_rng(seed)
    ps = rng.random(m) ** 1.5
    ps[rng.choice(m, 5, replace=False)] *= 1e-9
    chroms = np.repeat(np.arange(1, 6), m // 5)
    pos = np.concatenate([np.sort(rng.integers(1, 1_000_000, m // 5))
                          for _ in range(5)])
    return Result(ps, chroms, pos)


def test_manhattan_renders(tmp_path):
    p = str(tmp_path / "man.png")
    manhattan_plot(_result(), p, threshold=1e-5, title="test")
    assert os.path.getsize(p) > 5000


def test_manhattan_from_neg_log(tmp_path):
    r = _result().neg_log_trans()
    p = str(tmp_path / "man2.png")
    manhattan_plot(r, p)
    assert os.path.exists(p)


def test_qq_from_result_and_array(tmp_path):
    r = _result()
    qq_plot(r, str(tmp_path / "qq1.png"))
    qq_plot(r.scores, str(tmp_path / "qq2.png"), with_confidence=False)
    assert os.path.getsize(tmp_path / "qq1.png") > 5000


def test_manhattan_subsamples_large(tmp_path):
    rng = np.random.default_rng(1)
    m = 30_000
    r = Result(rng.random(m), np.ones(m, dtype=int),
               np.sort(rng.integers(1, 10_000_000, m)))
    manhattan_plot(r, str(tmp_path / "man3.png"), max_points=5_000)
    assert os.path.exists(tmp_path / "man3.png")
