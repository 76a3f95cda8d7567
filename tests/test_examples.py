"""Run every example-script port in its reduced ('small') configuration and
check the reference's qualitative outcomes (Fit% / FMS recovery) — the
example-scripts-as-integration-tests strategy of the reference (SURVEY.md §4)."""
import importlib
import sys

import numpy as np
import pytest

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from examples.common import run


def _run(name, **kw):
    mod = importlib.import_module(f"examples.{name}")
    cfg = mod.build(small=True)
    cfg.update(kw)
    return cfg, run(**cfg, verbose=False)


def test_script01():
    cfg, res = _run("script01_cp_par2_nonneg")
    fit, fms_cp = res["report"][0]
    assert fit > 99.9 and fms_cp > 0.99
    fitp, sA, sB, sC = res["report"][1]
    assert fitp > 99.9 and sA > 0.99 and sC > 0.99


def test_script01a():
    cfg, res = _run("script01a_cp_par2_smooth_l2ball")
    fit, fms_cp = res["report"][0]
    assert fit > 99.0
    assert fms_cp > 0.99          # CP factors recovered under the l2-ball
    # the eta=1 GL-smoothness regularizer on Bk intentionally trades fit for
    # smoothness at these (normalized) data scales
    fitp, sA, sB, sC = res["report"][1]
    assert fitp > 90.0
    assert sA > 0.99              # coupled A mode fully recovered
    assert sC > 0.9               # nonneg-l2-ball C mode recovered
    assert sB > 0.7               # Bk biased by the smoothness penalty


def test_script02():
    cfg, res = _run("script02_matrix_par2_nonneg")
    assert res["report"][0][0] > 99.9
    assert res["report"][1][0] > 99.9


def test_script03():
    cfg, res = _run("script03_matrix_cp_partialcoupling")
    fit1, fms1 = res["report"][0]
    fit2, fms2 = res["report"][1]
    assert fit1 > 99.0 and fit2 > 99.0
    assert fms1 > 0.99            # 3-way CP factors recovered
    assert fms2 > 0.85            # matrix factors (non-convex l2-sphere mode)


def test_script04():
    cfg, res = _run("script04_irregular_par2")
    fitp, sA, sB, sC = res["report"][0]
    assert fitp > 99.9 and sB > 0.98


def test_script05():
    cfg, res = _run("script05_cp_cp_doublesampling_simplex")
    assert res["report"][0][0] > 99.0
    assert res["report"][1][0] > 99.0
    # simplex constraint satisfied on mode 5's auxiliary
    Z = np.asarray(res["state"].constraint_fac[5])
    np.testing.assert_allclose(Z.sum(axis=0), 1.0, atol=1e-6)
    assert Z.min() >= -1e-10


def test_script06():
    cfg, res = _run("script06_three_datasets")
    for p in range(3):
        assert res["report"][p][0] > 99.9
        assert res["report"][p][1] > 0.99


def test_script07_kl():
    cfg, res = _run("script07_matrix_cp_kl")
    # tight recovery bound, backed by the scipy L-BFGS-B equivalence test
    # (tests/test_lbfgsb_scipy.py); observed FMS 0.999 / 0.985
    assert res["report"][0][1] > 0.99
    assert res["report"][1][1] > 0.97


def test_script08():
    cfg, res = _run("script08_regular_par2_nonneg")
    fitp, sA, sB, sC = res["report"][0]
    assert fitp > 99.9 and sA > 0.99


def test_script09():
    cfg, res = _run("script09_par2_unimodality")
    fitp = res["report"][0][0]
    assert fitp > 95.0
    # unimodality holds on the constraint auxiliary
    Z = np.asarray(res["state"].constraint_fac[1])
    for k in range(Z.shape[0]):
        for r in range(Z.shape[2]):
            col = Z[k, :, r]
            peak = int(np.argmax(col))
            assert np.all(np.diff(col[:peak + 1]) >= -1e-8)
            assert np.all(np.diff(col[peak:]) <= 1e-8)


def test_script10_tv():
    cfg, res = _run("script10_cp_tv")
    fit, fms_ = res["report"][0]
    assert fms_ > 0.98


def test_script11_tparafac2():
    cfg, res = _run("script11_tparafac2")
    fitp, sA, sB, sC = res["report"][0]
    assert fitp > 95.0 and sB > 0.95


def test_script12_em():
    cfg, res = _run("script12_cp_par2_em")
    assert res["out"].f_rel_missing < 1e-4
    # report Fit counts the zeroed-out missing entries; factor recovery is
    # the real criterion (reference checks FMS, example_script12)
    assert res["report"][0][1] > 0.99    # CP FMS
    assert res["report"][1][1] > 0.99    # PAR2 FMS_A


def test_script13_type5():
    cfg, res = _run("script13_cp_cp_type5")
    assert res["report"][0][0] > 99.0
    assert res["report"][1][0] > 99.0


def test_script14_couplC():
    cfg, res = _run("script14_cp_par2_couplC")
    assert res["report"][0][0] > 99.5
    assert res["report"][1][0] > 99.5


def test_script15_multistart():
    mod = importlib.import_module("examples.script15_realdata")
    best = mod.main(n_starts=3, small=True)
    assert np.isfinite(best["out"].f_tensors)
    for p in range(3):
        assert best["report"][p][0] > 95.0
