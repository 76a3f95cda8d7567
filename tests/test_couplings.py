"""Coupled-dataset fits over all six coupling types — small analogues of
example scripts 1/3/5/6/13/14 (CP/matrix only; PARAFAC2 coupling in
test_parafac2.py)."""
import numpy as np
import pytest

from matlab_code_tpu import (
    ProblemSpec, DatasetSpec, CouplingSpec, ConstraintSpec, AlgOptions)
from tests.helpers import run_problem, cp_fms


OPTS = AlgOptions(MaxOuterIters=3000, AbsFuncTol=1e-10, OuterRelTol=1e-10)


def test_type0_exact_coupling_cp_matrix():
    # 3-way CP (modes 0,1,2) + matrix (modes 3,4), modes 0 & 3 exactly coupled
    spec = ProblemSpec(
        mode_sizes=(12, 13, 14, 12, 15),
        datasets=(DatasetSpec(model="CP", modes=(0, 1, 2), rank=3, weight=0.5),
                  DatasetSpec(model="CP", modes=(3, 4), rank=3, weight=0.5)),
        coupling=CouplingSpec(lin_coupled_modes=(1, 0, 0, 1, 0),
                              coupling_type=(0,)),
        constraints=(ConstraintSpec("non-negativity"), None, None,
                     ConstraintSpec("non-negativity"), None))
    res = run_problem(spec, lambdas=[[1, 1, 1], [1, 1, 1]],
                      distr=["rand", "randn", "randn", "rand", "randn"],
                      opts=OPTS)
    assert res["out"].f_tensors < 1e-8
    assert res["out"].f_couplings < 1e-4
    assert cp_fms(res, 0, spec, (0, 1, 2)) > 0.99
    assert cp_fms(res, 1, spec, (3, 4)) > 0.99
    # coupled factors actually agree
    np.testing.assert_allclose(res["state"].fac[0], res["state"].fac[3],
                               atol=1e-3)


def test_type1_HC_eq_Delta():
    # double-sampling-rate coupling like script 5: H picks every 2nd row
    n1, n2 = 20, 10
    H_a = np.zeros((n2, n1))
    for i in range(n2):
        H_a[i, 2 * i] = 1.0
    H_b = np.eye(n2)
    spec = ProblemSpec(
        mode_sizes=(n1, 8, 9, n2, 7),
        datasets=(DatasetSpec(model="CP", modes=(0, 1, 2), rank=2, weight=0.5),
                  DatasetSpec(model="CP", modes=(3, 4), rank=2, weight=0.5)),
        coupling=CouplingSpec(lin_coupled_modes=(1, 0, 0, 1, 0),
                              coupling_type=(1,)),
        constraints=(None,) * 5)
    trafo = [H_a, None, None, H_b, None]
    res = run_problem(spec, lambdas=[[1, 1], [1, 1]],
                      distr=["rand", "randn", "randn", "rand", "randn"],
                      coupl_trafo=trafo, opts=OPTS)
    assert res["out"].f_tensors < 1e-8
    assert res["out"].f_couplings < 1e-4
    assert cp_fms(res, 0, spec, (0, 1, 2)) > 0.99


def test_type2_CH_eq_Delta():
    spec = ProblemSpec(
        mode_sizes=(10, 8, 9, 10, 7),
        datasets=(DatasetSpec(model="CP", modes=(0, 1, 2), rank=3, weight=0.5),
                  DatasetSpec(model="CP", modes=(3, 4), rank=3, weight=0.5)),
        coupling=CouplingSpec(lin_coupled_modes=(1, 0, 0, 1, 0),
                              coupling_type=(2,)),
        constraints=(None,) * 5)
    # H must be R x (<=R); square invertible keeps the true factors full rank
    # (a wide-null H makes the truth rank-deficient and the ALS solve singular
    # -> 'illconditioned lin system' exit, same as the reference's
    # nearlySingularMatrix error path)
    rng = np.random.default_rng(5)
    H_a = rng.standard_normal((3, 3)) + 2 * np.eye(3)
    H_b = rng.standard_normal((3, 3)) + 2 * np.eye(3)
    res = run_problem(spec, lambdas=[[1, 1, 1], [1, 1, 1]],
                      distr=["randn"] * 5,
                      coupl_trafo=[H_a, None, None, H_b, None], opts=OPTS)
    assert res["out"].f_tensors < 1e-8
    assert res["out"].f_couplings < 1e-4


def test_type3_C_eq_HDelta():
    # partial coupling: shared latent Delta, selector H
    spec = ProblemSpec(
        mode_sizes=(12, 8, 9, 12, 7),
        datasets=(DatasetSpec(model="CP", modes=(0, 1, 2), rank=2, weight=0.5),
                  DatasetSpec(model="CP", modes=(3, 4), rank=2, weight=0.5)),
        coupling=CouplingSpec(lin_coupled_modes=(1, 0, 0, 1, 0),
                              coupling_type=(3,)),
        constraints=(None,) * 5)
    rng = np.random.default_rng(6)
    H_a = rng.standard_normal((12, 6))
    H_b = rng.standard_normal((12, 6))
    res = run_problem(spec, lambdas=[[1, 1], [1, 1]], distr=["randn"] * 5,
                      coupl_trafo=[H_a, None, None, H_b, None], opts=OPTS)
    assert res["out"].f_tensors < 1e-8
    assert res["out"].f_couplings < 1e-4


def test_type4_C_eq_DeltaH_partial():
    # script-3 style: H = [I; 0] selector -> first components shared
    R1, R2 = 3, 2
    spec = ProblemSpec(
        mode_sizes=(11, 8, 9, 11, 7),
        datasets=(DatasetSpec(model="CP", modes=(0, 1, 2), rank=R1, weight=0.5),
                  DatasetSpec(model="CP", modes=(3, 4), rank=R2, weight=0.5)),
        coupling=CouplingSpec(lin_coupled_modes=(1, 0, 0, 1, 0),
                              coupling_type=(4,)),
        constraints=(ConstraintSpec("non-negativity"), None, None,
                     ConstraintSpec("non-negativity"), None))
    # Delta (11, 3); H_a = eye(3) -> dataset1 uses all 3; H_b = [I2; 0] cols
    H_a = np.eye(3, R1)
    H_b = np.vstack([np.eye(R2), np.zeros((1, R2))])
    res = run_problem(spec, lambdas=[[1] * R1, [1] * R2],
                      distr=["rand", "randn", "randn", "rand", "randn"],
                      coupl_trafo=[H_a, None, None, H_b, None], opts=OPTS,
                      key=2)  # keys 1/3 hit genuine AO local minima
    assert res["out"].f_tensors < 1e-8
    assert res["out"].f_couplings < 1e-4
    assert cp_fms(res, 0, spec, (0, 1, 2)) > 0.98


def test_type5_H1C_eq_DeltaH2():
    # script-13 style shared-subspace coupling, ranks 3 / 2
    R1, R2 = 3, 2
    n1, n2 = 10, 20
    H1_a = np.eye(n1)
    H1_b = np.zeros((n1, n2))
    for i in range(n1):
        H1_b[i, 2 * i] = 1.0
    H2_a = np.eye(R1)
    H2_b = np.vstack([np.eye(R2), np.zeros((1, R2))])
    spec = ProblemSpec(
        mode_sizes=(n1, 8, 9, n2, 7, 6),
        datasets=(DatasetSpec(model="CP", modes=(0, 1, 2), rank=R1, weight=0.5),
                  DatasetSpec(model="CP", modes=(3, 4, 5), rank=R2, weight=0.5)),
        coupling=CouplingSpec(lin_coupled_modes=(1, 0, 0, 1, 0, 0),
                              coupling_type=(5,)),
        constraints=(None,) * 6)
    res = run_problem(spec, lambdas=[[1] * R1, [1] * R2], distr=["rand"] * 6,
                      coupl_trafo=[H1_a, None, None, H1_b, None, None],
                      coupl_trafo2=[H2_a, None, None, H2_b, None, None],
                      opts=OPTS, delta_shapes={1: (n1, R1)})
    assert res["out"].f_tensors < 1e-8
    assert res["out"].f_couplings < 1e-3


def test_three_datasets_two_couplings():
    # script-6 style: three datasets, two independent couplings
    spec = ProblemSpec(
        mode_sizes=(10, 8, 10, 9, 9, 7),
        datasets=(DatasetSpec(model="CP", modes=(0, 1), rank=2, weight=1 / 3),
                  DatasetSpec(model="CP", modes=(2, 3), rank=2, weight=1 / 3),
                  DatasetSpec(model="CP", modes=(4, 5), rank=2, weight=1 / 3)),
        coupling=CouplingSpec(lin_coupled_modes=(1, 0, 1, 2, 2, 0),
                              coupling_type=(0, 0)),
        constraints=(None,) * 6)
    res = run_problem(spec, lambdas=[[1, 1]] * 3, distr=["rand"] * 6,
                      opts=OPTS)
    assert res["out"].f_tensors < 1e-8
    assert res["out"].f_couplings < 1e-4
