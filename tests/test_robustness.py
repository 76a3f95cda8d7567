"""Failure-path and reproducibility behavior."""
import numpy as np
import jax.numpy as jnp
import dataclasses

from matlab_code_tpu import (
    ProblemSpec, DatasetSpec, CouplingSpec, ConstraintSpec, AlgOptions,
    InitOptions)
from matlab_code_tpu.problem import ProblemData
from matlab_code_tpu.models.init import init_coupled
from matlab_code_tpu.models.solver import fit
from matlab_code_tpu.utils.datagen import create_coupled_data, normalize_data


def test_illconditioned_exit_flag():
    """A rank-deficient unconstrained ALS system goes singular -> the NaN
    guard stops the run with the reference's 'illconditioned lin system'
    exit (make_exit_flag.m:6-7)."""
    spec = ProblemSpec(
        mode_sizes=(8, 9, 10),
        datasets=(DatasetSpec(model="CP", modes=(0, 1, 2), rank=4),),
        coupling=CouplingSpec(lin_coupled_modes=(0, 0, 0), coupling_type=()),
        constraints=(None,) * 3)
    # rank-2 data fit with rank 4 -> grams go singular as the fit collapses
    rng = np.random.default_rng(0)
    U = [rng.standard_normal((s, 2)) for s in (8, 9, 10)]
    X = np.einsum("ir,jr,kr->ijk", *U)
    data = ProblemData(objects=(jnp.asarray(X),),
                       coupl_trafo=(None,) * 3, coupl_trafo2=(None,) * 3)
    init = InitOptions(distr=("randn",) * 3, normalize=True,
                       lambdas_init=((1,) * 4,))
    state0 = init_coupled(spec, data, init, key=0)
    opts = AlgOptions(MaxOuterIters=4000, AbsFuncTol=0.0, OuterRelTol=0.0)
    state, out = fit(spec, data, state0, opts)
    assert (out.exit_flag == "illconditioned lin system"
            or out.exit_flag == "maxIterations")
    # if it went singular, the histories before the failure are finite
    fv = out.func_val_conv
    assert np.all(np.isfinite(fv[:max(1, len(fv) - 1)]))


def test_validation_missing_nonfrobenius_rejected():
    from matlab_code_tpu import check_data_input
    spec = ProblemSpec(
        mode_sizes=(6, 7, 8),
        datasets=(DatasetSpec(model="CP", modes=(0, 1, 2), rank=2,
                              loss="KL"),),
        coupling=CouplingSpec(lin_coupled_modes=(0, 0, 0), coupling_type=()),
        constraints=(None,) * 3)
    data = ProblemData(objects=(jnp.ones((6, 7, 8)),),
                       miss=(jnp.ones((6, 7, 8), bool),),
                       coupl_trafo=(None,) * 3, coupl_trafo2=(None,) * 3)
    import pytest
    with pytest.raises(ValueError, match="Frobenius"):
        check_data_input(spec, data)


def test_validation_ragged_rowcoupled_constraint_rejected():
    from matlab_code_tpu import check_data_input
    import pytest
    spec = ProblemSpec(
        mode_sizes=(6, (5, 7), 2),
        datasets=(DatasetSpec(model="PAR2", modes=(0, 1, 2), rank=2),),
        coupling=CouplingSpec(lin_coupled_modes=(0, 0, 0), coupling_type=()),
        constraints=(None, ConstraintSpec("unimodality", (False,)), None))
    with pytest.raises(ValueError, match="ragged"):
        check_data_input(spec)
    # row-separable constraint on ragged Bk stays allowed
    ok = ProblemSpec(
        mode_sizes=(6, (5, 7), 2),
        datasets=(DatasetSpec(model="PAR2", modes=(0, 1, 2), rank=2),),
        coupling=CouplingSpec(lin_coupled_modes=(0, 0, 0), coupling_type=()),
        constraints=(None, ConstraintSpec("non-negativity"), None))
    check_data_input(ok)


def test_stepwise_reports_inner_iters():
    from matlab_code_tpu.models.solver import fit_stepwise
    spec = ProblemSpec(
        mode_sizes=(9, 10, 11),
        datasets=(DatasetSpec(model="CP", modes=(0, 1, 2), rank=2),),
        coupling=CouplingSpec(lin_coupled_modes=(0, 0, 0), coupling_type=()),
        constraints=(ConstraintSpec("non-negativity"), None, None))
    data, _, _, _ = create_coupled_data(
        spec, lambdas=[[1, 1]], noise=0.02, distr=["rand", "randn", "randn"],
        rng=2)
    data, _ = normalize_data(spec, data)
    init = InitOptions(distr=("rand", "randn", "randn"), normalize=True,
                       lambdas_init=((1, 1),))
    st0 = init_coupled(spec, data, init, key=1)
    st, out = fit_stepwise(spec, data, st0,
                           AlgOptions(MaxOuterIters=10, AbsFuncTol=0.0,
                                      OuterRelTol=0.0))
    assert out.innerIters.shape == (3, 11)
    # the constrained mode ran inner ADMM iterations
    assert out.innerIters[0, 1:].max() >= 1


def test_same_key_reproducible():
    spec = ProblemSpec(
        mode_sizes=(9, 10, 11),
        datasets=(DatasetSpec(model="CP", modes=(0, 1, 2), rank=2),),
        coupling=CouplingSpec(lin_coupled_modes=(0, 0, 0), coupling_type=()),
        constraints=(ConstraintSpec("non-negativity"), None, None))
    data, _, _, _ = create_coupled_data(
        spec, lambdas=[[1, 1]], noise=0.02, distr=["rand", "randn", "randn"],
        rng=2)
    data, _ = normalize_data(spec, data)
    init = InitOptions(distr=("rand", "randn", "randn"), normalize=True,
                       lambdas_init=((1, 1),))
    outs = []
    for _ in range(2):
        st0 = init_coupled(spec, data, init, key=42)
        st, out = fit(spec, data, st0,
                      AlgOptions(MaxOuterIters=30, AbsFuncTol=0.0,
                                 OuterRelTol=0.0))
        outs.append((np.asarray(st.fac[0]), out.func_val_conv))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    np.testing.assert_array_equal(outs[0][1], outs[1][1])
