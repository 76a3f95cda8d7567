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


def test_validation_ragged_constraints():
    from matlab_code_tpu import check_data_input
    import pytest
    # size-parameterized kinds stay rejected on ragged Bk (the reference
    # builds their operator from sz(1) only, constraints_to_prox.m:62-77)
    spec = ProblemSpec(
        mode_sizes=(6, (5, 7), 2),
        datasets=(DatasetSpec(model="PAR2", modes=(0, 1, 2), rank=2),),
        coupling=CouplingSpec(lin_coupled_modes=(0, 0, 0), coupling_type=()),
        constraints=(None, ConstraintSpec("GL smoothness", (0.1,)), None))
    with pytest.raises(ValueError, match="ragged"):
        check_data_input(spec)
    # row-coupled kinds (unimodality etc) are allowed on ragged Bk via the
    # size-bucketed slice-wise prox
    for kind, params in (("unimodality", (False,)),
                         ("simplex column-wise", (1.0,)),
                         ("TV regularization", (0.1,)),
                         ("non-negativity", ())):
        ok = ProblemSpec(
            mode_sizes=(6, (5, 7), 2),
            datasets=(DatasetSpec(model="PAR2", modes=(0, 1, 2), rank=2),),
            coupling=CouplingSpec(lin_coupled_modes=(0, 0, 0),
                                  coupling_type=()),
            constraints=(None, ConstraintSpec(kind, params), None))
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


def test_early_illcond_detection_finite():
    """A finite but numerically singular unconstrained system triggers the
    early Cholesky-rcond check (options.IllCondTol) with exit flag
    'illconditioned lin system' — BEFORE any stream goes non-finite, matching
    the intent of the reference's nearlySingularMatrix promotion
    (cmtf_fun_AOADMM.m:83-84)."""
    spec = ProblemSpec(
        mode_sizes=(8, 9),
        datasets=(DatasetSpec(model="CP", modes=(0, 1), rank=2),),
        coupling=CouplingSpec(lin_coupled_modes=(0, 0), coupling_type=()),
        constraints=(None, None))
    rng = np.random.default_rng(0)
    u, v = rng.standard_normal(8), rng.standard_normal(9)
    X = np.outer(u, v)
    data = ProblemData(objects=(jnp.asarray(X),),
                       coupl_trafo=(None,) * 2, coupl_trafo2=(None,) * 2)
    # init with two all-but-identical columns -> gram rcond ~1e-18 < eps,
    # but every solve stays finite
    w = rng.standard_normal((9, 1))
    F1 = np.concatenate([w, w * (1 + 1e-9)], axis=1)
    F0 = rng.standard_normal((8, 2))
    init = InitOptions(distr=("randn",) * 2, normalize=False,
                       lambdas_init=((1, 1),))
    state0 = init_coupled(spec, data, init, key=0)
    state0 = dataclasses.replace(
        state0, fac=(jnp.asarray(F0), jnp.asarray(F1)))
    opts = AlgOptions(MaxOuterIters=50, AbsFuncTol=0.0, OuterRelTol=0.0)
    state, out = fit(spec, data, state0, opts)
    assert out.exit_flag == "illconditioned lin system"
    assert out.OuterIterations <= 2
    assert np.all(np.isfinite(out.func_val_conv))
    # with the check disabled the same run keeps iterating
    opts_off = dataclasses.replace(opts, IllCondTol=0.0, MaxOuterIters=5)
    _, out_off = fit(spec, data, state0, opts_off)
    assert out_off.exit_flag != "illconditioned lin system"


def test_lbfgsb_max_total_its():
    """lbfgsb_options.maxTotalIts caps the cumulative evaluation budget
    (example_script7:64-69)."""
    from matlab_code_tpu.ops.lbfgsb import lbfgsb

    def rosen_vg(x):
        import jax
        f = jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1 - x[:-1]) ** 2)
        g = jax.grad(lambda y: jnp.sum(
            100.0 * (y[1:] - y[:-1] ** 2) ** 2 + (1 - y[:-1]) ** 2))(x)
        return f, g

    x0 = jnp.zeros((6,))
    full = lbfgsb(rosen_vg, x0, -jnp.inf, jnp.inf, maxiter=200, pgtol=1e-12,
                  factr=0.0)
    capped = lbfgsb(rosen_vg, x0, -jnp.inf, jnp.inf, maxiter=200, pgtol=1e-12,
                    factr=0.0, max_total_its=5)
    assert int(capped.iterations) < int(full.iterations)
    assert int(capped.iterations) <= 5


def test_adaptive_rho_nonfrob_converges():
    """The residual-balancing adaptive-rho extension (off by default) keeps
    a KL fit with a large count scale stable."""
    spec = ProblemSpec(
        mode_sizes=(8, 9, 7, 8),
        datasets=(DatasetSpec(model="CP", modes=(0, 1, 2), rank=2,
                              loss="KL", weight=0.5),
                  DatasetSpec(model="CP", modes=(3,) , rank=2, weight=0.5)),
        coupling=CouplingSpec(lin_coupled_modes=(0, 0, 0, 0),
                              coupling_type=()),
        constraints=(ConstraintSpec("non-negativity"), None, None, None))
    # single-mode second dataset is not meaningful; use a simpler spec
    spec = ProblemSpec(
        mode_sizes=(8, 9, 7),
        datasets=(DatasetSpec(model="CP", modes=(0, 1, 2), rank=2,
                              loss="KL"),),
        coupling=CouplingSpec(lin_coupled_modes=(0, 0, 0), coupling_type=()),
        constraints=(ConstraintSpec("non-negativity"),
                     ConstraintSpec("non-negativity"),
                     ConstraintSpec("non-negativity")))
    rng = np.random.default_rng(1)
    U = [rng.uniform(1, 3, size=(s, 2)) for s in (8, 9, 7)]
    M = np.einsum("ir,jr,kr->ijk", *U) * 200.0   # large count scale
    X = rng.poisson(M).astype(float)
    data = ProblemData(objects=(jnp.asarray(X),),
                       coupl_trafo=(None,) * 3, coupl_trafo2=(None,) * 3)
    init = InitOptions(distr=("rand",) * 3, normalize=False,
                       lambdas_init=((1, 1),))
    state0 = init_coupled(spec, data, init, key=3)
    opts = AlgOptions(MaxOuterIters=60, AbsFuncTol=0.0, OuterRelTol=1e-10,
                      adaptive_rho_nonfrob=True)
    state, out = fit(spec, data, state0, opts)
    assert np.all(np.isfinite(out.func_val_conv))
    # objective decreases overall
    assert out.func_val_conv[-1] < out.func_val_conv[1]


def test_fit_records_time_at_it():
    """fit() populates out.time_at_it (cmtf_fun_AOADMM.m:455,491) via
    chunked host timestamps."""
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
    opts = AlgOptions(MaxOuterIters=60, AbsFuncTol=0.0, OuterRelTol=0.0,
                      TimeAtItChunk=10)
    st, out = fit(spec, data, st0, opts)
    assert out.time_at_it is not None
    assert out.time_at_it.shape == (out.OuterIterations + 1,)
    assert out.time_at_it[0] == 0.0
    assert np.all(np.diff(out.time_at_it) >= 0)
    assert out.time_at_it[-1] <= out.time_total + 1e-6
    # chunking does not change the trajectory vs a single fused call
    opts1 = AlgOptions(MaxOuterIters=60, AbsFuncTol=0.0, OuterRelTol=0.0,
                       TimeAtItChunk=0)
    _, out1 = fit(spec, data, st0, opts1)
    np.testing.assert_array_equal(out.func_val_conv, out1.func_val_conv)
