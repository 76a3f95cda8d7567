"""Sparse (COO) CP datasets and the host-stepped fit variant."""
import numpy as np
import jax.numpy as jnp
import dataclasses
import pytest

from matlab_code_tpu import (
    ProblemSpec, DatasetSpec, CouplingSpec, ConstraintSpec, AlgOptions,
    InitOptions, check_data_input)
from matlab_code_tpu.problem import SparseTensor, ProblemData
from matlab_code_tpu.models.init import init_coupled
from matlab_code_tpu.models.solver import fit, fit_stepwise
from matlab_code_tpu.ops.tensor import mttkrp, mttkrp_sparse
from matlab_code_tpu.utils.datagen import create_coupled_data, normalize_data

rng = np.random.default_rng(9)


def test_mttkrp_sparse_matches_dense():
    X = rng.standard_normal((7, 8, 9))
    X[rng.uniform(size=X.shape) < 0.6] = 0.0
    st = SparseTensor.from_dense(X)
    facs = [jnp.asarray(rng.standard_normal((s, 3))) for s in X.shape]
    for mode in range(3):
        got = np.asarray(mttkrp_sparse(st.indices, st.values, facs, mode,
                                       X.shape[mode]))
        want = np.asarray(mttkrp(jnp.asarray(X), facs, mode))
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-10)


def _dense_problem():
    spec = ProblemSpec(
        mode_sizes=(10, 11, 12),
        datasets=(DatasetSpec(model="CP", modes=(0, 1, 2), rank=2),),
        coupling=CouplingSpec(lin_coupled_modes=(0, 0, 0), coupling_type=()),
        constraints=(ConstraintSpec("non-negativity"), None, None))
    data, _, _, _ = create_coupled_data(
        spec, lambdas=[[1, 1]], noise=0.0, distr=["rand", "randn", "randn"],
        rng=4)
    data, _ = normalize_data(spec, data)
    init = InitOptions(distr=("rand", "randn", "randn"), normalize=True,
                       lambdas_init=((1, 1),))
    return spec, data, init


def test_sparse_fit_matches_dense_fit():
    spec, data, init = _dense_problem()
    Xd = np.asarray(data.objects[0])
    sp_data = dataclasses.replace(
        data, objects=(SparseTensor.from_dense(Xd),))
    check_data_input(spec, sp_data)
    opts = AlgOptions(MaxOuterIters=40, AbsFuncTol=0.0, OuterRelTol=0.0)
    state0 = init_coupled(spec, data, init, key=3)
    s_dense, out_dense = fit(spec, data, state0, opts)
    s_sparse, out_sparse = fit(spec, sp_data, state0, opts)
    np.testing.assert_allclose(out_sparse.func_val_conv,
                               out_dense.func_val_conv, rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(np.asarray(s_sparse.fac[0]),
                               np.asarray(s_dense.fac[0]), rtol=1e-7,
                               atol=1e-10)


def test_sparse_rejects_nonfrobenius_and_missing():
    spec, data, init = _dense_problem()
    st = SparseTensor.from_dense(np.asarray(data.objects[0]))
    bad_spec = dataclasses.replace(
        spec, datasets=(dataclasses.replace(spec.datasets[0], loss="KL"),))
    with pytest.raises(ValueError, match="Frobenius"):
        check_data_input(bad_spec, dataclasses.replace(data, objects=(st,)))
    with pytest.raises(ValueError, match="Missing"):
        check_data_input(spec, dataclasses.replace(
            data, objects=(st,),
            miss=(jnp.ones((10, 11, 12), bool),)))


def test_stepwise_matches_fused_fit():
    spec, data, init = _dense_problem()
    state0 = init_coupled(spec, data, init, key=3)
    opts = AlgOptions(MaxOuterIters=25, AbsFuncTol=1e-12, OuterRelTol=1e-11)
    s1, out1 = fit(spec, data, state0, opts)
    s2, out2 = fit_stepwise(spec, data, state0, opts)
    assert out1.OuterIterations == out2.OuterIterations
    np.testing.assert_allclose(out1.func_val_conv, out2.func_val_conv,
                               rtol=1e-9, atol=1e-13)
    # stepwise records true wall times, monotone nondecreasing
    t = out2.time_at_it
    assert t is not None and len(t) == out2.OuterIterations + 1
    assert np.all(np.diff(t) >= 0)


def test_sparse_nvecs_init_matches_dense():
    """nvecs spectral init on a COO tensor (cmtf_nvecs.m:41-42 sptenmat
    path) equals the dense-path init on the densified fixture."""
    spec, data, init = _dense_problem()
    Xd = np.asarray(data.objects[0])
    sp_data = dataclasses.replace(
        data, objects=(SparseTensor.from_dense(Xd),))
    init_nv = dataclasses.replace(init, nvecs=True)
    st_dense = init_coupled(spec, data, init_nv, key=3)
    st_sparse = init_coupled(spec, sp_data, init_nv, key=3)
    for m in range(3):
        np.testing.assert_allclose(np.asarray(st_sparse.fac[m]),
                                   np.asarray(st_dense.fac[m]),
                                   rtol=1e-8, atol=1e-10)
