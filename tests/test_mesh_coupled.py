"""Coupled types 1-5 and ragged PARAFAC2 under a real device mesh.

Every test runs the identical fit twice — plain single-device vs
fit(mesh=) with the framework's sharding layout on the 8-device virtual
mesh — and asserts numeric equality of the factor trajectory.  This pins
the coupled-Delta solves (normal equations, Sylvester, kron-vectorized
and two-sided variants, cmtf_fun_AOADMM.m:625-1075) and the size-bucketed
ragged slice prox (cmtf_fun_AOADMM.m:567-578) under sharding, which the
single-device tests cannot witness.
"""
import numpy as np
import pytest

import jax

from matlab_code_tpu import (
    ProblemSpec, DatasetSpec, CouplingSpec, ConstraintSpec, AlgOptions,
    InitOptions)
from matlab_code_tpu.models.init import init_coupled
from matlab_code_tpu.models.solver import fit
from matlab_code_tpu.parallel.sharding import (
    make_mesh, data_shardings, state_shardings, choose_cp_shard_mode)
from matlab_code_tpu.utils.datagen import create_coupled_data, normalize_data

N_DEV = 8
OPTS = AlgOptions(MaxOuterIters=20, AbsFuncTol=0.0, OuterRelTol=0.0)


def _mesh_vs_plain(spec, data, state0, opts=OPTS, require_sharded=True,
                   traj_rtol=1e-11, fac_rtol=1e-8, fac_atol=1e-10):
    st_ref, out_ref = fit(spec, data, state0, opts)
    mesh = make_mesh(N_DEV)
    data_sh, sharded_modes = data_shardings(spec, data, mesh)
    if require_sharded:
        assert sharded_modes, "config must actually shard something"
    st_sh, out_sh = fit(spec, jax.device_put(data, data_sh),
                        jax.device_put(state0,
                                       state_shardings(spec, state0, mesh,
                                                       sharded_modes)),
                        opts, mesh=mesh)
    np.testing.assert_allclose(np.asarray(out_sh.func_val_conv),
                               np.asarray(out_ref.func_val_conv),
                               rtol=traj_rtol, atol=1e-13)
    for m in range(spec.nb_modes):
        np.testing.assert_allclose(np.asarray(st_sh.fac[m]),
                                   np.asarray(st_ref.fac[m]),
                                   rtol=fac_rtol, atol=fac_atol)
    for c, d in enumerate(st_ref.coupling_fac):
        if d is not None:
            np.testing.assert_allclose(np.asarray(st_sh.coupling_fac[c]),
                                       np.asarray(d), rtol=1e-8, atol=1e-10)
    return st_sh, out_sh


def _build(spec, lambdas, distr, coupl_trafo=None, coupl_trafo2=None,
           key=1, data_rng=7, delta_shapes=None, bk_style="orth"):
    data, _, _, _ = create_coupled_data(
        spec, lambdas=lambdas, noise=0.02, distr=distr,
        coupl_trafo=coupl_trafo, coupl_trafo2=coupl_trafo2, rng=data_rng,
        bk_style=bk_style)
    data, _ = normalize_data(spec, data)
    init = InitOptions(distr=tuple(distr), normalize=True,
                       lambdas_init=tuple(tuple(l) for l in lambdas))
    state0 = init_coupled(spec, data, init, key=key,
                          delta_shapes=delta_shapes)
    return data, state0


def test_mesh_type4_selector_flagship():
    """The bench flagship shape (bench.py:54-89): three CP datasets sharing
    the sample mode through a TYPE-4 selector coupling C_i = Delta H_i, all
    nonneg — the normal-equation Delta solve (cmtf_fun_AOADMM.m:904-983)
    under mode-sharded MTTKRPs."""
    NN = ConstraintSpec("non-negativity")
    R1, R2, R3, RTOT = 3, 3, 2, 4
    spec = ProblemSpec(
        mode_sizes=(12, 16, 9, 12, 24, 5, 12, 32),
        datasets=(
            DatasetSpec(model="CP", modes=(0, 1, 2), rank=R1, weight=1 / 3),
            DatasetSpec(model="CP", modes=(3, 4, 5), rank=R2, weight=1 / 3),
            DatasetSpec(model="CP", modes=(6, 7), rank=R3, weight=1 / 3)),
        coupling=CouplingSpec(lin_coupled_modes=(1, 0, 0, 1, 0, 0, 1, 0),
                              coupling_type=(4,)),
        constraints=(NN,) * 8)
    H1 = np.eye(RTOT, R1)
    H2 = np.zeros((RTOT, R2))
    H2[[1, 2, 3], [0, 1, 2]] = 1.0
    H3 = np.eye(RTOT, R3)
    trafo = [H1, None, None, H2, None, None, H3, None]
    data, state0 = _build(spec, lambdas=[[1] * R1, [1] * R2, [1] * R3],
                          distr=["rand"] * 8, coupl_trafo=trafo, key=2)
    # every dataset's longest mode is 8-divisible -> all three shard
    for p in range(3):
        assert choose_cp_shard_mode(spec, p, N_DEV) is not None
    _mesh_vs_plain(spec, data, state0)


def test_mesh_type1_sylvester():
    """Type-1 H C = Delta (double-sampling-rate, script-5 style): the
    Sylvester factor solve (cmtf_fun_AOADMM.m:698-769) under sharding."""
    n1, n2 = 16, 8
    H_a = np.zeros((n2, n1))
    H_a[np.arange(n2), 2 * np.arange(n2)] = 1.0
    H_b = np.eye(n2)
    spec = ProblemSpec(
        mode_sizes=(n1, 24, 9, n2, 7),
        datasets=(DatasetSpec(model="CP", modes=(0, 1, 2), rank=2,
                              weight=0.5),
                  DatasetSpec(model="CP", modes=(3, 4), rank=2, weight=0.5)),
        coupling=CouplingSpec(lin_coupled_modes=(1, 0, 0, 1, 0),
                              coupling_type=(1,)),
        constraints=(None,) * 5)
    data, state0 = _build(spec, lambdas=[[1, 1], [1, 1]],
                          distr=["rand", "randn", "randn", "rand", "randn"],
                          coupl_trafo=[H_a, None, None, H_b, None])
    _mesh_vs_plain(spec, data, state0)


def test_mesh_type2_CH_eq_Delta():
    rng = np.random.default_rng(5)
    H_a = rng.standard_normal((3, 3)) + 2 * np.eye(3)
    H_b = rng.standard_normal((3, 3)) + 2 * np.eye(3)
    spec = ProblemSpec(
        mode_sizes=(10, 16, 9, 10, 8),
        datasets=(DatasetSpec(model="CP", modes=(0, 1, 2), rank=3,
                              weight=0.5),
                  DatasetSpec(model="CP", modes=(3, 4), rank=3, weight=0.5)),
        coupling=CouplingSpec(lin_coupled_modes=(1, 0, 0, 1, 0),
                              coupling_type=(2,)),
        constraints=(None,) * 5)
    data, state0 = _build(spec, lambdas=[[1] * 3] * 2, distr=["randn"] * 5,
                          coupl_trafo=[H_a, None, None, H_b, None])
    _mesh_vs_plain(spec, data, state0)


def test_mesh_type3_C_eq_HDelta():
    rng = np.random.default_rng(6)
    H_a = rng.standard_normal((12, 6))
    H_b = rng.standard_normal((12, 6))
    spec = ProblemSpec(
        mode_sizes=(12, 16, 9, 12, 8),
        datasets=(DatasetSpec(model="CP", modes=(0, 1, 2), rank=2,
                              weight=0.5),
                  DatasetSpec(model="CP", modes=(3, 4), rank=2, weight=0.5)),
        coupling=CouplingSpec(lin_coupled_modes=(1, 0, 0, 1, 0),
                              coupling_type=(3,)),
        constraints=(None,) * 5)
    data, state0 = _build(spec, lambdas=[[1, 1], [1, 1]],
                          distr=["randn"] * 5,
                          coupl_trafo=[H_a, None, None, H_b, None])
    _mesh_vs_plain(spec, data, state0)


def test_mesh_type5_two_sided():
    """Type-5 H1 C = Delta H2 (script-13 style) incl. the case-5
    leftover-rho quirk (cmtf_fun_AOADMM.m:1026-1054) under sharding."""
    R1, R2 = 3, 2
    n1, n2 = 10, 20
    H1_a = np.eye(n1)
    H1_b = np.zeros((n1, n2))
    H1_b[np.arange(n1), 2 * np.arange(n1)] = 1.0
    H2_a = np.eye(R1)
    H2_b = np.vstack([np.eye(R2), np.zeros((1, R2))])
    spec = ProblemSpec(
        mode_sizes=(n1, 16, 9, n2, 8, 6),
        datasets=(DatasetSpec(model="CP", modes=(0, 1, 2), rank=R1,
                              weight=0.5),
                  DatasetSpec(model="CP", modes=(3, 4, 5), rank=R2,
                              weight=0.5)),
        coupling=CouplingSpec(lin_coupled_modes=(1, 0, 0, 1, 0, 0),
                              coupling_type=(5,)),
        constraints=(None,) * 6)
    data, state0 = _build(
        spec, lambdas=[[1] * R1, [1] * R2], distr=["rand"] * 6,
        coupl_trafo=[H1_a, None, None, H1_b, None, None],
        coupl_trafo2=[H2_a, None, None, H2_b, None, None],
        delta_shapes={1: (n1, R1)})
    _mesh_vs_plain(spec, data, state0)


def test_mesh_ragged_parafac2_bucketed_prox():
    """Script-4-style ragged PARAFAC2 (sizes 61..120 scaled down), K-sharded
    over the mesh, with a slice-wise nonneg Bk constraint so the
    size-bucketed ragged prox (models/admm.py::prox_slicewise_ragged)
    runs on K-sharded state."""
    sizes = (13, 17, 11, 19, 15, 13, 17, 11)  # K=8, three buckets
    K = len(sizes)
    spec = ProblemSpec(
        mode_sizes=(12, sizes, K),
        datasets=(DatasetSpec(model="PAR2", modes=(0, 1, 2), rank=3),),
        coupling=CouplingSpec(lin_coupled_modes=(0, 0, 0), coupling_type=()),
        constraints=(ConstraintSpec("non-negativity"),
                     ConstraintSpec("non-negativity"),
                     ConstraintSpec("non-negativity")))
    data, state0 = _build(spec, lambdas=[[1, 1, 1]],
                          distr=["rand", "rand", "rand+0.1"],
                          bk_style="orth", key=1)
    # This config is intrinsically ill-conditioned in the Bk direction: a
    # 1e-15 perturbation of mu_DeltaB on the PLAIN single-device fit drifts
    # Bk by 1.8e-6 abs and the trajectory by 6.7e-10 rel after 20x5 ADMM
    # iterations (the polar P_k SVD amplifies last-ulp differences), so
    # these tolerances are the tightest any reproduction can meet.
    st_sh, _ = _mesh_vs_plain(spec, data, state0, traj_rtol=1e-8,
                              fac_atol=1e-4)
    # padded rows stayed exactly zero through the sharded bucketed prox
    Bk = np.asarray(st_sh.fac[1])
    for k, J in enumerate(sizes):
        np.testing.assert_allclose(Bk[k, J:, :], 0.0, atol=0.0)


def test_mesh_ragged_parafac2_coupled_A():
    """Ragged PARAFAC2 exact-coupled (type 0) on mode A with a CP dataset —
    couples the K-sharded PAR2 path with a mode-sharded CP MTTKRP in one
    program (script-1 flagship structure, ragged variant)."""
    sizes = (13, 17, 11, 19, 15, 13, 17, 11)
    K = len(sizes)
    spec = ProblemSpec(
        mode_sizes=(12, 16, 9, 12, sizes, K),
        datasets=(DatasetSpec(model="CP", modes=(0, 1, 2), rank=3,
                              weight=0.5),
                  DatasetSpec(model="PAR2", modes=(3, 4, 5), rank=3,
                              weight=0.5)),
        coupling=CouplingSpec(lin_coupled_modes=(1, 0, 0, 1, 0, 0),
                              coupling_type=(0,)),
        constraints=(ConstraintSpec("non-negativity"), None, None,
                     ConstraintSpec("non-negativity"), None,
                     ConstraintSpec("non-negativity")))
    data, state0 = _build(
        spec, lambdas=[[1, 1, 1], [1, 1, 1]],
        distr=["rand", "randn", "randn", "rand", "rand", "rand+0.1"],
        bk_style="orth", key=1)
    _mesh_vs_plain(spec, data, state0)


def test_mesh_em_missing_data():
    """EM imputation (cmtf_fun_AOADMM.m:408-441) under sharding: the
    imputation WRITES the model into the sharded data tensor every outer
    iteration — fit(mesh=) must reproduce the plain trajectory including
    the f_rel_missing stream."""
    import dataclasses
    spec = ProblemSpec(
        mode_sizes=(12, 16, 9, 12, 8),
        datasets=(DatasetSpec(model="CP", modes=(0, 1, 2), rank=2,
                              weight=0.5),
                  DatasetSpec(model="CP", modes=(3, 4), rank=2, weight=0.5)),
        coupling=CouplingSpec(lin_coupled_modes=(1, 0, 0, 1, 0),
                              coupling_type=(0,)),
        constraints=(ConstraintSpec("non-negativity"), None, None,
                     ConstraintSpec("non-negativity"), None))
    data, state0 = _build(spec, lambdas=[[1, 1], [1, 1]],
                          distr=["rand", "randn", "randn", "rand", "randn"])
    rng = np.random.default_rng(3)
    miss = tuple(jax.numpy.asarray(
        rng.uniform(size=np.asarray(data.objects[p]).shape) > 0.2)
        for p in range(2))                       # True = observed
    data = dataclasses.replace(data, miss=miss)

    st_ref, out_ref = fit(spec, data, state0, OPTS)
    mesh = make_mesh(N_DEV)
    data_sh, sharded_modes = data_shardings(spec, data, mesh)
    st_sh, out_sh = fit(spec, jax.device_put(data, data_sh),
                        jax.device_put(state0,
                                       state_shardings(spec, state0, mesh,
                                                       sharded_modes)),
                        OPTS, mesh=mesh)
    np.testing.assert_allclose(np.asarray(out_sh.func_val_conv),
                               np.asarray(out_ref.func_val_conv),
                               rtol=1e-10, atol=1e-13)
    np.testing.assert_allclose(float(out_sh.f_rel_missing),
                               float(out_ref.f_rel_missing),
                               rtol=1e-9, atol=1e-12)
    for m in range(spec.nb_modes):
        np.testing.assert_allclose(np.asarray(st_sh.fac[m]),
                                   np.asarray(st_ref.fac[m]),
                                   rtol=1e-8, atol=1e-10)


def test_mesh_kl_lbfgsb():
    """KL loss under sharding: the L-BFGS-B inner solver's full-model
    evaluation + gradient MTTKRP (compute_gen_f_g, cmtf_fun_AOADMM.m:
    1365-1418) over a mode-sharded data tensor must reproduce the plain
    trajectory."""
    spec = ProblemSpec(
        mode_sizes=(10, 16, 9),
        datasets=(DatasetSpec(model="CP", modes=(0, 1, 2), rank=2,
                              loss="KL"),),
        coupling=CouplingSpec(lin_coupled_modes=(0, 0, 0), coupling_type=()),
        constraints=(ConstraintSpec("non-negativity"),
                     ConstraintSpec("non-negativity"),
                     ConstraintSpec("non-negativity")))
    data, _, _, _ = create_coupled_data(
        spec, lambdas=[[25, 25]], noise=0.0, distr=["rand"] * 3, rng=6)
    init = InitOptions(distr=("rand",) * 3, normalize=False,
                       lambdas_init=((1, 1),))
    state0 = init_coupled(spec, data, init, key=5)
    opts = AlgOptions(MaxOuterIters=8, AbsFuncTol=0.0, OuterRelTol=0.0)
    st_ref, out_ref = fit(spec, data, state0, opts)
    mesh = make_mesh(N_DEV)
    data_sh, sharded_modes = data_shardings(spec, data, mesh)
    st_sh, out_sh = fit(spec, jax.device_put(data, data_sh),
                        jax.device_put(state0,
                                       state_shardings(spec, state0, mesh,
                                                       sharded_modes)),
                        opts, mesh=mesh)
    np.testing.assert_allclose(np.asarray(out_sh.func_val_conv),
                               np.asarray(out_ref.func_val_conv),
                               rtol=1e-9, atol=1e-12)
    for m in range(3):
        np.testing.assert_allclose(np.asarray(st_sh.fac[m]),
                                   np.asarray(st_ref.fac[m]),
                                   rtol=1e-7, atol=1e-9)


def test_mesh_multistart_start_sharded():
    """fit_multistart(mesh=) shards the START axis over the devices
    ('one init per device group', SURVEY §2.3) and reproduces the
    unsharded vmapped run's numbers exactly (start lanes never interact)."""
    from matlab_code_tpu.models.multistart import fit_multistart
    spec = ProblemSpec(
        mode_sizes=(10, 12, 9),
        datasets=(DatasetSpec(model="CP", modes=(0, 1, 2), rank=2),),
        coupling=CouplingSpec(lin_coupled_modes=(0, 0, 0), coupling_type=()),
        constraints=(ConstraintSpec("non-negativity"), None, None))
    data, _ = _build(spec, lambdas=[[1, 1]],
                     distr=["rand", "randn", "randn"])
    init = InitOptions(distr=("rand", "randn", "randn"), normalize=True,
                       lambdas_init=((1, 1),))
    opts = AlgOptions(MaxOuterIters=60, AbsFuncTol=1e-10, OuterRelTol=1e-9)
    st_ref, out_ref, finals_ref, stops_ref = fit_multistart(
        spec, data, opts, init, n_starts=8, keys=list(range(8)))
    st_sh, out_sh, finals_sh, stops_sh = fit_multistart(
        spec, data, opts, init, n_starts=8, keys=list(range(8)),
        mesh=make_mesh(N_DEV))
    np.testing.assert_allclose(finals_sh, finals_ref, rtol=1e-10, atol=1e-13)
    assert stops_sh == stops_ref
    np.testing.assert_allclose(np.asarray(out_sh.func_val_conv),
                               np.asarray(out_ref.func_val_conv),
                               rtol=1e-10, atol=1e-13)
    for m in range(3):
        np.testing.assert_allclose(np.asarray(st_sh.fac[m]),
                                   np.asarray(st_ref.fac[m]),
                                   rtol=1e-9, atol=1e-11)
    import pytest
    with pytest.raises(ValueError, match="divisible"):
        fit_multistart(spec, data, opts, init, n_starts=6,
                       keys=list(range(6)), mesh=make_mesh(N_DEV))
