"""Golden-trajectory regression tests.

The reference's quality strategy is seeded runs with inspected metrics
(SURVEY.md §4); here we go further: objective-stream trajectories for pinned
configurations are recorded once (tests/golden/*.npz, regenerated with
--regen via GOLDEN_REGEN=1) and every run must reproduce them to tight
tolerance.  Any change to update order, rho heuristics, residual definitions,
or prox semantics shows up here immediately.
"""
import dataclasses
import os

import numpy as np
import jax.numpy as jnp
import pytest

from matlab_code_tpu import (
    ProblemSpec, DatasetSpec, CouplingSpec, ConstraintSpec, AlgOptions,
    InitOptions)
from matlab_code_tpu.options import LbfgsbOptions
from matlab_code_tpu.models.init import init_coupled
from matlab_code_tpu.models.solver import fit
from matlab_code_tpu.utils.datagen import create_coupled_data, normalize_data

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
REGEN = os.environ.get("GOLDEN_REGEN") == "1"


def _coupled_pair_spec(ctype, n0=10, n3=10, R=(2, 2), constraints=None):
    """3-way CP + matrix with modes 0/3 coupled at the given type."""
    return ProblemSpec(
        mode_sizes=(n0, 11, 12, n3, 13),
        datasets=(DatasetSpec(model="CP", modes=(0, 1, 2), rank=R[0],
                              weight=0.5),
                  DatasetSpec(model="CP", modes=(3, 4), rank=R[1],
                              weight=0.5)),
        coupling=CouplingSpec(lin_coupled_modes=(1, 0, 0, 1, 0),
                              coupling_type=(ctype,)),
        constraints=constraints or (None,) * 5)


def _run_config(name):
    trafo = trafo2 = None
    delta_shapes = None
    normalize = True
    init_distr = None
    opts = AlgOptions(MaxOuterIters=40, AbsFuncTol=0.0, OuterRelTol=0.0)
    post_data = None
    if name == "cp_nonneg_coupled":
        spec = ProblemSpec(
            mode_sizes=(10, 11, 12, 10, 13),
            datasets=(DatasetSpec(model="CP", modes=(0, 1, 2), rank=2,
                                  weight=0.5),
                      DatasetSpec(model="CP", modes=(3, 4), rank=2,
                                  weight=0.5)),
            coupling=CouplingSpec(lin_coupled_modes=(1, 0, 0, 1, 0),
                                  coupling_type=(0,)),
            constraints=(ConstraintSpec("non-negativity"), None, None,
                         ConstraintSpec("non-negativity"), None))
        distr = ["rand", "randn", "randn", "rand", "randn"]
        noise = 0.05
    elif name == "par2_nonneg":
        spec = ProblemSpec(
            mode_sizes=(8, (9,) * 5, 5),
            datasets=(DatasetSpec(model="PAR2", modes=(0, 1, 2), rank=2),),
            coupling=CouplingSpec(lin_coupled_modes=(0, 0, 0),
                                  coupling_type=()),
            constraints=(ConstraintSpec("non-negativity"),
                         ConstraintSpec("non-negativity"),
                         ConstraintSpec("non-negativity")))
        distr = ["rand", "rand", "rand+0.1"]
        noise = 0.05
    elif name == "cp_tv":
        spec = ProblemSpec(
            mode_sizes=(14, 10, 11),
            datasets=(DatasetSpec(model="CP", modes=(0, 1, 2), rank=2),),
            coupling=CouplingSpec(lin_coupled_modes=(0, 0, 0),
                                  coupling_type=()),
            constraints=(ConstraintSpec("TV regularization", (0.01,)),
                         ConstraintSpec("l2-ball", (1.0,)),
                         ConstraintSpec("l2-ball", (1.0,))))
        distr = ["randn", "randn", "randn"]
        noise = 0.05
    elif name == "coupled_type1":
        # double-sampling-rate H1*C1 = Delta = H2*C2 (script-5 style)
        spec = _coupled_pair_spec(1, n0=20, n3=10)
        H_a = np.zeros((10, 20))
        H_a[np.arange(10), 2 * np.arange(10)] = 1.0
        trafo = [H_a, None, None, np.eye(10), None]
        distr = ["rand", "randn", "randn", "rand", "randn"]
        noise = 0.05
    elif name == "coupled_type2":
        spec = _coupled_pair_spec(2)
        rng = np.random.default_rng(5)
        trafo = [rng.standard_normal((2, 2)) + 2 * np.eye(2), None, None,
                 rng.standard_normal((2, 2)) + 2 * np.eye(2), None]
        distr = ["randn"] * 5
        noise = 0.05
    elif name == "coupled_type3":
        spec = _coupled_pair_spec(3, n0=12, n3=12)
        rng = np.random.default_rng(6)
        trafo = [rng.standard_normal((12, 6)), None, None,
                 rng.standard_normal((12, 6)), None]
        distr = ["randn"] * 5
        noise = 0.05
    elif name == "coupled_type4":
        # script-3 style selector H = [I; 0]: first components shared
        spec = _coupled_pair_spec(
            4, n0=11, n3=11, R=(3, 2),
            constraints=(ConstraintSpec("non-negativity"), None, None,
                         ConstraintSpec("non-negativity"), None))
        trafo = [np.eye(3), None, None,
                 np.vstack([np.eye(2), np.zeros((1, 2))]), None]
        distr = ["rand", "randn", "randn", "rand", "randn"]
        noise = 0.05
    elif name == "coupled_type5":
        # script-13 style shared subspace H1*C = Delta*H2, ranks 3/2
        n0, n3 = 10, 20
        spec = ProblemSpec(
            mode_sizes=(n0, 8, 9, n3, 7, 6),
            datasets=(DatasetSpec(model="CP", modes=(0, 1, 2), rank=3,
                                  weight=0.5),
                      DatasetSpec(model="CP", modes=(3, 4, 5), rank=2,
                                  weight=0.5)),
            coupling=CouplingSpec(lin_coupled_modes=(1, 0, 0, 1, 0, 0),
                                  coupling_type=(5,)),
            constraints=(None,) * 6)
        H1_b = np.zeros((n0, n3))
        H1_b[np.arange(n0), 2 * np.arange(n0)] = 1.0
        trafo = [np.eye(n0), None, None, H1_b, None, None]
        trafo2 = [np.eye(3), None, None,
                  np.vstack([np.eye(2), np.zeros((1, 2))]), None, None]
        delta_shapes = {1: (n0, 3)}
        distr = ["rand"] * 6
        noise = 0.05
    elif name == "cp_kl":
        # script-7 style KL loss through the L-BFGS-B path
        spec = ProblemSpec(
            mode_sizes=(14, 10, 12),
            datasets=(DatasetSpec(model="CP", modes=(0, 1, 2), rank=2,
                                  loss="KL"),),
            coupling=CouplingSpec(lin_coupled_modes=(0, 0, 0),
                                  coupling_type=()),
            constraints=(None,) * 3)
        distr = [("gamma", 2.0, 3.0)] * 3
        init_distr = ["rand"] * 3
        normalize = False
        noise = 0.0
        opts = AlgOptions(MaxOuterIters=40, AbsFuncTol=0.0, OuterRelTol=0.0,
                          lbfgsb=LbfgsbOptions(m=5, maxIts=100, pgtol=1e-8))
    elif name == "cp_em_missing":
        # script-12 style EM imputation, 20% missing at random
        spec = ProblemSpec(
            mode_sizes=(12, 13, 14),
            datasets=(DatasetSpec(model="CP", modes=(0, 1, 2), rank=2),),
            coupling=CouplingSpec(lin_coupled_modes=(0, 0, 0),
                                  coupling_type=()),
            constraints=(ConstraintSpec("non-negativity"), None, None))
        distr = ["rand", "randn", "randn"]
        noise = 0.0

        def post_data(data):
            rng = np.random.default_rng(1)
            mask = rng.uniform(size=(12, 13, 14)) > 0.2
            X0 = np.asarray(data.objects[0])
            return dataclasses.replace(
                data, objects=(jnp.asarray(np.where(mask, X0, 0.0)),),
                miss=(jnp.asarray(mask),))
    elif name == "cp_sparse":
        # sparse COO dataset through the gather/segment-sum dispatch path
        spec = ProblemSpec(
            mode_sizes=(12, 13, 14),
            datasets=(DatasetSpec(model="CP", modes=(0, 1, 2), rank=2),),
            coupling=CouplingSpec(lin_coupled_modes=(0, 0, 0),
                                  coupling_type=()),
            constraints=(ConstraintSpec("non-negativity"), None, None))
        distr = ["rand", "randn", "randn"]
        noise = 0.0

        def post_data(data):
            from matlab_code_tpu.problem import SparseTensor
            rng = np.random.default_rng(2)
            X0 = np.array(data.objects[0])
            X0[rng.uniform(size=X0.shape) < 0.5] = 0.0
            return dataclasses.replace(
                data, objects=(SparseTensor.from_dense(X0),))
    elif name == "tpar2":
        # script-11 style temporal smoothness (joint block-tridiag prox)
        spec = ProblemSpec(
            mode_sizes=(8, (9,) * 6, 6),
            datasets=(DatasetSpec(model="PAR2", modes=(0, 1, 2), rank=2),),
            coupling=CouplingSpec(lin_coupled_modes=(0, 0, 0),
                                  coupling_type=()),
            constraints=(None, ConstraintSpec("tPARAFAC2", (10.0,)),
                         ConstraintSpec("non-negativity")))
        distr = ["rand", "rand", "rand+0.1"]
        noise = 0.05
    else:
        raise ValueError(name)
    lambdas = [[1] * ds.rank for ds in spec.datasets]
    data, _, _, _ = create_coupled_data(
        spec, lambdas=lambdas, noise=noise, distr=distr, rng=11,
        coupl_trafo=trafo, coupl_trafo2=trafo2)
    if normalize:
        data, _ = normalize_data(spec, data)
    if post_data is not None:
        data = post_data(data)
    init = InitOptions(distr=tuple(init_distr or distr), normalize=True,
                       lambdas_init=tuple(tuple(l) for l in lambdas))
    state0 = init_coupled(spec, data, init, key=7, delta_shapes=delta_shapes)
    state, out = fit(spec, data, state0, opts)
    rows = [out.func_val_conv, out.func_coupl_conv,
            out.func_constr_conv, out.func_PAR2_coupl]
    if out.func_rel_missing is not None:
        rows.append(out.func_rel_missing)
    return np.stack(rows)


@pytest.mark.parametrize("name", [
    "cp_nonneg_coupled", "par2_nonneg", "cp_tv",
    "coupled_type1", "coupled_type2", "coupled_type3", "coupled_type4",
    "coupled_type5", "cp_kl", "cp_em_missing", "tpar2", "cp_sparse"])
def test_golden_trajectory(name):
    traj = _run_config(name)
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    if REGEN or not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez(path, traj=traj)
        pytest.skip(f"recorded golden {name}")
    want = np.load(path)["traj"]
    np.testing.assert_allclose(traj, want, rtol=1e-8, atol=1e-12)
