"""Golden-trajectory regression tests.

The reference's quality strategy is seeded runs with inspected metrics
(SURVEY.md §4); here we go further: objective-stream trajectories for pinned
configurations are recorded once (tests/golden/*.npz, regenerated with
--regen via GOLDEN_REGEN=1) and every run must reproduce them to tight
tolerance.  Any change to update order, rho heuristics, residual definitions,
or prox semantics shows up here immediately.
"""
import os

import numpy as np
import pytest

from matlab_code_tpu import (
    ProblemSpec, DatasetSpec, CouplingSpec, ConstraintSpec, AlgOptions,
    InitOptions)
from matlab_code_tpu.models.init import init_coupled
from matlab_code_tpu.models.solver import fit
from matlab_code_tpu.utils.datagen import create_coupled_data, normalize_data

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
REGEN = os.environ.get("GOLDEN_REGEN") == "1"


def _run_config(name):
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
    else:
        raise ValueError(name)
    data, _, _, _ = create_coupled_data(
        spec, lambdas=[[1] * 2] * len(spec.datasets), noise=noise,
        distr=distr, rng=11)
    data, _ = normalize_data(spec, data)
    init = InitOptions(distr=tuple(distr), normalize=True,
                       lambdas_init=((1, 1),) * len(spec.datasets))
    state0 = init_coupled(spec, data, init, key=7)
    opts = AlgOptions(MaxOuterIters=40, AbsFuncTol=0.0, OuterRelTol=0.0)
    state, out = fit(spec, data, state0, opts)
    return np.stack([out.func_val_conv, out.func_coupl_conv,
                     out.func_constr_conv, out.func_PAR2_coupl])


@pytest.mark.parametrize("name", ["cp_nonneg_coupled", "par2_nonneg",
                                  "cp_tv"])
def test_golden_trajectory(name):
    traj = _run_config(name)
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    if REGEN or not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez(path, traj=traj)
        pytest.skip(f"recorded golden {name}")
    want = np.load(path)["traj"]
    np.testing.assert_allclose(traj, want, rtol=1e-8, atol=1e-12)
