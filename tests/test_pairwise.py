"""Pairwise-perturbation MTTKRP acceleration (models/pairwise.py,
AlgOptions.cp_pairwise_perturbation — Ma & Solomonik, arXiv:2010.12056)."""
import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from matlab_code_tpu import (
    ProblemSpec, DatasetSpec, CouplingSpec, ConstraintSpec, AlgOptions,
    InitOptions)
from matlab_code_tpu.models.init import init_coupled
from matlab_code_tpu.models.solver import fit, fit_stepwise
from matlab_code_tpu.models import pairwise
from matlab_code_tpu.ops.tensor import mttkrp
from matlab_code_tpu.problem import SparseTensor, ProblemData
from matlab_code_tpu.utils.datagen import create_coupled_data, normalize_data
from matlab_code_tpu.utils.score import fms

rng = np.random.default_rng(4)


def _problem(noise=0.02):
    spec = ProblemSpec(
        mode_sizes=(20, 30, 40),
        datasets=(DatasetSpec(model="CP", modes=(0, 1, 2), rank=3),),
        coupling=CouplingSpec(lin_coupled_modes=(0, 0, 0), coupling_type=()),
        constraints=(ConstraintSpec("non-negativity"), None, None))
    data, Atrue, _, _ = create_coupled_data(
        spec, lambdas=[[1, 1, 1]], noise=noise,
        distr=["rand", "randn", "randn"], rng=7)
    data, _ = normalize_data(spec, data)
    init = InitOptions(distr=("rand", "randn", "randn"), normalize=True,
                       lambdas_init=((1, 1, 1),))
    return spec, data, init


def test_pp_first_order_error_scaling():
    """The PP evaluation's error is O(||perturbation||^2): quartering when
    the perturbation halves."""
    spec, data, init = _problem()
    state = init_coupled(spec, data, init, key=1)
    facs0 = tuple(state.fac[m] for m in range(3))
    T01, T02, T12 = pairwise._build_partials(spec, data, 0, facs0)
    cache = {"T01": T01, "T02": T02, "T12": T12,
             "ref0": facs0[0], "ref1": facs0[1], "ref2": facs0[2],
             "active": jnp.bool_(True), "seeded": jnp.bool_(True)}
    opts = AlgOptions()
    d = []
    for f in facs0:
        g = rng.standard_normal(np.asarray(f).shape)
        d.append(jnp.asarray(g / np.linalg.norm(g))
                 * jnp.linalg.norm(f))   # unit RELATIVE perturbation

    def err(eps):
        facs = tuple(facs0[i] + eps * d[i] for i in range(3))
        errs = []
        for local in range(3):
            approx = pairwise.pp_mttkrp(spec, data.objects[0], facs, 0,
                                        cache, local, opts)
            exact = mttkrp(data.objects[0], list(facs), local)
            errs.append(float(jnp.linalg.norm(approx - exact)
                              / jnp.linalg.norm(exact)))
        return max(errs)

    e1, e2 = err(0.02), err(0.04)
    assert e1 < 0.05
    assert e2 / e1 == pytest.approx(4.0, rel=0.35)


def test_pp_fit_matches_exact_dense():
    spec, data, init = _problem()
    state0 = init_coupled(spec, data, init, key=1)
    opts = AlgOptions(MaxOuterIters=600, AbsFuncTol=1e-12, OuterRelTol=1e-12)
    opts_pp = dataclasses.replace(opts, cp_pairwise_perturbation=True)
    s1, o1 = fit(spec, data, state0, opts)
    s2, o2 = fit(spec, data, state0, opts_pp)
    # final objective recomputed exactly -> directly comparable
    assert o2.f_tensors >= 0
    assert abs(o1.f_tensors - o2.f_tensors) < 5e-3 * o1.f_tensors + 1e-10
    s = fms([np.asarray(s1.fac[m]) for m in range(3)],
            [np.asarray(s2.fac[m]) for m in range(3)])
    assert s > 0.999


def test_pp_never_active_is_exact():
    """pp_start_tol=0 never activates PP: the trajectory must EQUAL the
    exact path bit-for-bit in every stream (plumbing identity check)."""
    spec, data, init = _problem()
    state0 = init_coupled(spec, data, init, key=1)
    opts = AlgOptions(MaxOuterIters=30, AbsFuncTol=0.0, OuterRelTol=0.0)
    opts_pp = dataclasses.replace(opts, cp_pairwise_perturbation=True,
                                  pp_start_tol=0.0)
    s1, o1 = fit(spec, data, state0, opts)
    s2, o2 = fit(spec, data, state0, opts_pp)
    # all in-loop values bit-identical; the LAST entry is recomputed by the
    # exact final evaluation (different accumulation order, ~1 ulp)
    np.testing.assert_array_equal(np.asarray(o1.func_val_conv)[:-1],
                                  np.asarray(o2.func_val_conv)[:-1])
    np.testing.assert_allclose(o1.func_val_conv[-1], o2.func_val_conv[-1],
                               rtol=1e-10)
    for m in range(3):
        np.testing.assert_array_equal(np.asarray(s1.fac[m]),
                                      np.asarray(s2.fac[m]))


def test_pp_sparse_and_stepwise():
    spec, data, init = _problem(noise=0.0)
    X = np.array(data.objects[0])
    X[rng.uniform(size=X.shape) < 0.4] = 0.0
    spd = dataclasses.replace(data, objects=(SparseTensor.from_dense(X),))
    state0 = init_coupled(spec, spd, init, key=1)
    opts = AlgOptions(MaxOuterIters=150, AbsFuncTol=0.0, OuterRelTol=0.0)
    opts_pp = dataclasses.replace(opts, cp_pairwise_perturbation=True)
    s1, o1 = fit(spec, spd, state0, opts)
    s2, o2 = fit(spec, spd, state0, opts_pp)
    assert abs(o1.f_tensors - o2.f_tensors) < 1e-4 * max(o1.f_tensors, 1e-12)
    opts_sw = dataclasses.replace(opts_pp, MaxOuterIters=50)
    s3, o3 = fit_stepwise(spec, spd, state0, opts_sw)
    assert np.isfinite(o3.f_tensors) and o3.f_tensors >= 0


def test_pp_eligibility():
    spec, data, init = _problem()
    opts_on = AlgOptions(cp_pairwise_perturbation=True)
    assert pairwise.eligible_pp_datasets(spec, data, opts_on) == (0,)
    assert pairwise.eligible_pp_datasets(spec, data, AlgOptions()) == ()
    # missing mask disables (EM mutates the data under the partials)
    miss = dataclasses.replace(
        data, miss=(jnp.ones((20, 30, 40), bool),))
    assert pairwise.eligible_pp_datasets(spec, miss, opts_on) == ()
    # mesh disables (partials are unsharded)
    assert pairwise.eligible_pp_datasets(spec, data, opts_on,
                                         mesh=object()) == ()
