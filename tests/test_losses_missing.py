"""Non-Frobenius losses (KL via L-BFGS-B, script 7) and EM missing-data
imputation (script 12)."""
import numpy as np
import jax.numpy as jnp
import dataclasses

from matlab_code_tpu import (
    ProblemSpec, DatasetSpec, CouplingSpec, ConstraintSpec, AlgOptions,
    InitOptions, cmtf_aoadmm)
from matlab_code_tpu.options import LbfgsbOptions
from matlab_code_tpu.utils.score import fms
from tests.helpers import run_problem, cp_fms


def test_kl_coupled_matrix_cp():
    # script-7 style: 3-way CP + matrix, both KL (count data), mode 0/3 coupled
    spec = ProblemSpec(
        mode_sizes=(20, 12, 14, 20, 16),
        datasets=(DatasetSpec(model="CP", modes=(0, 1, 2), rank=3, weight=0.5,
                              loss="KL"),
                  DatasetSpec(model="CP", modes=(3, 4), rank=3, weight=0.5,
                              loss="KL")),
        coupling=CouplingSpec(lin_coupled_modes=(1, 0, 0, 1, 0),
                              coupling_type=(0,)),
        constraints=(None,) * 5)
    # script-7-faithful options (example_script7:95-107, 64-69)
    opts = AlgOptions(MaxOuterIters=1000, MaxInnerIters=5, AbsFuncTol=1e-4,
                      OuterRelTol=1e-6,
                      innerRelPrTol_coupl=1e-3, innerRelPrTol_constr=1e-3,
                      innerRelDualTol_coupl=1e-3, innerRelDualTol_constr=1e-3,
                      lbfgsb=LbfgsbOptions(m=5, maxIts=100, pgtol=1e-4))
    res = run_problem(spec, lambdas=[[1, 1, 1], [1, 1, 1]],
                      distr=[("gamma", 1.0, 1.0)] * 5,
                      init_distr=["rand"] * 5, opts=opts, key=2,
                      normalize=False)
    out = res["out"]
    assert np.isfinite(out.f_tensors)
    fv = out.func_val_conv
    assert fv[-1] < fv[0]
    assert out.f_couplings < 1e-3
    assert cp_fms(res, 0, spec, (0, 1, 2)) > 0.95
    assert cp_fms(res, 1, spec, (3, 4)) > 0.90
    # factors respect the KL bound (nonnegative)
    for m in range(5):
        assert float(jnp.min(res["state"].fac[m])) >= 0.0


def test_kl_uncoupled_cp_recovery():
    spec = ProblemSpec(
        mode_sizes=(15, 10, 12),
        datasets=(DatasetSpec(model="CP", modes=(0, 1, 2), rank=2,
                              loss="KL"),),
        coupling=CouplingSpec(lin_coupled_modes=(0, 0, 0), coupling_type=()),
        constraints=(None,) * 3)
    opts = AlgOptions(MaxOuterIters=300, AbsFuncTol=1e-10, OuterRelTol=1e-9,
                      lbfgsb=LbfgsbOptions(m=5, maxIts=100, pgtol=1e-8))
    res = run_problem(spec, lambdas=[[1, 1]], distr=[("gamma", 2.0, 3.0)] * 3,
                      init_distr=["rand"] * 3, opts=opts, key=2,
                      normalize=False)
    assert cp_fms(res, 0, spec, (0, 1, 2)) > 0.99


def test_kl_objective_value_definition():
    # KL stream equals sum(m - x log(m+eps)) + sum(x log(x+eps) - x)
    from matlab_code_tpu.ops import losses
    rng = np.random.default_rng(0)
    X = rng.poisson(5.0, (6, 7)).astype(float)
    M = rng.uniform(1, 8, (6, 7))
    eps = 1e-10
    zc = float(losses.znorm_const("KL", jnp.asarray(X), eps))
    fh = float(jnp.sum(losses.loss_fh("KL", jnp.asarray(X), jnp.asarray(M),
                                      eps)))
    direct = np.sum(X * np.log((X + eps) / (M + eps)) - X + M)
    np.testing.assert_allclose(zc + fh, direct, rtol=1e-8)


def test_missing_data_em_cp():
    # script-12 style: 20% missing-at-random entries in a CP tensor
    spec = ProblemSpec(
        mode_sizes=(12, 13, 14),
        datasets=(DatasetSpec(model="CP", modes=(0, 1, 2), rank=2),),
        coupling=CouplingSpec(lin_coupled_modes=(0, 0, 0), coupling_type=()),
        constraints=(ConstraintSpec("non-negativity"), None, None))
    from matlab_code_tpu.utils.datagen import create_coupled_data, normalize_data
    data, Atrue, _, _ = create_coupled_data(
        spec, lambdas=[[1, 1]], noise=0.0,
        distr=["rand", "randn", "randn"], rng=3)
    data, _ = normalize_data(spec, data)
    rng = np.random.default_rng(1)
    mask = rng.uniform(size=(12, 13, 14)) > 0.2  # True = observed
    X0 = np.asarray(data.objects[0])
    data = dataclasses.replace(
        data, objects=(jnp.asarray(np.where(mask, X0, 0.0)),),
        miss=(jnp.asarray(mask),))
    opts = AlgOptions(MaxOuterIters=2000, AbsFuncTol=1e-10, OuterRelTol=1e-9)
    init = InitOptions(distr=("rand", "randn", "randn"), normalize=True,
                       lambdas_init=((1, 1),))
    zhat, state, _, out = cmtf_aoadmm(spec, data, opts, init_options=init,
                                      key=2)
    assert out.f_tensors < 1e-7
    assert out.f_rel_missing < 1e-6
    # imputed model matches the full (held-out) ground truth tensor
    from matlab_code_tpu.ops.tensor import ktensor_full
    Xhat = np.asarray(ktensor_full([jnp.asarray(f)
                                    for f in zhat[0]["factors"]]))
    heldout_err = np.linalg.norm((Xhat - X0)[~mask]) / np.linalg.norm(X0[~mask])
    assert heldout_err < 1e-3
    assert fms(zhat[0]["factors"], [Atrue[m] for m in range(3)]) > 0.99


def test_em_telemetry_uniform_across_fit_variants():
    """fit / fit_stepwise / fit_multistart return the SAME populated
    telemetry fields on an EM problem — the reference's `out` struct is
    uniform across entry paths (cmtf_fun_AOADMM.m:480-494): per-iteration
    func_rel_missing history and time_at_it present in all three."""
    from matlab_code_tpu.models.init import init_coupled
    from matlab_code_tpu.models.solver import fit, fit_stepwise
    from matlab_code_tpu.models.multistart import fit_multistart
    spec = ProblemSpec(
        mode_sizes=(10, 11, 12),
        datasets=(DatasetSpec(model="CP", modes=(0, 1, 2), rank=2),),
        coupling=CouplingSpec(lin_coupled_modes=(0, 0, 0), coupling_type=()),
        constraints=(ConstraintSpec("non-negativity"), None, None))
    from matlab_code_tpu.utils.datagen import create_coupled_data, \
        normalize_data
    data, _, _, _ = create_coupled_data(
        spec, lambdas=[[1, 1]], noise=0.0,
        distr=["rand", "randn", "randn"], rng=3)
    data, _ = normalize_data(spec, data)
    rng = np.random.default_rng(1)
    mask = rng.uniform(size=(10, 11, 12)) > 0.2
    X0 = np.asarray(data.objects[0])
    data = dataclasses.replace(
        data, objects=(jnp.asarray(np.where(mask, X0, 0.0)),),
        miss=(jnp.asarray(mask),))
    opts = AlgOptions(MaxOuterIters=60, AbsFuncTol=1e-12, OuterRelTol=1e-12)
    init = InitOptions(distr=("rand", "randn", "randn"), normalize=True,
                       lambdas_init=((1, 1),))
    state0 = init_coupled(spec, data, init, key=2)
    _, out_f = fit(spec, data, state0, opts)
    _, out_s = fit_stepwise(spec, data, state0, opts)
    _, out_m, _, _ = fit_multistart(spec, data, opts, init, n_starts=2,
                                    keys=[2, 3])
    for out in (out_f, out_s, out_m):
        n = out.OuterIterations
        assert out.func_rel_missing is not None
        assert len(out.func_rel_missing) == n + 1
        # iterations 1..n carry finite EM residuals (index 0 is pre-iteration)
        assert np.all(np.isfinite(out.func_rel_missing[1:]))
        assert out.time_at_it is not None
        assert len(out.time_at_it) == n + 1
        assert np.all(np.diff(out.time_at_it) >= 0)
        assert np.isclose(out.func_rel_missing[-1], out.f_rel_missing)
    # the deterministic per-iteration EM residual streams agree between the
    # fused and host-stepped drivers (same math, same draws)
    n = min(out_f.OuterIterations, out_s.OuterIterations)
    np.testing.assert_allclose(out_f.func_rel_missing[1:n + 1],
                               out_s.func_rel_missing[1:n + 1],
                               rtol=1e-8, atol=1e-12)


def test_missing_data_em_par2():
    # PAR2 with missing entries in the slices
    K, J, I = 5, 11, 9
    spec = ProblemSpec(
        mode_sizes=(I, (J,) * K, K),
        datasets=(DatasetSpec(model="PAR2", modes=(0, 1, 2), rank=2),),
        coupling=CouplingSpec(lin_coupled_modes=(0, 0, 0), coupling_type=()),
        constraints=(None, None, ConstraintSpec("non-negativity")))
    from matlab_code_tpu.utils.datagen import create_coupled_data, normalize_data
    data, Atrue, _, _ = create_coupled_data(
        spec, lambdas=[[1, 1]], noise=0.0,
        distr=["randn", "randn", "rand+0.1"], rng=3)
    data, _ = normalize_data(spec, data)
    rng = np.random.default_rng(4)
    mask = rng.uniform(size=(K, I, J)) > 0.15
    X = data.objects[0]
    slices = jnp.asarray(np.where(mask, np.asarray(X.slices), 0.0))
    data = dataclasses.replace(
        data, objects=(type(X)(slices=slices, mask=X.mask),),
        miss=(jnp.asarray(mask),))
    opts = AlgOptions(MaxOuterIters=2000, AbsFuncTol=1e-9, OuterRelTol=1e-8)
    init = InitOptions(distr=("randn", "randn", "rand+0.1"), normalize=True,
                       lambdas_init=((1, 1),))
    zhat, state, _, out = cmtf_aoadmm(spec, data, opts, init_options=init,
                                      key=2)
    assert out.f_tensors < 1e-6
    assert out.f_rel_missing < 1e-5
