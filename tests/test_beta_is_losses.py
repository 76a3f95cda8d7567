"""End-to-end Itakura-Saito and generic beta-divergence fits."""
import numpy as np
import jax.numpy as jnp

from matlab_code_tpu import (
    ProblemSpec, DatasetSpec, CouplingSpec, AlgOptions)
from matlab_code_tpu.options import LbfgsbOptions
from tests.helpers import run_problem, cp_fms


def _spec(loss, param=None):
    return ProblemSpec(
        mode_sizes=(14, 10, 12),
        datasets=(DatasetSpec(model="CP", modes=(0, 1, 2), rank=2,
                              loss=loss, loss_param=param),),
        coupling=CouplingSpec(lin_coupled_modes=(0, 0, 0), coupling_type=()),
        constraints=(None,) * 3)


OPTS = AlgOptions(MaxOuterIters=250, AbsFuncTol=1e-9, OuterRelTol=1e-8,
                  lbfgsb=LbfgsbOptions(m=5, maxIts=100, pgtol=1e-7))


def test_is_loss_recovery():
    spec = _spec("IS")
    # IS data: Gamma-noised positive low-rank (create_coupled_data.m:165-166)
    res = run_problem(spec, lambdas=[[1, 1]],
                      distr=[("gamma", 3.0, 2.0)] * 3,
                      init_distr=["rand"] * 3, opts=OPTS, key=2,
                      normalize=False)
    out = res["out"]
    assert np.isfinite(out.f_tensors)
    assert out.func_val_conv[-1] < out.func_val_conv[0]
    assert cp_fms(res, 0, spec, (0, 1, 2)) > 0.9
    for m in range(3):
        assert float(jnp.min(res["state"].fac[m])) >= 0.0


def test_beta_loss_runs():
    spec = _spec("beta", param=1.5)
    res = run_problem(spec, lambdas=[[1, 1]],
                      distr=[("gamma", 3.0, 2.0)] * 3,
                      init_distr=["rand"] * 3, opts=OPTS, key=2,
                      normalize=False)
    out = res["out"]
    assert np.isfinite(out.f_tensors)
    assert out.func_val_conv[-1] < out.func_val_conv[0]
    assert cp_fms(res, 0, spec, (0, 1, 2)) > 0.85
