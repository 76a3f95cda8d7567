"""Shared test fixtures: small script-style problem builders."""
import numpy as np

from matlab_code_tpu import (
    ProblemSpec, DatasetSpec, CouplingSpec, ConstraintSpec, AlgOptions,
    InitOptions, cmtf_aoadmm, create_coupled_data)
from matlab_code_tpu.utils.datagen import normalize_data
from matlab_code_tpu.utils.score import fms, fms_par2_B, fit_score
from matlab_code_tpu.ops.tensor import ktensor_full


def run_problem(spec, lambdas, distr, noise=0.0, coupl_trafo=None,
                coupl_trafo2=None, opts=None, init_distr=None, key=1,
                data_rng=7, bk_style="shift", mode_post=None,
                delta_shapes=None, normalize=True, init_kwargs=None):
    data, Atrue, Delta, _ = create_coupled_data(
        spec, lambdas=lambdas, noise=noise, distr=distr,
        coupl_trafo=coupl_trafo, coupl_trafo2=coupl_trafo2, rng=data_rng,
        bk_style=bk_style, mode_post=mode_post)
    if normalize:
        data, norms = normalize_data(spec, data)
    else:
        norms = [1.0] * len(spec.datasets)
    opts = opts or AlgOptions(MaxOuterIters=2000, AbsFuncTol=1e-10,
                              OuterRelTol=1e-9)
    init = InitOptions(distr=tuple(init_distr or distr), normalize=True,
                       lambdas_init=tuple(tuple(l) for l in lambdas))
    kw = dict(init_kwargs or {})
    from matlab_code_tpu.models.init import init_coupled
    state0 = init_coupled(spec, data, init, key=key,
                          delta_shapes=delta_shapes)
    zhat, state, _, out = cmtf_aoadmm(spec, data, opts, init=state0, **kw)
    return dict(zhat=zhat, state=state, out=out, data=data, Atrue=Atrue,
                Delta=Delta, norms=norms)


def cp_fms(res, p, spec, modes):
    return fms(res["zhat"][p]["factors"], [res["Atrue"][m] for m in modes])
