"""Bound the jit-compatible L-BFGS-B (ops/lbfgsb.py) against scipy's real
Byrd-Lu-Nocedal L-BFGS-B on ACTUAL KL factor subproblems from a script-7
style fit (cmtf_fun_AOADMM.m:1409-1418): same minimizer (final objective
within tight rtol) and iteration counts within a small factor, so the
documented "iterate paths may differ" deviation is bounded by a test."""
import numpy as np
import jax.numpy as jnp
from scipy.optimize import minimize

from matlab_code_tpu import (
    ProblemSpec, DatasetSpec, CouplingSpec, AlgOptions, InitOptions)
from matlab_code_tpu.models.init import init_coupled
from matlab_code_tpu.models.solver import fit
from matlab_code_tpu.ops import losses
from matlab_code_tpu.ops.lbfgsb import lbfgsb
from matlab_code_tpu.ops.tensor import ktensor_full, mttkrp
from matlab_code_tpu.options import LbfgsbOptions
from matlab_code_tpu.utils.datagen import create_coupled_data


def test_lbfgsb_matches_scipy_on_kl_subproblems():
    spec = ProblemSpec(
        mode_sizes=(15, 10, 12),
        datasets=(DatasetSpec(model="CP", modes=(0, 1, 2), rank=2,
                              loss="KL"),),
        coupling=CouplingSpec(lin_coupled_modes=(0, 0, 0), coupling_type=()),
        constraints=(None,) * 3)
    data, _, _, _ = create_coupled_data(
        spec, lambdas=[[1, 1]], noise=0.0, distr=[("gamma", 2.0, 3.0)] * 3,
        rng=2)
    init = InitOptions(distr=("rand",) * 3, normalize=True,
                       lambdas_init=((1, 1),))
    state0 = init_coupled(spec, data, init, key=2)
    # 5 outer AO iterations land the factors in a realistic ADMM region
    opts = AlgOptions(MaxOuterIters=5, AbsFuncTol=0.0, OuterRelTol=0.0,
                      lbfgsb=LbfgsbOptions(m=5, maxIts=100, pgtol=1e-8))
    state, _ = fit(spec, data, state0, opts)

    X = jnp.asarray(data.objects[0])
    eps_log = opts.eps_log
    for m in range(3):
        facs = [jnp.asarray(state.fac[j]) for j in range(3)]
        shape = facs[m].shape

        def vag(xvec):
            x = xvec.reshape(shape)
            fs = [f if j != m else x for j, f in enumerate(facs)]
            M = ktensor_full(fs)
            f = jnp.sum(losses.loss_fh("KL", X, M, eps_log))
            g = mttkrp(losses.loss_gh("KL", X, M, eps_log), fs, m)
            return f, g.reshape(-1)

        x0 = facs[m].reshape(-1)
        res = lbfgsb(vag, x0, 0.0, np.inf, m=5, maxiter=300, pgtol=1e-9,
                     factr=10.0)

        def vag_np(x):
            f, g = vag(jnp.asarray(x, x0.dtype))
            return float(f), np.asarray(g, np.float64)

        sres = minimize(vag_np, np.asarray(x0, np.float64), jac=True,
                        method="L-BFGS-B",
                        bounds=[(0.0, None)] * x0.size,
                        options=dict(maxiter=300, ftol=1e-15, gtol=1e-9,
                                     maxcor=5))
        f_ours, f_sci = float(res.f), float(sres.fun)
        # same minimizer to tight relative tolerance
        assert abs(f_ours - f_sci) <= 1e-12 * (1.0 + abs(f_sci)), \
            (m, f_ours, f_sci)
        # iteration counts within a small factor of the reference scheme
        n_ours, n_sci = int(res.iterations), int(sres.nit)
        assert n_ours <= 2 * max(n_sci, 5), (m, n_ours, n_sci)
