"""Bridge between the AO-ADMM sweep and the box-constrained L-BFGS solver for
non-Frobenius (KL / IS / beta) factor subproblems.

Equivalent of compute_gen_f_g + lbfgsb_update (cmtf_fun_AOADMM.m:1365-1418):
value = w * sum(fh(X, M)) (+ ADMM quadratic terms), gradient = w * MTTKRP of
the elementwise gradient tensor (+ quadratic-term gradients).  The gradient is
hand-derived exactly like the reference — no autodiff through the data pass.
"""
from __future__ import annotations

import jax.numpy as jnp

from matlab_code_tpu.ops import losses
from matlab_code_tpu.ops.lbfgsb import lbfgsb
from matlab_code_tpu.ops.tensor import ktensor_full, mttkrp
from matlab_code_tpu.problem import ProblemSpec, ProblemData
from matlab_code_tpu.state import tuple_set


def make_lbfgs_step(spec: ProblemSpec, p: int, m: int, options):
    """Build step(state, data, constrained, coupling_type, rho) ->
    (state, n_iters) updating fac[m] by L-BFGS-B."""
    ds = spec.datasets[p]
    local = ds.modes.index(m)
    lo, hi = losses.loss_bounds(ds.loss)
    lopt = options.lbfgsb
    cid = spec.coupling_id(m)

    def step(state, data, constrained: bool, coupling_type: int, rho):
        X = data.objects[p]
        fshape = state.fac[m].shape
        fac0 = state.fac[m]
        Zc = state.constraint_fac[m] if constrained else None
        muZ = state.constraint_dual_fac[m] if constrained else None
        if coupling_type >= 0:
            Delta = state.coupling_fac[cid - 1]
            muD = state.coupling_dual_fac[m]
            H = data.coupl_trafo[m] if data.coupl_trafo else None
            H2 = data.coupl_trafo2[m] if data.coupl_trafo2 else None

        def vag(xvec):
            x = xvec.reshape(fshape)
            facs = [state.fac[j] if j != m else x for j in ds.modes]
            M = ktensor_full(facs)
            f = ds.weight * jnp.sum(
                losses.loss_fh(ds.loss, X, M, options.eps_log, ds.loss_param))
            Y = losses.loss_gh(ds.loss, X, M, options.eps_log, ds.loss_param)
            g = ds.weight * mttkrp(Y, facs, local).reshape(-1)
            if constrained:
                d = xvec - Zc.reshape(-1) + muZ.reshape(-1)
                f = f + rho / 2.0 * jnp.sum(d * d)
                g = g + rho * d
            if coupling_type == 0:
                d = xvec - Delta.reshape(-1) + muD.reshape(-1)
                f = f + rho / 2.0 * jnp.sum(d * d)
                g = g + rho * d
            elif coupling_type == 1:
                D = H @ x - Delta + muD
                f = f + rho / 2.0 * jnp.sum(D * D)
                g = g + rho * (H.T @ D).reshape(-1)
            elif coupling_type == 2:
                D = x @ H - Delta + muD
                f = f + rho / 2.0 * jnp.sum(D * D)
                g = g + rho * (D @ H.T).reshape(-1)
            elif coupling_type == 3:
                d = xvec - (H @ Delta).reshape(-1) + muD.reshape(-1)
                f = f + rho / 2.0 * jnp.sum(d * d)
                g = g + rho * d
            elif coupling_type == 4:
                d = xvec - (Delta @ H).reshape(-1) + muD.reshape(-1)
                f = f + rho / 2.0 * jnp.sum(d * d)
                g = g + rho * d
            elif coupling_type == 5:
                D = H @ x - Delta @ H2 + muD
                f = f + rho / 2.0 * jnp.sum(D * D)
                g = g + rho * (H.T @ D).reshape(-1)
            if spec.ridge is not None and spec.ridge[m]:
                f = f + spec.ridge[m] * jnp.sum(xvec * xvec)
                # the reference uses ridge/2 * x here (cmtf_fun_AOADMM.m:1401,
                # half the analytic gradient) — replicated literally.
                g = g + spec.ridge[m] / 2.0 * xvec
            if options.bsum:
                d = xvec - fac0.reshape(-1)
                f = f + options.bsum_weight / 2.0 * jnp.sum(d * d)
                g = g + options.bsum_weight * d
            return f, g

        res = lbfgsb(vag, fac0.reshape(-1), lo, hi, m=lopt.m,
                     maxiter=lopt.maxIts, pgtol=lopt.pgtol, factr=lopt.factr,
                     max_total_its=lopt.maxTotalIts)
        state = state.replace(fac=tuple_set(state.fac, m,
                                            res.x.reshape(fshape)))
        return state, res.iterations

    return step
