"""Multi-start fitting: all random starts run in ONE vmapped jitted program.

The reference runs its 20 random starts sequentially
(example_script15:113-130); on TPU the starts are batched over the leading
axis of the state pytree, so the MTTKRPs and batched solves of every start
execute as one larger fused program (SURVEY.md §2.3 'embarrassingly
parallel: one init per device group / vmap over seeds').

Semantics: every start runs MaxOuterIters sweeps; each start's individual
stopping iteration is recovered afterwards from the per-iteration history
streams (identical numbers to a sequential early-stopped run, since history
entries before the stop point are unaffected by later sweeps).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from matlab_code_tpu.problem import ProblemSpec, ProblemData, has_missing
from matlab_code_tpu.options import AlgOptions, InitOptions
from matlab_code_tpu.models.init import init_coupled
from matlab_code_tpu.models.solver import (
    build_proxes, make_outer_step, init_cache, compute_znorm_consts,
    em_impute, stopping)
from matlab_code_tpu.models.objective import func_eval


def fit_multistart(spec: ProblemSpec, data: ProblemData, options: AlgOptions,
                   init_options: InitOptions, n_starts: int, base_key=0,
                   delta_shapes=None):
    """Returns (best_state, best_out, all_f_tensors, stop_iters).

    best_out: dict with the four final streams + histories of the best start
    evaluated at ITS OWN stopping iteration.
    """
    if isinstance(base_key, str):
        import hashlib
        base_key = int(hashlib.sha256(base_key.encode()).hexdigest()[:8], 16)
    root = jax.random.PRNGKey(int(base_key))
    keys = [jax.random.fold_in(root, s) for s in range(n_starts)]
    states = [init_coupled(spec, data, init_options, key=k,
                           delta_shapes=delta_shapes) for k in keys]
    batched = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)
    proxes, reg_fns = build_proxes(spec)
    # multistart keeps the Bk constraint statically active from iter 1
    # (iter_start_PAR2Bkconstraint is supported via the single-start path)
    outer_step = make_outer_step(spec, options, proxes, reg_fns, True)
    miss_flag = has_missing(data)
    znorms = compute_znorm_consts(spec, data, options)
    T = options.MaxOuterIters

    def run_one(state, data):
        grams, colnorms = init_cache(spec, state)
        f4 = func_eval(spec, data, state, grams, znorms, reg_fns, None,
                       options)
        hist = jnp.zeros((4, T + 1), f4[0].dtype)
        hist = hist.at[:, 0].set(jnp.stack(f4))
        frm = jnp.asarray(jnp.nan, f4[0].dtype)

        def body(i, c):
            state, data, grams, colnorms, hist, frm = c
            state, grams, colnorms, cached, _, _ = outer_step(
                state, data, grams, colnorms)
            if miss_flag:
                data, frm = em_impute(spec, data, state)
            f4n = func_eval(spec, data, state, grams, znorms, reg_fns,
                            cached, options)
            hist = hist.at[:, i + 1].set(jnp.stack(f4n))
            return (state, data, grams, colnorms, hist, frm)

        state, data, grams, colnorms, hist, frm = lax.fori_loop(
            0, T, body, (state, data, grams, colnorms, hist, frm))
        return state, hist, frm

    run_all = jax.jit(jax.vmap(run_one, in_axes=(0, None)))
    states_f, hists, frms = run_all(batched, data)
    hists = np.asarray(hists)   # (S, 4, T+1)

    # recover each start's stopping iteration on the host
    stop_iters = []
    finals = []
    for s in range(n_starts):
        it_stop = T
        for it in range(1, T + 1):
            f4 = tuple(hists[s, :, it])
            f4o = tuple(hists[s, :, it - 1])
            if bool(stopping(f4, f4o, options)) or not np.all(
                    np.isfinite(hists[s, :, it])):
                it_stop = it
                break
        stop_iters.append(it_stop)
        finals.append(hists[s, 0, it_stop])
    finals = np.asarray(finals)
    best = int(np.nanargmin(finals))
    best_state = jax.tree_util.tree_map(
        lambda x: x[best] if x is not None else None, states_f)
    best_out = {
        "f_tensors": float(hists[best, 0, stop_iters[best]]),
        "f_couplings": float(hists[best, 1, stop_iters[best]]),
        "f_constraints": float(hists[best, 2, stop_iters[best]]),
        "f_PAR2_couplings": float(hists[best, 3, stop_iters[best]]),
        "OuterIterations": stop_iters[best],
        "func_val_conv": hists[best, 0, :stop_iters[best] + 1],
    }
    return best_state, best_out, finals, stop_iters
