"""Production-scale benchmark: rank-64 triple fusion with a 0.5 GB tensor,
plus vmapped multi-start throughput (whole fits in parallel on one chip).

Supplementary to bench.py (the driver's headline metric); prints one JSON
line per experiment.
"""
import functools
import json
import time

import numpy as np

# line-buffered progress: a watchdog kill must not lose the segments that
# already finished (block-buffered pipes drop everything on SIGTERM)
print = functools.partial(print, flush=True)
import jax
import jax.numpy as jnp

from matlab_code_tpu import (
    ProblemSpec, DatasetSpec, CouplingSpec, ConstraintSpec, AlgOptions,
    InitOptions)
from matlab_code_tpu.models.init import init_coupled
from matlab_code_tpu.models.solver import (
    build_proxes, make_outer_step, init_cache)


def large_problem(I=256, J1=1024, J2=512, M1=8192, R=64):
    spec = ProblemSpec(
        mode_sizes=(I, J1, J2, I, M1),
        datasets=(
            DatasetSpec(model="CP", modes=(0, 1, 2), rank=R, weight=0.5),
            DatasetSpec(model="CP", modes=(3, 4), rank=R, weight=0.5)),
        coupling=CouplingSpec(lin_coupled_modes=(1, 0, 0, 1, 0),
                              coupling_type=(0,)),
        constraints=tuple(ConstraintSpec("non-negativity")
                          for _ in range(5)))
    rng = np.random.default_rng(0)
    dt = jnp.result_type(float)
    facs = [rng.uniform(size=(s, R)).astype(dt) for s in spec.mode_sizes]
    X1 = np.einsum("ir,jr,kr->ijk", facs[0], facs[1], facs[2])
    X2 = facs[3] @ facs[4].T
    from matlab_code_tpu.problem import ProblemData
    data = ProblemData(objects=(jnp.asarray(X1), jnp.asarray(X2)),
                       coupl_trafo=(None,) * 5, coupl_trafo2=(None,) * 5)
    opts = AlgOptions(MaxOuterIters=10, MaxInnerIters=5)
    init = InitOptions(distr=("rand",) * 5, normalize=True,
                       lambdas_init=((1,) * R,) * 2)
    state = init_coupled(spec, data, init, key=1)
    return spec, data, state, opts


def run_iters(spec, data, state, opts, n_iters, want_bound=False):
    """it/s of the full outer step, in-jit loop.  n_iters must be large
    enough that device time >> the ~27 ms tunnel sync floor (round 2's
    n_iters=10 measurement under-reported 750 it/s as 238 it/s).
    want_bound=True additionally returns the per-iteration roofline lower
    bound from XLA's post-fusion cost model (bench._roofline_bound_us:
    max(FLOPs at MXU peak, bytes at HBM peak); conservative — see its
    docstring) so the printed line can carry % of bound."""
    proxes, reg_fns = build_proxes(spec)
    step = make_outer_step(spec, opts, proxes, reg_fns, True)
    grams, colnorms = init_cache(spec, state)

    def n_steps_fn(state, data, grams, colnorms):
        def body(i, c):
            s, g, cn = c
            s, g, cn, *_ = step(s, data, g, cn)
            return (s, g, cn)
        return jax.lax.fori_loop(0, n_iters, body, (state, grams, colnorms))

    n_steps = jax.jit(n_steps_fn)
    bound = None
    if want_bound:
        from bench import _roofline_bound_us
        compiled = n_steps.lower(state, data, grams, colnorms).compile()
        bound = _roofline_bound_us(compiled, n_iters)
    out = n_steps(state, data, grams, colnorms)
    np.asarray(out[0].fac[0])
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        out = n_steps(state, data, grams, colnorms)
        np.asarray(out[0].fac[0])
        best = min(best, (time.perf_counter() - t0) / n_iters)
    assert bool(jnp.all(jnp.isfinite(out[0].fac[0])))
    return (1.0 / best, bound) if want_bound else 1.0 / best


def par2_problem(I=256, J=256, K=512, R=32):
    """Regular PARAFAC2, 134 MB of slices: the K-batched Cholesky/polar-SVD
    sweep (ADMM_B_Parafac2) at production scale."""
    spec = ProblemSpec(
        mode_sizes=(I, (J,) * K, K),
        datasets=(DatasetSpec(model="PAR2", modes=(0, 1, 2), rank=R),),
        coupling=CouplingSpec(lin_coupled_modes=(0, 0, 0), coupling_type=()),
        constraints=(ConstraintSpec("non-negativity"), None,
                     ConstraintSpec("non-negativity")))
    rng = np.random.default_rng(0)
    dt = jnp.result_type(float)
    A = rng.uniform(size=(I, R)).astype(dt)
    C = rng.uniform(0.5, 1.5, size=(K, R)).astype(dt)
    B = rng.standard_normal((K, J, R)).astype(dt)
    X = np.einsum("ir,kr,kjr->kij", A, C, B)
    from matlab_code_tpu.problem import ProblemData, Parafac2Tensor
    data = ProblemData(
        objects=(Parafac2Tensor(slices=jnp.asarray(X),
                                mask=jnp.ones((K, J), bool)),),
        coupl_trafo=(None,) * 3, coupl_trafo2=(None,) * 3)
    opts = AlgOptions(MaxOuterIters=10, MaxInnerIters=5)
    init = InitOptions(distr=("rand",) * 3, normalize=True,
                       lambdas_init=((1,) * R,))
    state = init_coupled(spec, data, init, key=1)
    return spec, data, state, opts


def kl_problem(I=128, J=256, K=256, R=8):
    """Production-scale KL loss (Poisson counts): the L-BFGS-B inner-solve
    path, where every evaluation materializes the full model tensor
    (cmtf_fun_AOADMM.m:1368-1372) — bandwidth-bound on TPU."""
    spec = ProblemSpec(
        mode_sizes=(I, J, K),
        datasets=(DatasetSpec(model="CP", modes=(0, 1, 2), rank=R,
                              loss="KL"),),
        coupling=CouplingSpec(lin_coupled_modes=(0, 0, 0), coupling_type=()),
        constraints=(ConstraintSpec("non-negativity"),) * 3)
    rng = np.random.default_rng(0)
    dt = jnp.result_type(float)
    facs = [rng.uniform(size=(s, R)).astype(dt) for s in (I, J, K)]
    lam = rng.poisson(
        20.0 * np.einsum("ir,jr,kr->ijk", facs[0], facs[1], facs[2]))
    from matlab_code_tpu.problem import ProblemData
    data = ProblemData(objects=(jnp.asarray(lam, dt),),
                       coupl_trafo=(None,) * 3, coupl_trafo2=(None,) * 3)
    opts = AlgOptions(MaxOuterIters=10, MaxInnerIters=5)
    init = InitOptions(distr=("rand",) * 3, normalize=True,
                       lambdas_init=((1,) * R,))
    state = init_coupled(spec, data, init, key=1)
    return spec, data, state, opts


def sparse_problem(D=2048, NNZ=10_000_000, R=16, pallas=True,
                   structured=False):
    """Sparse COO CP (the reference's sptensor path): 1e7 nonzeros of a
    2048^3 tensor.  The gather/segment-sum MTTKRP is random-access-bound on
    TPU (~16 GB/s effective gather bandwidth; docs/ROOFLINE.md) — per-mode
    sorted copies and ELL padding were measured and do NOT help; the
    one-hot-MXU Pallas kernel (ops/sparse_pallas.py) does, and `pallas=True`
    attaches its plans (sparse_mttkrp='auto' then uses it on TPU)."""
    from matlab_code_tpu.problem import ProblemData, SparseTensor
    spec = ProblemSpec(
        mode_sizes=(D, D, D),
        datasets=(DatasetSpec(model="CP", modes=(0, 1, 2), rank=R),),
        coupling=CouplingSpec(lin_coupled_modes=(0, 0, 0), coupling_type=()),
        constraints=(ConstraintSpec("non-negativity"),) * 3)
    rng = np.random.default_rng(0)
    dt = jnp.result_type(float)
    idx = np.unique(rng.integers(0, D, size=(NNZ, 3)).astype(np.int32),
                    axis=0)
    if structured:
        # sampled entries of a ground-truth nonneg CP model — the
        # convergent (tight-tolerance) regime where factor steps shrink
        # and the pairwise-perturbation accelerator engages.  (With added
        # noise the factors bounce at the noise floor at ~3%/sweep — a
        # regime where OuterRelTol would stop the fit and PP correctly
        # stays inactive; measured, docs/ROOFLINE.md.)
        F = [rng.uniform(size=(D, R)).astype(dt) for _ in range(3)]
        vals = (F[0][idx[:, 0]] * F[1][idx[:, 1]]
                * F[2][idx[:, 2]]).sum(1).astype(dt)
    else:
        vals = rng.uniform(size=len(idx)).astype(dt)
    st = SparseTensor(jnp.asarray(idx), jnp.asarray(vals))
    if pallas:
        st = SparseTensor(st.indices, st.values).with_plans((D, D, D))
    data = ProblemData(objects=(st,), coupl_trafo=(None,) * 3,
                       coupl_trafo2=(None,) * 3)
    opts = AlgOptions(MaxOuterIters=10, MaxInnerIters=5)
    init = InitOptions(distr=("rand",) * 3, normalize=True,
                       lambdas_init=((1,) * R,))
    state = init_coupled(spec, data, init, key=1)
    return spec, data, state, opts


def run_iters_pp(spec, data, state, opts, n_iters, warm_iters=5):
    """Steady-state it/s of PP-accelerated sweeps (models/pairwise.py).

    This measures the THROUGHPUT of a pairwise-perturbation sweep (dense
    MXU einsums over cached partials instead of the gather-bound data
    pass), so the caller's opts should force engagement (pp_start_tol=1.0)
    and suppress rebuilds (pp_refresh_tol large) — at bench scale the
    production gating (start 0.02) only engages after hundreds of
    convergent sweeps, which tests/test_pairwise.py pins separately.
    Returns (iters_per_s, pp_active_fraction) — the fraction asserts the
    timed sweeps really ran PP."""
    from matlab_code_tpu.models.pairwise import (
        eligible_pp_datasets, pp_init)
    proxes, reg_fns = build_proxes(spec)
    pp_ds = eligible_pp_datasets(spec, data, opts)
    assert pp_ds, "PP bench config must be PP-eligible"
    step = make_outer_step(spec, opts, proxes, reg_fns, True,
                           pp_datasets=pp_ds)
    grams, colnorms = init_cache(spec, state)
    pp0 = pp_init(spec, data, state, pp_ds)

    @jax.jit
    def n_steps(state, data, grams, colnorms, pp, n):
        def body(i, c):
            s, g, cn, pp, act = c
            s, g, cn, _, _, _, _, _, pp = step(s, data, g, cn, None, pp)
            act = act + jnp.where(pp[pp_ds[0]]["active"], 1, 0)
            return (s, g, cn, pp, act)
        return jax.lax.fori_loop(0, n, body,
                                 (state, grams, colnorms, pp, jnp.int32(0)))

    # warm: exact-regime sweeps to reach the converging tail
    state, grams, colnorms, pp, _ = n_steps(state, data, grams, colnorms,
                                            pp0, warm_iters)
    np.asarray(state.fac[0])
    best = np.inf
    act = 0
    for _ in range(3):
        t0 = time.perf_counter()
        out = n_steps(state, data, grams, colnorms, pp, n_iters)
        np.asarray(out[0].fac[0])
        best = min(best, (time.perf_counter() - t0) / n_iters)
        act = int(out[4])
    assert bool(jnp.all(jnp.isfinite(out[0].fac[0])))
    return 1.0 / best, act / n_iters


def multistart_throughput(n_starts=8, iters=20):
    """Whole fits batched with vmap — fits/sec on one chip."""
    from matlab_code_tpu.utils.datagen import create_coupled_data
    spec = ProblemSpec(
        mode_sizes=(64, 128, 96),
        datasets=(DatasetSpec(model="CP", modes=(0, 1, 2), rank=8),),
        coupling=CouplingSpec(lin_coupled_modes=(0, 0, 0), coupling_type=()),
        constraints=(ConstraintSpec("non-negativity"), None, None))
    data, _, _, _ = create_coupled_data(
        spec, lambdas=[[1] * 8], noise=0.01,
        distr=["rand", "randn", "randn"], rng=0)
    init = InitOptions(distr=("rand", "randn", "randn"), normalize=True,
                       lambdas_init=((1,) * 8,))
    states = [init_coupled(spec, data, init, key=k) for k in range(n_starts)]
    batched = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)
    proxes, reg_fns = build_proxes(spec)
    step = make_outer_step(spec, AlgOptions(MaxOuterIters=iters), proxes,
                           reg_fns, True)

    def one(state, data):
        grams, colnorms = init_cache(spec, state)

        def body(i, c):
            s, g, cn = c
            s, g, cn, *_ = step(s, data, g, cn)
            return (s, g, cn)
        return jax.lax.fori_loop(0, iters, body, (state, grams, colnorms))[0]

    run = jax.jit(jax.vmap(one, in_axes=(0, None)))
    out = run(batched, data)
    np.asarray(out.fac[0])
    t0 = time.perf_counter()
    out = run(batched, data)
    np.asarray(out.fac[0])
    dt = time.perf_counter() - t0
    return n_starts * iters / dt, n_starts / dt


def main():
    spec, data, state, opts = large_problem()
    it_s = run_iters(spec, data, state, opts, 300)
    gb = sum(np.asarray(data.objects[p]).nbytes for p in range(2)) / 1e9
    print(f"# large workload: {gb:.2f} GB data, rank 64")
    print(json.dumps({"metric": "aoadmm_iters_per_s_large_r64",
                      "value": round(it_s, 2), "unit": "outer_iters/s",
                      "vs_baseline": None}))
    spec, data, state, opts = par2_problem()
    it_s = run_iters(spec, data, state, opts, 100)
    gb = np.asarray(data.objects[0].slices).nbytes / 1e9
    print(f"# PARAFAC2 workload: {gb:.2f} GB slices, K=512, rank 32")
    print(json.dumps({"metric": "aoadmm_iters_per_s_par2_k512_r32",
                      "value": round(it_s, 2), "unit": "outer_iters/s",
                      "vs_baseline": None}))
    spec, data, state, opts = kl_problem()
    it_s, bound = run_iters(spec, data, state, opts, 60, want_bound=True)
    gb = np.asarray(data.objects[0]).nbytes / 1e9
    print(f"# KL workload: {gb:.2f} GB counts, rank 8 (L-BFGS-B inner solves)")
    if bound:
        bound_us, fl, by = bound
        pct = 100.0 * bound_us / (1e6 / it_s)
    print(json.dumps({"metric": "aoadmm_iters_per_s_kl_lbfgsb",
                      "value": round(it_s, 2), "unit": "outer_iters/s",
                      "vs_baseline": None,
                      **({"pct_of_roofline_bound": round(pct, 1),
                          "bound_us_per_iter": round(bound_us, 1),
                          "flops_per_iter": fl, "bytes_per_iter": by,
                          "bound_model": "max(XLA-cost FLOPs/197TF, "
                                         "bytes/819GBs); conservative"}
                         if bound else {})}))
    spec, data, state, opts = sparse_problem()      # pallas one-hot-MXU path
    it_s = run_iters(spec, data, state, opts, 40)
    nnz = np.asarray(data.objects[0].values).size
    print(f"# sparse workload: {nnz/1e6:.1f}M nnz of 2048^3, rank 16 "
          f"(pallas one-hot-MXU MTTKRP)")
    print(json.dumps({"metric": "aoadmm_iters_per_s_sparse_10Mnnz",
                      "value": round(it_s, 2), "unit": "outer_iters/s",
                      "vs_baseline": None}))
    spec, data, state, opts = sparse_problem(pallas=False)
    it_g = run_iters(spec, data, state, opts, 20)   # ~0.3 s/iter >> floor
    print(json.dumps({"metric": "aoadmm_iters_per_s_sparse_10Mnnz_gather",
                      "value": round(it_g, 2), "unit": "outer_iters/s",
                      "vs_baseline": None}))
    # pairwise-perturbation accelerator on the convergent structured sparse
    # workload (models/pairwise.py): exact-cost data passes only on partial
    # rebuilds; vs_baseline = speedup over the exact pallas path on the
    # SAME structured problem
    import dataclasses
    spec, data, state, opts = sparse_problem(structured=True)
    it_exact = run_iters(spec, data, state, opts, 40)
    opts_pp = dataclasses.replace(opts, cp_pairwise_perturbation=True,
                                  pp_start_tol=1.0, pp_refresh_tol=1e9)
    it_pp, act = run_iters_pp(spec, data, state, opts_pp, 40)
    print(f"# PP active fraction during timed sweeps: {act:.2f}")
    assert act > 0.9, "PP bench must measure PP-active sweeps"
    print(json.dumps({"metric": "aoadmm_iters_per_s_sparse_10Mnnz_pp",
                      "value": round(it_pp, 2), "unit": "outer_iters/s",
                      "vs_baseline": round(it_pp / it_exact, 2)}))
    tot, fits = multistart_throughput(iters=100)
    print(json.dumps({"metric": "multistart_sweeps_per_s",
                      "value": round(tot, 1),
                      "unit": "start-iterations/s (8 parallel fits)",
                      "vs_baseline": None}))


if __name__ == "__main__":
    main()
