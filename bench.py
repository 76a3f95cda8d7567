"""Benchmark: AO-ADMM iterations/s on the FLAGSHIP workload — the
EEM/NMR/LCMS configuration of example_script15 (three datasets sharing the
sample mode through a TYPE-4 selector coupling C_i = Delta H_i, all modes
nonneg), scaled to production size, on the real TPU chip.  This exercises
the normal-equation Delta solve (cmtf_fun_AOADMM.m:904-983) that the real
workload pays for, not the cheap type-0 average path.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} plus
supporting lines (secondary type-0 workload, MTTKRP GFLOP/s).  vs_baseline
is the speedup over a pure-numpy CPU implementation of the identical sweep
on this host (the reference publishes no numbers, BASELINE.md).
"""
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from matlab_code_tpu import (
    ProblemSpec, DatasetSpec, CouplingSpec, ConstraintSpec, AlgOptions,
    InitOptions)
from matlab_code_tpu.models.init import init_coupled
from matlab_code_tpu.models.solver import (
    build_proxes, make_outer_step, init_cache)
from matlab_code_tpu.ops.tensor import mttkrp

# flagship (script-15-class, type-4 selector coupling):
#   EEM-like   S x 512 x 256 3-way, rank 16 of 24 latent
#   NMR-like   S x 1024 x 64 3-way, rank 20 of 24 latent
#   LCMS-like  S x 4096 matrix,     rank 20 of 24 latent
S = 128
RTOT = 24
R1, R2, R3 = 16, 20, 20
# 300 in-jit iterations per timed call: at ~1.4 ms/iter the ~27 ms tunnel
# sync floor is <7% noise (30 iterations made the floor a ~2x error)
N_ITERS = 300


def _selectors(rng):
    """Column-selector H_i (RTOT, R_i) like example_script15:47-51."""
    H1 = np.zeros((RTOT, R1))
    H1[np.arange(R1), np.arange(R1)] = 1.0
    H2 = np.zeros((RTOT, R2))
    H2[np.arange(R2), np.arange(R2)] = 1.0
    H3 = np.zeros((RTOT, R3))
    # permuted/partial block like the reference's T matrix
    cols = rng.permutation(RTOT)[:R3]
    H3[cols, np.arange(R3)] = 1.0
    return H1, H2, H3


def _flagship_truth():
    """Small ground-truth factors + selectors, generated on HOST with a fixed
    rng.  Only these (< 1 MB) ever cross the tunnel; the big data tensors are
    assembled ON DEVICE (bench) and independently on host (numpy baseline) —
    a ~100 MB host->device push through a degraded tunnel cost the r03 bench
    its whole time budget."""
    rng = np.random.default_rng(0)
    dt = np.dtype(jnp.result_type(float).name)
    H1, H2, H3 = _selectors(rng)
    Delta = rng.uniform(size=(S, RTOT)).astype(dt)
    sizes = {1: 512, 2: 256, 4: 1024, 5: 64, 7: 4096}
    ranks = {1: R1, 2: R1, 4: R2, 5: R2, 7: R3}
    f = {m: rng.uniform(size=(sizes[m], ranks[m])).astype(dt)
         for m in (1, 2, 4, 5, 7)}
    return (H1.astype(dt), H2.astype(dt), H3.astype(dt)), Delta, f


def build_problem():
    NN = ConstraintSpec("non-negativity")
    spec = ProblemSpec(
        mode_sizes=(S, 512, 256, S, 1024, 64, S, 4096),
        datasets=(
            DatasetSpec(model="CP", modes=(0, 1, 2), rank=R1, weight=1 / 3),
            DatasetSpec(model="CP", modes=(3, 4, 5), rank=R2, weight=1 / 3),
            DatasetSpec(model="CP", modes=(6, 7), rank=R3, weight=1 / 3)),
        coupling=CouplingSpec(lin_coupled_modes=(1, 0, 0, 1, 0, 0, 1, 0),
                              coupling_type=(4,)),
        constraints=(NN,) * 8)
    (H1, H2, H3), Delta, f = _flagship_truth()

    @jax.jit
    def assemble(Delta, H1, H2, H3, f1, f2, f4, f5, f7):
        X1 = jnp.einsum("ir,jr,kr->ijk", Delta @ H1, f1, f2)
        X2 = jnp.einsum("ir,jr,kr->ijk", Delta @ H2, f4, f5)
        X3 = (Delta @ H3) @ f7.T
        return (X1 / jnp.linalg.norm(X1), X2 / jnp.linalg.norm(X2),
                X3 / jnp.linalg.norm(X3))

    X1, X2, X3 = assemble(*map(jnp.asarray, (Delta, H1, H2, H3, f[1], f[2],
                                             f[4], f[5], f[7])))
    from matlab_code_tpu.problem import ProblemData
    data = ProblemData(
        objects=(X1, X2, X3),
        coupl_trafo=(jnp.asarray(H1), None, None,
                     jnp.asarray(H2), None, None,
                     jnp.asarray(H3), None),
        coupl_trafo2=(None,) * 8)
    opts = AlgOptions(MaxOuterIters=N_ITERS, MaxInnerIters=5)
    init = InitOptions(distr=("rand",) * 8, normalize=True,
                       lambdas_init=((1,) * R1, (1,) * R2, (1,) * R3))
    state = init_coupled(spec, data, init, key=1)
    return spec, data, state, opts, (H1, H2, H3)


def build_problem_type0():
    """Secondary workload: round-1's type-0 exact-coupling config."""
    I, J1, J2, M1, M2, R = 128, 512, 256, 4096, 2048, 16
    spec = ProblemSpec(
        mode_sizes=(I, J1, J2, I, M1, I, M2),
        datasets=(
            DatasetSpec(model="CP", modes=(0, 1, 2), rank=R, weight=1 / 3),
            DatasetSpec(model="CP", modes=(3, 4), rank=R, weight=1 / 3),
            DatasetSpec(model="CP", modes=(5, 6), rank=R, weight=1 / 3)),
        coupling=CouplingSpec(lin_coupled_modes=(1, 0, 0, 1, 0, 1, 0),
                              coupling_type=(0,)),
        constraints=tuple(ConstraintSpec("non-negativity") for _ in range(7)))
    rng = np.random.default_rng(0)
    dt = np.dtype(jnp.result_type(float).name)
    facs = [jnp.asarray(rng.uniform(size=(s, R)).astype(dt))
            for s in spec.mode_sizes]  # small; big tensors built ON DEVICE

    @jax.jit
    def assemble(f):
        return (jnp.einsum("ir,jr,kr->ijk", f[0], f[1], f[2]),
                f[3] @ f[4].T, f[5] @ f[6].T)

    X1, X2, X3 = assemble(facs)
    from matlab_code_tpu.problem import ProblemData
    data = ProblemData(objects=(X1, X2, X3),
                       coupl_trafo=(None,) * 7, coupl_trafo2=(None,) * 7)
    opts = AlgOptions(MaxOuterIters=N_ITERS, MaxInnerIters=5)
    init = InitOptions(distr=("rand",) * 7, normalize=True,
                       lambdas_init=((1,) * R,) * 3)
    state = init_coupled(spec, data, init, key=1)
    return spec, data, state, opts


def bench_tpu(spec, data, state, opts, measure_mttkrp=True):
    proxes, reg_fns = build_proxes(spec)
    step = make_outer_step(spec, opts, proxes, reg_fns, True)
    grams, colnorms = init_cache(spec, state)

    @jax.jit
    def n_steps(state, data, grams, colnorms):
        def body(i, c):
            state, grams, colnorms = c
            state, grams, colnorms, *_ = step(state, data, grams, colnorms)
            return (state, grams, colnorms)
        return jax.lax.fori_loop(0, N_ITERS, body, (state, grams, colnorms))

    out = n_steps(state, data, grams, colnorms)   # compile + warm
    np.asarray(out[0].fac[0])                     # force full host sync
    dt_iter = np.inf                              # best of 3 (noisy tunnel)
    for _ in range(3):
        t0 = time.perf_counter()
        out = n_steps(state, data, grams, colnorms)
        np.asarray(out[0].fac[0])
        dt_iter = min(dt_iter, (time.perf_counter() - t0) / N_ITERS)
    assert bool(jnp.all(jnp.isfinite(out[0].fac[0])))
    if not measure_mttkrp:
        return 1.0 / dt_iter, None, out[0]

    # MTTKRP throughput on the big tensor — loop INSIDE jit with a
    # jnp.sum data dependency between iterations (per-call dispatch on the
    # tunnel is ~0.9 ms and would dominate a per-call timing, CLAUDE.md).
    # NOTE: this tensor (67 MB) is VMEM-resident, so this measures on-chip
    # throughput; the HBM roofline statement lives in docs/ROOFLINE.md
    # (683 GB/s = 83% of peak on a 537 MB tensor).
    X = data.objects[0]
    p0 = spec.datasets[0]
    facs = [out[0].fac[m] for m in p0.modes]
    reps = 50

    @jax.jit
    def mtt_loop(X, facs):
        def body(i, c):
            b, c2, acc = c
            A0 = mttkrp(X, [facs[0], b, c2], 0)
            s = jnp.sum(A0)   # consume ALL of A0 so XLA cannot slice X
            return (b + 1e-30 * s, c2 + 1e-30 * s, acc + s)
        return jax.lax.fori_loop(
            0, reps, body, (facs[1], facs[2], jnp.zeros((), X.dtype)))

    np.asarray(mtt_loop(X, facs)[2])
    t_mtt = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(mtt_loop(X, facs)[2])
        t_mtt = min(t_mtt, (time.perf_counter() - t0) / reps)
    I, J1, J2 = X.shape
    R = p0.rank
    flops = 2 * I * J1 * J2 * R + 2 * I * J1 * R  # contraction chain
    return 1.0 / dt_iter, flops / t_mtt / 1e9, out[0]


def bench_mttkrp_hbm():
    """North-star roofline witness (BASELINE.md: MTTKRP >= 70% of HBM peak):
    mode-0 einsum MTTKRP on an HBM-RESIDENT 537 MB tensor (256,1024,512) f32,
    R=16, generated ON DEVICE.  Methodology per docs/ROOFLINE.md: in-jit
    loop, jnp.sum feedback so XLA can neither hoist nor slice X.  Returns
    (GB/s, pct of 819 GB/s v5e peak)."""
    I, J, K, R = 256, 1024, 512, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    X = jax.random.normal(ks[0], (I, J, K), jnp.float32)
    B = jax.random.normal(ks[1], (J, R), jnp.float32)
    C = jax.random.normal(ks[2], (K, R), jnp.float32)
    np.asarray(X[0, 0, :3])
    reps = 60

    @jax.jit
    def loop(X, B, C):
        def body(i, c):
            B, C, acc = c
            A0 = jnp.einsum("ijk,jr,kr->ir", X, B, C, optimize=True)
            s = jnp.sum(A0)
            return (B + 1e-30 * s, C + 1e-30 * s, acc + s)
        return jax.lax.fori_loop(0, reps, body, (B, C, jnp.float32(0)))

    np.asarray(loop(X, B, C)[2])
    best = np.inf
    # best-of-6 (~0.2 s per trial): the driver artifact must agree with the
    # best-of-3 methodology in docs/ROOFLINE.md within ~2 points; a single
    # slow tunnel sync in a 3-trial min showed up as a 5-point swing in r03
    for _ in range(6):
        t0 = time.perf_counter()
        np.asarray(loop(X, B, C)[2])
        best = min(best, (time.perf_counter() - t0) / reps)
    gbs = X.size * 4 / 1e9 / best
    return gbs, 100.0 * gbs / 819.0


def build_problem_par2():
    """PARAFAC2 production workload (K=512 slices of 256x256, R=32, nonneg
    A/C) — the K-batched ADMM_B_Parafac2 sweep (cmtf_fun_AOADMM.m:509-589)
    at the scale BASELINE.md tracks.  Data generated ON DEVICE (a 134 MB
    host->device pull through the tunnel can take minutes)."""
    from matlab_code_tpu.problem import ProblemData, Parafac2Tensor
    I, J, K, R = 256, 256, 512, 32
    spec = ProblemSpec(
        mode_sizes=(I, (J,) * K, K),
        datasets=(DatasetSpec(model="PAR2", modes=(0, 1, 2), rank=R),),
        coupling=CouplingSpec(lin_coupled_modes=(0, 0, 0), coupling_type=()),
        constraints=(ConstraintSpec("non-negativity"), None,
                     ConstraintSpec("non-negativity")))
    rng = np.random.default_rng(0)
    dt = jnp.result_type(float)
    A = jnp.asarray(rng.uniform(size=(I, R)).astype(dt))
    C = jnp.asarray(rng.uniform(0.5, 1.5, size=(K, R)).astype(dt))
    B = jnp.asarray(rng.standard_normal((K, J, R)).astype(dt))
    X = jax.jit(lambda A, C, B: jnp.einsum("ir,kr,kjr->kij", A, C, B))(
        A, C, B)
    data = ProblemData(
        objects=(Parafac2Tensor(slices=X, mask=jnp.ones((K, J), bool)),),
        coupl_trafo=(None,) * 3, coupl_trafo2=(None,) * 3)
    opts = AlgOptions(MaxOuterIters=100, MaxInnerIters=5)
    init = InitOptions(distr=("rand",) * 3, normalize=True,
                       lambdas_init=((1,) * R,))
    state = init_coupled(spec, data, init, key=1)
    return spec, data, state, opts


# v5e peaks for the roofline bounds: 819 GB/s HBM; 197 TFLOP/s MXU (bf16
# multiply passes — jnp's default matmul precision for f32 arrays on TPU)
PEAK_HBM_B_PER_S = 819e9
PEAK_MXU_FLOP_PER_S = 197e12


def _roofline_bound_us(compiled, n_iters):
    """Per-iteration roofline lower bound (us) for a compiled n_iters-loop
    program, from XLA's own post-fusion cost model: bound = max(FLOPs at
    MXU peak, bytes at HBM peak).

    XLA's HloCostAnalysis visits every loop BODY once regardless of trip
    count, so the fori_loop program's totals already equal ~one outer
    iteration (verified against a hand count for the PAR2 K=512 sweep:
    3 x 2KIJR = 6.4 GFLOP of X-contractions + ~1.9 GFLOP of R-sized
    batched algebra vs 8.09 reported) — with the residual-driven INNER
    ADMM while-bodies also counted once instead of up to MaxInnerIters
    times, which only loosens the lower bound.  'bytes accessed' counts
    each fused op's operands/outputs, so VMEM reuse makes it an
    overestimate of HBM traffic (tightens nothing: the bound stays a
    bound; the printed '% of bound' is regression accountability, not a
    speed-of-light certificate — VERDICT r4 item 5).  Returns (bound_us,
    flops_per_iter, bytes_per_iter) or None when the backend exposes no
    cost analysis.  n_iters is unused (kept for call-site clarity)."""
    del n_iters
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca["flops"])
        byts = float(ca["bytes accessed"])
    except Exception:
        return None
    bound = max(flops / PEAK_MXU_FLOP_PER_S, byts / PEAK_HBM_B_PER_S)
    return bound * 1e6, flops, byts


def bench_par2(spec, data, state, opts, n_iters=100):
    proxes, reg_fns = build_proxes(spec)
    step = make_outer_step(spec, opts, proxes, reg_fns, True)
    grams, colnorms = init_cache(spec, state)

    def n_steps(state, data, grams, colnorms):
        def body(i, c):
            s, g, cn = c
            s, g, cn, *_ = step(s, data, g, cn)
            return (s, g, cn)
        return jax.lax.fori_loop(0, n_iters, body, (state, grams, colnorms))

    jitted = jax.jit(n_steps)
    compiled = jitted.lower(state, data, grams, colnorms).compile()
    bound = _roofline_bound_us(compiled, n_iters)
    out = jitted(state, data, grams, colnorms)
    np.asarray(out[0].fac[0])
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        out = jitted(state, data, grams, colnorms)
        np.asarray(out[0].fac[0])
        best = min(best, (time.perf_counter() - t0) / n_iters)
    assert bool(jnp.all(jnp.isfinite(out[0].fac[0])))
    return 1.0 / best, out[0], bound


def bench_numpy_baseline(spec, data, state, opts, Hs, iters=3):
    """Identical type-4 coupled sweep in pure numpy on host CPU."""
    nb = spec.nb_modes
    facs = [np.asarray(state.fac[m], np.float64) for m in range(nb)]
    Z = [np.asarray(state.constraint_fac[m], np.float64) for m in range(nb)]
    U = [np.asarray(state.constraint_dual_fac[m], np.float64)
         for m in range(nb)]
    Delta = np.asarray(state.coupling_fac[0], np.float64)
    muD = [np.asarray(state.coupling_dual_fac[m], np.float64)
           if state.coupling_dual_fac[m] is not None else None
           for m in range(nb)]
    # rebuild the data tensors on HOST from the same small truth factors —
    # a ~100 MB device->host pull through a degraded tunnel can take minutes
    (tH1, tH2, tH3), tDelta, tf = _flagship_truth()
    Xs = []
    for C, fa, fb in (((tDelta @ tH1), tf[1], tf[2]),
                      ((tDelta @ tH2), tf[4], tf[5])):
        X = np.einsum("ir,jr,kr->ijk", C.astype(np.float64),
                      fa.astype(np.float64), fb.astype(np.float64),
                      optimize=True)
        Xs.append(X / np.linalg.norm(X))
    X3 = (tDelta @ tH3).astype(np.float64) @ tf[7].astype(np.float64).T
    Xs.append(X3 / np.linalg.norm(X3))
    H = {0: Hs[0], 3: Hs[1], 6: Hs[2]}
    grams = [f.T @ f for f in facs]
    datasets = [((0, 1, 2), Xs[0], 1 / 3), ((3, 4, 5), Xs[1], 1 / 3),
                ((6, 7), Xs[2], 1 / 3)]
    coupled = (0, 3, 6)

    def np_mttkrp(X, modes, local):
        if X.ndim == 3:
            sub = "ijk"
            ops = [f"{sub[i]}r" for i in range(3) if i != local]
            eq = f"ijk,{ops[0]},{ops[1]}->{sub[local]}r"
            rest = [facs[m] for i, m in enumerate(modes) if i != local]
            return np.einsum(eq, X, *rest, optimize=True)
        other = modes[1 - local]
        return (X @ facs[other]) if local == 0 else (X.T @ facs[other])

    t0 = time.perf_counter()
    for _ in range(iters):
        # uncoupled constrained modes (cid 0)
        for modes, X, w in datasets:
            for local, m in enumerate(modes):
                if m in coupled:
                    continue
                R = facs[m].shape[1]
                A = w * np_mttkrp(X, modes, local)
                C = np.ones((R, R))
                for i, mm in enumerate(modes):
                    if i != local:
                        C *= grams[mm]
                rho = np.trace(C) / R
                B = w * C + rho * np.eye(R)
                for _inner in range(opts.MaxInnerIters):
                    Ai = A + rho / 2 * (Z[m] - U[m])
                    f = np.linalg.solve(B, Ai.T).T
                    Z[m] = np.maximum(f + U[m], 0)
                    U[m] = U[m] + f - Z[m]
                facs[m] = f
                grams[m] = f.T @ f
        # coupled modes: type-4 ADMM (cmtf_fun_AOADMM.m:904-983)
        pre = {}
        for modes, X, w in datasets:
            for local, m in enumerate(modes):
                if m not in coupled:
                    continue
                R = facs[m].shape[1]
                A = w * np_mttkrp(X, modes, local)
                C = np.ones((R, R))
                for i, mm in enumerate(modes):
                    if i != local:
                        C *= grams[mm]
                rho = np.trace(C) / R
                B = w * C + rho * np.eye(R)   # coupling + constraint terms
                pre[m] = (A, B, rho)
        for _inner in range(opts.MaxInnerIters):
            for m in coupled:
                A, B, rho = pre[m]
                Ai = A + rho / 2 * (Delta @ H[m] - muD[m]) \
                    + rho / 2 * (Z[m] - U[m])
                facs[m] = np.linalg.solve(B, Ai.T).T
            # Delta from normal equations AA = sum rho H H^T
            AA = sum(pre[m][2] * (H[m] @ H[m].T) for m in coupled)
            BB = sum(pre[m][2] * (facs[m] + muD[m]) @ H[m].T
                     for m in coupled)
            Delta = np.linalg.solve(AA.T, BB.T).T
            for m in coupled:
                muD[m] = muD[m] + facs[m] - Delta @ H[m]
                Z[m] = np.maximum(facs[m] + U[m], 0)
                U[m] = U[m] + facs[m] - Z[m]
        for m in coupled:
            grams[m] = facs[m].T @ facs[m]
    return (time.perf_counter() - t0) / iters


# host-CPU numpy sweep measured fresh on THIS host (bench_numpy_baseline,
# 3 iters, 2026-08-20, host-rebuilt data, 2.36 it/s); used verbatim when the
# time-budget gate below trips so the driver artifact always carries a
# non-null vs_baseline.  CONSERVATIVE: this is the fastest measurement seen
# (r02 recorded 0.151 it/s in the TPU-env process), so a fallback UNDERSTATES
# the speedup rather than inflating it.
RECORDED_NP_ITERS_PER_S = 2.36
GOLDEN_PATH = "tests/golden/bench_tpu_digest.npz"


def _final_state_digest(spec, state_out, which):
    """Small, fully host-side digest of a bench run's final state: per-factor
    column norms + per-dataset relative data fit (flagship only, from the
    host-rebuilt truth tensors).  Pulls only the small factor matrices."""
    dig = {}
    for m in range(spec.nb_modes):
        f = np.asarray(state_out.fac[m], np.float64)
        dig[f"{which}_colnorm_{m}"] = np.linalg.norm(f, axis=0)
    if which == "flagship":
        (tH1, tH2, tH3), tDelta, tf = _flagship_truth()
        pairs = [((tDelta @ tH1), (tf[1], tf[2]), (0, 1, 2)),
                 ((tDelta @ tH2), (tf[4], tf[5]), (3, 4, 5)),
                 ((tDelta @ tH3), (tf[7],), (6, 7))]
        for p, (C, fs, modes) in enumerate(pairs):
            if len(fs) == 2:
                X = np.einsum("ir,jr,kr->ijk", C, *[a.astype(np.float64)
                                                    for a in fs],
                              optimize=True)
            else:
                X = C.astype(np.float64) @ fs[0].astype(np.float64).T
            X = X / np.linalg.norm(X)
            est = [np.asarray(state_out.fac[m], np.float64) for m in modes]
            if len(est) == 3:
                Xh = np.einsum("ir,jr,kr->ijk", *est, optimize=True)
            else:
                Xh = est[0] @ est[1].T
            dig[f"{which}_relfit_{p}"] = np.asarray(
                np.linalg.norm(X - Xh) / np.linalg.norm(X))
    return dig


def golden_check(digests):
    """TPU-captured golden (VERDICT r3 item 5): the production f32
    newton/NS-path final-state digest after the bench's 300 flagship (and
    100 PAR2-K=512) in-jit AO iterations, recorded ON the TPU on first run
    and re-verified every round.  Prints one '# golden_check:' line."""
    import os
    if jax.devices()[0].platform == "cpu":
        print("# golden_check: SKIP (cpu backend; golden is TPU-captured)")
        return "SKIP"
    merged = {}
    for d in digests:
        merged.update(d)
    if not os.path.exists(GOLDEN_PATH):
        np.savez(GOLDEN_PATH, **merged)
        print(f"# golden_check: RECORDED {len(merged)} digests -> "
              f"{GOLDEN_PATH}")
        return "RECORDED"
    ref = np.load(GOLDEN_PATH)
    worst, worst_key = 0.0, ""
    missing = [k for k in ref.files if k not in merged]
    for k in ref.files:
        if k not in merged:
            continue
        a, b = np.asarray(merged[k]), np.asarray(ref[k])
        dev = float(np.max(np.abs(a - b) / np.maximum(np.abs(b), 1e-12)))
        if dev > worst:
            worst, worst_key = dev, k
    # f32 production paths re-run on the same chip: converged ADMM factors
    # are stable to the fixpoint accuracy; 2e-2 catches any structural break
    # missing keys mean a bench SEGMENT was skipped by the tunnel-wedge
    # watchdog (its workload never ran this round) — that is PARTIAL
    # coverage, not a numeric failure; FAIL is reserved for real deviation
    if worst >= 2e-2:
        status = "FAIL"
    elif missing:
        status = "PARTIAL (segments skipped by the watchdog)"
    else:
        status = "PASS"
    print(f"# golden_check: {status} (max rel dev {worst:.2e} at "
          f"{worst_key or 'n/a'}; missing {missing or 'none'})")
    return status


# last full measurements on this chip (2026-08-20 run, BENCH log) — used by
# the supervisor as clearly-flagged stand-ins when the axon tunnel wedges
# mid-run (observed: minutes-long stalls, occasionally indefinite — a hung
# child would otherwise leave the driver artifact EMPTY)
RECORDED = {
    "iters_per_s": 2575.147,
    "mttkrp_gflops": 1195.0,
    "mttkrp_gbs": 708.4,
    "mttkrp_pct": 86.5,
    "par2_iters_per_s": 226.2,
    "np_iters_per_s": RECORDED_NP_ITERS_PER_S,
    "iters_per_s_t0": 3871.869,
}


def _save_partial(path, M):
    if not path:
        return
    import os
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(M, f)
    os.replace(tmp, path)


def main_measure(partial_path=None):
    """The actual TPU measurement sequence (run as the supervised child).
    Writes each segment's result to partial_path as soon as it lands."""
    M = {}
    t_start = time.perf_counter()
    dev = jax.devices()[0]
    print(f"# device: {dev}", flush=True)
    spec, data, state, opts, Hs = build_problem()
    print(f"# built problem [{time.perf_counter() - t_start:.0f}s]",
          flush=True)
    iters_per_s, mttkrp_gflops, st_flag = bench_tpu(spec, data, state, opts)
    print(f"# tpu flagship done [{time.perf_counter() - t_start:.0f}s]",
          flush=True)
    M["iters_per_s"] = iters_per_s
    M["mttkrp_gflops"] = mttkrp_gflops
    _save_partial(partial_path, M)
    digests = [_final_state_digest(spec, st_flag, "flagship")]

    # north-star metrics (BASELINE.md): HBM-roofline MTTKRP + PAR2 K=512
    mttkrp_gbs, mttkrp_pct = bench_mttkrp_hbm()
    M["mttkrp_gbs"], M["mttkrp_pct"] = mttkrp_gbs, mttkrp_pct
    _save_partial(partial_path, M)
    print(f"# mttkrp hbm done [{time.perf_counter() - t_start:.0f}s]",
          flush=True)
    if time.perf_counter() - t_start < 420:
        sp2, d2, st2, op2 = build_problem_par2()
        par2_iters_per_s, st_p2, p2_bound = bench_par2(sp2, d2, st2, op2)
        digests.append(_final_state_digest(sp2, st_p2, "par2_k512"))
        del sp2, d2, st2, op2, st_p2
        M["par2_iters_per_s"] = par2_iters_per_s
        if p2_bound is not None:
            M["par2_bound_us"] = p2_bound[0]
            M["par2_flops_per_iter"] = p2_bound[1]
            M["par2_bytes_per_iter"] = p2_bound[2]
        _save_partial(partial_path, M)
        print(f"# par2 k512 done [{time.perf_counter() - t_start:.0f}s]",
              flush=True)

    # full production fit() to convergence on the flagship — the
    # wall-clock-to-tolerance number a reference user cares about
    # (example_script15_realdata.m:101-135 protocol; VERDICT r4 item 9)
    if time.perf_counter() - t_start < 400:
        import dataclasses as _dc
        from matlab_code_tpu.models.solver import fit
        # TimeAtItChunk=0: ONE fused dispatch for the whole fit — each
        # chunk boundary costs a host sync through the axon tunnel
        # (27 ms floor, ~0.4 s when degraded), which would contaminate a
        # wall-clock-to-convergence number; stopping runs on device.
        # Tolerances per the script-15 protocol
        # (example_script15_realdata.m:101-135).  matmul_precision:
        # v5e's default bf16-pass f32 matmuls FLOOR the objective at
        # ~1.3e-2 on this workload (measured: 12000 iters oscillating,
        # every seed tried) — the 3-pass 'float32' path converges to the
        # 1e-4 tolerance in ~630 iterations, so to-tolerance wall clock
        # only exists at this precision (docs/ROOFLINE.md "Matmul
        # precision vs convergence").
        op_fit = _dc.replace(opts, MaxOuterIters=12000, AbsFuncTol=1e-4,
                             OuterRelTol=1e-10, TimeAtItChunk=0,
                             matmul_precision="float32")
        t0 = time.perf_counter()
        _, out_fit = fit(spec, data, state, op_fit, validate=False)
        M["fit_wallclock_s"] = out_fit.time_total
        M["fit_wallclock_total_s"] = time.perf_counter() - t0  # + compile
        M["fit_stop_iter"] = out_fit.OuterIterations
        # a dict exit flag = per-stream tolerance verdicts (converged)
        M["fit_exit"] = ("tolerance" if isinstance(out_fit.exit_flag, dict)
                         else str(out_fit.exit_flag))
        _save_partial(partial_path, M)   # land the cold result BEFORE the
        #                                  warm rerun — a tunnel wedge there
        #                                  must not discard this segment
        # second (warm) run: the first post-compile dispatch carries
        # host->device constant upload + tunnel sync overhead (measured
        # 4.8 s vs 1.0 s warm for the same 630-iteration fit).  Skipped
        # when the cold run burned the full iteration budget anyway.
        if M["fit_exit"] != "maxIterations":
            _, out_warm = fit(spec, data, state, op_fit, validate=False)
            M["fit_wallclock_warm_s"] = out_warm.time_total
        _save_partial(partial_path, M)
        print(f"# fit-to-convergence done "
              f"[{time.perf_counter() - t_start:.0f}s]", flush=True)

    # the host-CPU numpy sweep needs NO tunnel transfers (data rebuilt on
    # host from the small truth factors); ~5 s for 3 iters.
    if time.perf_counter() - t_start < 450:
        t_np = bench_numpy_baseline(spec, data, state, opts, Hs)
        M["np_iters_per_s"] = 1.0 / t_np
        _save_partial(partial_path, M)
        print(f"# numpy baseline done [{time.perf_counter() - t_start:.0f}s]",
              flush=True)

    # secondary workload only if the 590 s driver budget allows
    if time.perf_counter() - t_start < 480:
        spec0, data0, state0, opts0 = build_problem_type0()
        iters_per_s_t0, _, _ = bench_tpu(spec0, data0, state0, opts0,
                                         measure_mttkrp=False)
        M["iters_per_s_t0"] = iters_per_s_t0
        _save_partial(partial_path, M)
        print(f"# secondary type0 done "
              f"[{time.perf_counter() - t_start:.0f}s]", flush=True)

    M["golden"] = golden_check(digests)
    _save_partial(partial_path, M)
    return M


def summarize(M):
    """Print the summary lines + THE one JSON line from a metrics dict,
    substituting clearly-flagged recorded values for missing segments."""
    stale = sorted(set(RECORDED) - set(M))
    vals = {**RECORDED, **{k: v for k, v in M.items() if v is not None}}
    print(f"# mttkrp_gflops_per_s: {vals['mttkrp_gflops']:.1f} (VMEM-class "
          f"shape; the roofline statement is the HBM line below)")
    print(f"# numpy_cpu_iters_per_s: {vals['np_iters_per_s']:.3f}")
    print(f"# secondary_type0_iters_per_s: {vals['iters_per_s_t0']:.3f}")
    print(f"# mttkrp_hbm_gb_per_s: {vals['mttkrp_gbs']:.1f} (537 MB "
          f"HBM-resident X, R=16)")
    print(f"# mttkrp_hbm_bw_pct: {vals['mttkrp_pct']:.1f} (of 819 GB/s "
          f"v5e peak; north star >= 70)")
    print(f"# par2_k512_iters_per_s: {vals['par2_iters_per_s']:.1f} "
          f"(K=512 256x256 slices, R=32, nonneg)")
    if vals.get("par2_bound_us"):
        pct = 100.0 * vals["par2_bound_us"] / (1e6 / vals["par2_iters_per_s"])
        print(f"# par2_k512_pct_of_bound: {pct:.1f} (bound "
              f"{vals['par2_bound_us']:.0f} us/iter = max(XLA-cost "
              f"{vals['par2_flops_per_iter']/1e9:.2f} GFLOP/iter at 197 TF, "
              f"{vals['par2_bytes_per_iter']/1e9:.2f} GB/iter at 819 GB/s); "
              f"post-fusion bytes, conservative — see bench.py "
              f"_roofline_bound_us)")
    if vals.get("fit_wallclock_s") is not None:
        print(f"# fit_wallclock_s: {vals['fit_wallclock_s']:.2f} (full "
              f"production fit() on the flagship, tol 1e-4/1e-10 per the "
              f"script-15 protocol, matmul_precision=float32 — the bf16-"
              f"pass default floors at ~1.3e-2 and never converges — one "
              f"fused dispatch; stopped at iter "
              f"{vals.get('fit_stop_iter')}, exit {vals.get('fit_exit')}; "
              f"warm rerun {vals.get('fit_wallclock_warm_s', 0):.2f}s; "
              f"{vals.get('fit_wallclock_total_s', 0):.0f}s incl. compile)")
    if stale:
        print(f"# STALE segments (tunnel wedge — recorded 2026-08-20 "
              f"values substituted): {stale}")
    rec = {
        "metric": "aoadmm_iters_per_s_eem_nmr_lcms_type4",
        "value": round(vals["iters_per_s"], 3),
        "unit": "outer_iters/s",
        "vs_baseline": round(vals["iters_per_s"] / vals["np_iters_per_s"],
                             2),
        "fresh": "iters_per_s" in M,
    }
    if stale:
        rec["stale_segments"] = stale
    print(json.dumps(rec))


def supervise():
    """Run the measurement sequence in a CHILD process under a hard
    deadline.  The axon tunnel intermittently wedges a blocking device call
    for minutes-to-forever (observed r03/r04: the same program ran in 47 s,
    317 s, and >570 s across same-day attempts); a wedged child would leave
    the driver artifact EMPTY, so the parent (which NEVER initializes the
    TPU backend — the axon claim is lazy, a bare interpreter starts in 2 s)
    kills it at the deadline and emits the partial results + flagged
    recorded stand-ins."""
    import os
    import subprocess
    import sys
    import tempfile
    deadline = float(os.environ.get("BENCH_DEADLINE_S", "540"))
    partial = tempfile.mktemp(prefix="bench_partial_", suffix=".json")
    env = {**os.environ, "BENCH_CHILD": "1", "BENCH_PARTIAL": partial}
    proc = subprocess.Popen([sys.executable, __file__], env=env)
    try:
        proc.wait(timeout=deadline)
    except subprocess.TimeoutExpired:
        proc.kill()
        proc.wait()
        print(f"# WATCHDOG: child exceeded {deadline:.0f}s deadline — "
              f"killed; emitting partial + recorded results", flush=True)
    M = {}
    if os.path.exists(partial):
        try:
            with open(partial) as f:
                M = json.load(f)
        finally:
            os.unlink(partial)
    summarize(M)


def main():
    import os
    import sys
    if os.environ.get("BENCH_CHILD") == "1":
        main_measure(os.environ.get("BENCH_PARTIAL"))
        return
    if "--inline" in sys.argv:       # debugging: no supervisor
        summarize(main_measure())
        return
    supervise()


if __name__ == "__main__":
    main()
