"""Parity against the reference's SHIPPED data fixtures (data files only,
loaded read-only from /root/reference at test time — no code is used):

  * functions_for_example_scripts/gnd_factors.mat + noisy_dataset.mat —
    script 11's tPARAFAC2 problem with the true generating factors
    (example_script11_tPARAFAC2.m:20-42),
  * data_for_example15/TrueDesign.mat — the real EEM/NMR/LCMS experiment's
    29x5 chemical design matrix (example_script15_realdata.m:138).
"""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from matlab_code_tpu import (
    ProblemSpec, DatasetSpec, CouplingSpec, ConstraintSpec, AlgOptions,
    InitOptions)
from matlab_code_tpu.problem import ProblemData, Parafac2Tensor
from matlab_code_tpu.models.init import init_coupled
from matlab_code_tpu.models.solver import fit
from matlab_code_tpu.utils.score import fms, fms_par2_B

REF = "/root/reference"
FIX = os.path.join(REF, "functions_for_example_scripts")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(FIX, "gnd_factors.mat")),
    reason="reference fixture data not mounted")


def _loadmat(path):
    import scipy.io as sio
    return sio.loadmat(path)


def test_script11_fixture_fms():
    """Replay the exact script-11 configuration (tPARAFAC2 eta=1000, nonneg
    C, ridge [100,0,100], options example_script11:125-135) on the SHIPPED
    noisy dataset via examples.script11_tparafac2.run_real and score Fit +
    FMS against the SHIPPED ground-truth factors."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from examples.script11_tparafac2 import run_real

    res = run_real(fixture_dir=FIX, key=11, verbose=False)
    assert res["out"].exit_flag != "maxIterations"
    # recovery of the true factors from the heavily noisy data (the whole
    # point of the eta=1000 temporal smoothing)
    assert res["fms_A"] > 0.99
    assert res["fms_C"] > 0.99
    assert res["fms_B"] > 0.95
    # Fit% (example_script11:146-153) at least matches what the SHIPPED true
    # factors themselves achieve on this noisy data (the estimate optimizes
    # data fit + smoothness, so it can only trail the truth's fit by the
    # regularization bias)
    g = _loadmat(os.path.join(FIX, "gnd_factors.mat"))
    A_t, B_t, C_t = g["A"], g["B"], g["C"]
    ds = _loadmat(os.path.join(FIX, "noisy_dataset.mat"))["dataset"]
    K = C_t.shape[0]
    num = sum(np.linalg.norm(ds[:, :, k] - A_t @ np.diag(C_t[k]) @ B_t[k].T,
                             "fro") ** 2 for k in range(K))
    den = sum(np.linalg.norm(ds[:, :, k], "fro") ** 2 for k in range(K))
    fit_truth = 100.0 * (1.0 - num / den)
    assert res["fit"] > fit_truth - 1.0, (res["fit"], fit_truth)


def test_script15_truedesign_recovery():
    """Script-15 pipeline (type-4 selector coupling, 3 datasets, all nonneg)
    with the REAL 29x5 TrueDesign.mat as the shared sample-mode ground
    truth; the recovered consensus Delta must match the design."""
    t = _loadmat(os.path.join(REF, "data_for_example15", "TrueDesign.mat"))
    D5 = np.asarray(t["A"], float)                   # (29, 5)
    D5 = D5 / np.linalg.norm(D5, axis=0, keepdims=True)
    S = D5.shape[0]
    rng = np.random.default_rng(15)
    extra = rng.uniform(0.1, 1.0, size=(S, 1))
    extra /= np.linalg.norm(extra)
    Delta_t = np.hstack([D5, extra])                 # (29, 6)

    # selector matrices (example_script15:47-51)
    H0 = np.vstack([np.eye(3), np.zeros((3, 3))])
    H3 = np.vstack([np.eye(5), np.zeros((1, 5))])
    T = np.hstack([np.eye(4), np.zeros((4, 1))])
    H6 = np.vstack([T, np.zeros((1, 5)),
                    np.array([[0, 0, 0, 0, 1.0]])])
    C1, C2, C3 = Delta_t @ H0, Delta_t @ H3, Delta_t @ H6

    sizes = (S, 20, 12, S, 25, 8, S, 30)
    facs = {1: rng.uniform(size=(20, 3)), 2: rng.uniform(size=(12, 3)),
            4: rng.uniform(size=(25, 5)), 5: rng.uniform(size=(8, 5)),
            7: rng.uniform(size=(30, 5))}
    X1 = np.einsum("ir,jr,kr->ijk", C1, facs[1], facs[2])
    X2 = np.einsum("ir,jr,kr->ijk", C2, facs[4], facs[5])
    X3 = C3 @ facs[7].T
    for X in (X1, X2, X3):
        X += 0.01 * np.linalg.norm(X) / np.sqrt(X.size) * \
            rng.standard_normal(X.shape)

    NN = ConstraintSpec("non-negativity")
    spec = ProblemSpec(
        mode_sizes=sizes,
        datasets=(DatasetSpec(model="CP", modes=(0, 1, 2), rank=3,
                              weight=1 / 3),
                  DatasetSpec(model="CP", modes=(3, 4, 5), rank=5,
                              weight=1 / 3),
                  DatasetSpec(model="CP", modes=(6, 7), rank=5,
                              weight=1 / 3)),
        coupling=CouplingSpec(lin_coupled_modes=(1, 0, 0, 1, 0, 0, 1, 0),
                              coupling_type=(4,)),
        constraints=(NN,) * 8)
    norms = [np.linalg.norm(X) for X in (X1, X2, X3)]
    data = ProblemData(
        objects=(jnp.asarray(X1 / norms[0]), jnp.asarray(X2 / norms[1]),
                 jnp.asarray(X3 / norms[2])),
        coupl_trafo=(jnp.asarray(H0), None, None, jnp.asarray(H3), None,
                     None, jnp.asarray(H6), None),
        coupl_trafo2=(None,) * 8)
    init = InitOptions(distr=("rand",) * 8, normalize=False,
                       lambdas_init=((1,) * 3, (1,) * 5, (1,) * 5))
    opts = AlgOptions(MaxOuterIters=4000, MaxInnerIters=5, AbsFuncTol=1e-10,
                      OuterRelTol=1e-10)
    best = None
    for s in range(3):                    # best-of-starts (script15:113-130)
        state0 = init_coupled(spec, data, init, key=s)
        state, out = fit(spec, data, state0, opts)
        if best is None or out.f_tensors < best[1].f_tensors:
            best = (state, out)
    state, out = best

    # recovered consensus Delta columns match the real design (congruence
    # after greedy matching, sign-free since everything is nonneg)
    D_e = np.asarray(state.coupling_fac[0])          # (29, 6)
    D_e = D_e / np.maximum(np.linalg.norm(D_e, axis=0, keepdims=True), 1e-12)
    cong = np.abs(D5.T @ D_e)                        # (5, 6)
    used = set()
    scores = []
    for r in range(5):
        order = np.argsort(-cong[r])
        for c in order:
            if c not in used:
                used.add(c)
                scores.append(cong[r, c])
                break
    assert min(scores) > 0.95, scores


def test_matlab_rng_bit_exact():
    """MatlabRNG reproduces MATLAB's twister rand() streams bit-for-bit:
    rng("default") anchors (the canonical 0.8147... block, column-major)
    and 100k-draw equality with an independently-seeded mt19937ar."""
    from matlab_code_tpu.utils.matlab_rng import MatlabRNG
    A = MatlabRNG("default").rand(2, 2)
    np.testing.assert_allclose(
        A, [[0.814723686393179, 0.126986816293506],
            [0.905791937075619, 0.913375856139019]], rtol=0, atol=1e-15)
    # ground truth: numpy's MT19937 core with init_genrand-injected state
    from numpy.random import MT19937
    mt = np.empty(624, dtype=np.uint64)
    mt[0] = 5489
    for i in range(1, 624):
        mt[i] = (1812433253 * (mt[i - 1] ^ (mt[i - 1] >> 30)) + i) \
            & 0xFFFFFFFF
    bg = MT19937()
    bg.state = {"bit_generator": "MT19937",
                "state": {"key": mt.astype(np.uint32), "pos": 624}}
    raw = bg.random_raw(200000).astype(np.uint64)
    truth = ((raw[0::2] >> 5) * 67108864.0
             + (raw[1::2] >> 6)) / 9007199254740992.0
    np.testing.assert_array_equal(MatlabRNG("default").rand(100000), truth)
    # stream continuity across call boundaries
    r1, r2 = MatlabRNG("default"), MatlabRNG("default")
    a = np.concatenate([r1.rand(7), r1.rand(991), r1.rand(22)])
    np.testing.assert_array_equal(a, r2.rand(1020))


def test_matlab_randn_anchors():
    """MatlabRNG.randn reproduces MATLAB's ziggurat randn on the twister
    stream: the ten documented rng('default') anchor draws (randn/rng doc
    examples; draw 9 = 3.5784 exercises the base-strip multiplier v/f(r))
    at float64-rounding accuracy, with no rejection-path events — the
    anchors certify the fast path that carries ~98.5% of all draws."""
    from matlab_code_tpu.utils.matlab_rng import MatlabRNG
    anchors = np.array([
        0.537667139546100, 1.833885014595086, -2.258846861003648,
        0.862173320368121, 0.318765239858981, -1.307688296305273,
        -0.433592022305684, 0.342624466538650, 3.578396939725760,
        2.769437029884877])
    r = MatlabRNG("default")
    v = r.randn(10)
    np.testing.assert_allclose(v, anchors, rtol=1e-13)
    assert r.slowpath_edge == 0 and r.slowpath_tail == 0
    # randi doc anchor: rng default, randi(10,1,5) -> 9 10 2 10 7
    np.testing.assert_array_equal(
        MatlabRNG("default").randi(10, 1, 5).ravel(order="F"),
        [9, 10, 2, 10, 7])
    # column-major fill shares the stream semantics with rand
    M = MatlabRNG("default").randn(2, 2)
    np.testing.assert_array_equal(M.ravel(order="F"), v[:4])


def test_matlab_randperm_anchors():
    """randperm doc anchors (rng default): randperm(6) = [6 3 5 1 2 4]
    and randperm(8,4) = [6 3 7 8] — both exactly the ascending sort order
    of the canonical 0.8147... rand stream, pinning the sort-based
    construction and its full-n stream consumption."""
    from matlab_code_tpu.utils.matlab_rng import MatlabRNG
    np.testing.assert_array_equal(MatlabRNG("default").randperm(6),
                                  [6, 3, 5, 1, 2, 4])
    np.testing.assert_array_equal(MatlabRNG("default").randperm(8, 4),
                                  [6, 3, 7, 8])
    # consumption: n draws regardless of k — the stream continues where
    # rand(n) would have left it
    r1, r2 = MatlabRNG("default"), MatlabRNG("default")
    r1.randperm(8, 4)
    r2.rand(8)
    np.testing.assert_array_equal(r1.rand(5), r2.rand(5))


def test_matlab_orth_qr_smooth_stages():
    """The deterministic linear-algebra stages the coupled/Bk replays route
    bit-exact draws through: orth() column count + orthonormality +
    range equality, and the smooth-Bk basis construction."""
    from matlab_code_tpu.utils.matlab_rng import MatlabRNG, _matlab_orth
    rng = MatlabRNG(7)
    A = rng.randn(61, 3).reshape((61, 3), order="F")
    Q = _matlab_orth(A)
    assert Q.shape == (61, 3)
    np.testing.assert_allclose(Q.T @ Q, np.eye(3), atol=1e-12)
    # same column space as A
    proj = Q @ (Q.T @ A)
    np.testing.assert_allclose(proj, A, atol=1e-10)
    # rank-deficient input drops columns (MATLAB tol rule)
    B = np.hstack([A[:, :2], A[:, :1]])       # exact repeat -> rank 2
    assert _matlab_orth(B).shape[1] == 2


def test_matlab_randn_stream_and_distribution():
    """Chunk-boundary invariance of the vectorized fast path (the rewind+
    skip bookkeeping around rejection events), agreement with the purely
    sequential single-draw path, and distributional sanity of the canonical
    rejection paths (~1.5% of draws: edge wedges + tail)."""
    from matlab_code_tpu.utils.matlab_rng import MatlabRNG
    big = MatlabRNG(42).randn(120000)
    r2 = MatlabRNG(42)
    parts = [r2.randn(37) for _ in range(120000 // 37)]
    parts.append(r2.randn(120000 % 37))
    np.testing.assert_array_equal(big, np.concatenate(parts))
    r3 = MatlabRNG(42)
    seq = np.array([r3._randn1() for _ in range(500)])
    np.testing.assert_array_equal(big[:500], seq)
    assert r3.slowpath_edge + r3.slowpath_tail > 0  # 500 draws hit some
    # moments + tail mass (P(|x|>r)=2.33e-4 -> ~28 expected in 120k)
    assert abs(big.mean()) < 0.02 and abs(big.std() - 1) < 0.02
    ntail = int((np.abs(big) > 3.6541528853610088).sum())
    assert 5 <= ntail <= 80, ntail
    assert abs((np.abs(big) < 0.6745).mean() - 0.5) < 0.02  # median quartile


def test_script11_reference_seeded_replay():
    """FULL reference-seeded replay of example_script11: the shipped .mat
    data + the BIT-EXACT rng("default") init draw sequence
    (init_coupled_AOADMM_CMTF.m's order, utils/matlab_rng.py) — the solver
    runs on byte-identical inputs to the reference MATLAB run.  The
    trajectory is pinned as a golden (regen: GOLDEN_REGEN=1)."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from examples.script11_tparafac2 import run_real

    res = run_real(fixture_dir=FIX, verbose=False, reference_init=True)
    # the replayed reference run recovers the shipped ground truth
    assert res["fms_A"] > 0.99, res["fms_A"]
    assert res["fms_C"] > 0.99, res["fms_C"]
    assert res["fms_B"] > 0.95, res["fms_B"]
    assert res["out"].exit_flag != "maxIterations"

    golden = os.path.join(os.path.dirname(__file__), "golden",
                          "reference_seeded_script11.npz")
    traj = np.asarray(res["out"].func_val_conv)
    if os.environ.get("GOLDEN_REGEN") == "1" or not os.path.exists(golden):
        np.savez(golden, func_val_conv=traj,
                 iters=np.asarray(res["out"].OuterIterations))
    ref = np.load(golden)
    n = min(len(traj), len(ref["func_val_conv"]))
    np.testing.assert_allclose(traj[:n], ref["func_val_conv"][:n],
                               rtol=1e-9, atol=1e-12)
    assert len(traj) == len(ref["func_val_conv"])


def test_script1_reference_seeded_replay():
    """FULL reference-seeded replay of example_script1 (the flagship
    CP+PAR2 script): data AND init regenerated from one rng("default")
    twister stream in create_coupled_data.m + init_coupled_AOADMM_CMTF.m
    draw order — including the noise tensors MATLAB draws even at level 0
    and the shift-PARAFAC Bk.  Draws are bit-exact on the anchor-verified
    randn fast path; the run's rejection-path events (canonical
    implementation, no published anchors) are counted and pinned so any
    change to that implementation is caught.  Trajectory pinned as a
    golden (regen: GOLDEN_REGEN=1)."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from examples.script01_cp_par2_nonneg import run_reference

    res = run_reference(verbose=False)
    # example_script1's expected outcome: Fit -> ~100%, FMS -> ~1 (:131-152)
    fit_cp, fms_cp = res["report"][0]
    fit_p2, sA, sB, sC = res["report"][1]
    assert fit_cp > 99.99 and fit_p2 > 99.99, (fit_cp, fit_p2)
    assert min(fms_cp, sA, sB, sC) > 0.999, res["report"]
    assert res["out"].exit_flag != "maxIterations"
    assert (res["slowpath_edge"], res["slowpath_tail"]) == (554, 7)

    golden = os.path.join(os.path.dirname(__file__), "golden",
                          "reference_seeded_script1.npz")
    traj = np.asarray(res["out"].func_val_conv)
    if os.environ.get("GOLDEN_REGEN") == "1" or not os.path.exists(golden):
        np.savez(golden, func_val_conv=traj,
                 iters=np.asarray(res["out"].OuterIterations))
    ref = np.load(golden)
    n = min(len(traj), len(ref["func_val_conv"]))
    np.testing.assert_allclose(traj[:n], ref["func_val_conv"][:n],
                               rtol=1e-9, atol=1e-12)
    assert len(traj) == len(ref["func_val_conv"])


@pytest.mark.parametrize("mod,noise_fms,slowpaths,allow_maxiter", [
    ("script02_matrix_par2_nonneg", 0.94, (3641, 54), False),
    ("script06_three_datasets", 0.99, (1970, 23), False),
    ("script08_regular_par2_nonneg", 0.98, (4314, 66), False),
    # script 10: bit-exact draws incl. the piecewise randi/rand overwrite;
    # TV/l2-ball aux-init proxes match MATLAB to float64 rounding only
    ("script10_cp_tv", 0.99, (3190, 45), False),
    # script 9: bit-exact draws (incl. the discarded Bk draw); the normpdf
    # bump data matches MATLAB to float64 rounding (exp/linspace)
    ("script09_par2_unimodality", 0.96, (115, 2), False),
    # round-5 additions: coupled types 1/4/5, ragged orth Bk, smooth Bk,
    # randperm EM masks (draws bit-exact; pinv/orth/qr/svd/lstsq stages at
    # LAPACK-ulp; separate data/init streams for 3 and 13)
    ("script03_matrix_cp_partialcoupling", 0.99, (936, 15), False),
    ("script05_cp_cp_doublesampling_simplex", 0.99, (9138, 166), False),
    ("script14_cp_par2_couplC", 0.999, (730, 10), False),
    ("script13_cp_cp_type5", 0.999, (9178, 156), False),
    ("script04_irregular_par2", 0.99, (3749, 53), False),
    # 1a runs at noise 0.5 with tol 1e-7 — the reference's own 4000-iter
    # cap is reached before AbsFuncTol, so maxIterations IS its outcome
    ("script01a_cp_par2_smooth_l2ball", 0.95, (3584, 62), True),
    ("script12_cp_par2_em", 0.99, (635, 8), False),
])
def test_reference_seeded_replays(mod, noise_fms, slowpaths, allow_maxiter):
    """Reference-seeded replays beyond script 1: the plain-factory type-0
    scripts (2, 6, 8), the specialized-generator scripts replayed via the
    post_uncoupled hook (9 unimodal, 10 piecewise/randi, 5 simplex), the
    coupled-truth scripts (3 type-4, 5/14 type-1 pinv, 13 type-5), the
    ragged-orth (4) and smooth-Bk (1a) generators, and the randperm EM
    masks (12) — data AND init regenerated from the reference's exact
    twister stream(s).  Ground-truth recovery matches the reference's
    expected outcome at its noise level; trajectories pinned as goldens;
    randn rejection-path event counts pinned (canonical slow-path
    implementation change detector)."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    import importlib
    m = importlib.import_module(f"examples.{mod}")
    res = m.run_reference(verbose=False)
    scores = [s for rep in res["report"].values() for s in rep[1:]]
    assert min(scores) > noise_fms, res["report"]
    if not allow_maxiter:
        assert res["out"].exit_flag != "maxIterations"
    assert (res["slowpath_edge"], res["slowpath_tail"]) == slowpaths

    golden = os.path.join(os.path.dirname(__file__), "golden",
                          f"reference_seeded_{mod.split('_')[0]}.npz")
    traj = np.asarray(res["out"].func_val_conv)
    if os.environ.get("GOLDEN_REGEN") == "1" or not os.path.exists(golden):
        np.savez(golden, func_val_conv=traj)
    ref = np.load(golden)
    n = min(len(traj), len(ref["func_val_conv"]))
    np.testing.assert_allclose(traj[:n], ref["func_val_conv"][:n],
                               rtol=1e-9, atol=1e-12)
    assert len(traj) == len(ref["func_val_conv"])


def test_script15_example_seeds_from_truedesign():
    """examples/script15 builds its synthetic ground truth from the REAL
    TrueDesign.mat design when mounted (delta_override fixture hook)."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from examples.script15_realdata import build, _truedesign_delta
    design = _truedesign_delta()
    assert design is not None and design.shape == (29, 6)
    cfg = build(small=True)
    assert cfg["spec"].mode_sizes[0] == 29
    np.testing.assert_array_equal(cfg["delta_override"][1], design)
    # the generated data really carries the design as the coupled truth
    from matlab_code_tpu.utils.datagen import create_coupled_data
    data, Atrue, Delta, _ = create_coupled_data(
        cfg["spec"], lambdas=cfg["lambdas"], noise=0.0,
        distr=cfg["distr"], coupl_trafo=cfg["coupl_trafo"], rng=0,
        delta_override=cfg["delta_override"])
    np.testing.assert_array_equal(np.asarray(Delta[1]), design)
    np.testing.assert_allclose(np.asarray(Atrue[0]),
                               design @ np.asarray(cfg["coupl_trafo"][0]))
    # shape mismatch fails eagerly
    import pytest
    with pytest.raises(ValueError, match="delta_override"):
        create_coupled_data(cfg["spec"], lambdas=cfg["lambdas"], noise=0.0,
                            distr=cfg["distr"],
                            coupl_trafo=cfg["coupl_trafo"], rng=0,
                            delta_override={1: design[:5]})


def test_matlab_replay_type2_type3_draw_order():
    """Coupling types 2 and 3 are the only replay branches no example
    script exercises (scripts cover 0/1/4/5), so pin their draw ORDER —
    data gen (create_coupled_data.m:109-141) and init Delta/duals
    (init_coupled_AOADMM_CMTF.m:148-157) — against an in-test loopy
    transliteration of the MATLAB factories consuming an identical
    twister stream.  The type-2 H is given a zero row so lsqminnorm's
    min-norm solution has an all-zero column and the refill draw
    (create_coupled_data.m:120-126) is on the replayed path too."""
    from matlab_code_tpu.utils.matlab_rng import (
        MatlabRNG, matlab_create_coupled_data, matlab_init_coupled)
    from matlab_code_tpu import ProblemSpec, DatasetSpec, CouplingSpec

    def norm_cols(M):
        return M / np.linalg.norm(M, axis=0, keepdims=True)

    g = np.random.default_rng(7)

    def run_case(ctype, mode_sizes, rank, H_a, H_b, distr, noise):
        spec = ProblemSpec(
            mode_sizes=mode_sizes,
            datasets=(DatasetSpec(model="CP", modes=(0, 1, 2), rank=rank,
                                  weight=0.5),
                      DatasetSpec(model="CP", modes=(3, 4), rank=rank,
                                  weight=0.5)),
            coupling=CouplingSpec(lin_coupled_modes=(1, 0, 0, 1, 0),
                                  coupling_type=(ctype,)),
            constraints=(None,) * 5)
        trafo = [H_a, None, None, H_b, None]
        lambdas = [[1.0] * rank, [1.0] * rank]
        data, A, Delta, rng_out = matlab_create_coupled_data(
            spec, distr, lambdas, noise=noise, normalize_columns=True,
            seed=11, coupl_trafo=trafo)
        state = matlab_init_coupled(spec, distr=["rand"] * 5,
                                    coupl_trafo=trafo, rng=rng_out)

        # --- independent transliteration on a fresh identical stream
        r = MatlabRNG(11)
        draw = (lambda d, m, n:
                r.rand(m, n) if d == "rand" else r.randn(m, n))
        exp_A = [None] * 5
        for modes_p in ((0, 1, 2), (3, 4)):        # :55-75 uncoupled
            for n in modes_p:
                if n in (0, 3):
                    continue
                exp_A[n] = norm_cols(draw(distr[n], mode_sizes[n], rank))
        refills = 0
        if ctype == 2:                             # :109-127
            exp_D = norm_cols(draw(distr[0], mode_sizes[0], H_a.shape[1]))
            for j, H in ((0, H_a), (3, H_b)):
                Aj = np.linalg.lstsq(H.T, exp_D.T, rcond=None)[0].T
                zc = np.flatnonzero(np.abs(Aj).sum(axis=0) == 0)
                if zc.size:
                    Aj[:, zc] = norm_cols(
                        draw(distr[j], mode_sizes[j], zc.size))
                    refills += zc.size
                exp_A[j] = Aj
            assert refills >= 1        # the quirk path really ran
        else:                                      # ctype == 3, :129-140
            exp_D = norm_cols(draw(distr[0], H_a.shape[1], rank))
            for j, H in ((0, H_a), (3, H_b)):
                exp_A[j] = H @ exp_D
        exp_X = []                                 # :152-183 data+noise
        for p, modes_p in enumerate(((0, 1, 2), (3, 4))):
            facs = [exp_A[n] for n in modes_p]
            subs = "abcdef"[: len(facs)]
            eq = ",".join(f"{s}r" for s in subs) + ",r->" + subs
            M = np.einsum(eq, *facs, np.asarray(lambdas[p]))
            N = r.randn(M.size).reshape(M.shape, order="F")
            s = noise * np.linalg.norm(M) / np.linalg.norm(N)
            exp_X.append(M + s * N)
        # init (init:46-96 factors, :148-157 coupling Delta + duals)
        exp_fac = [r.rand(mode_sizes[n], rank) for n in range(5)]
        if ctype == 2:
            exp_cfac = r.rand(mode_sizes[0], H_a.shape[1])
            exp_dual = {m: r.rand(*exp_cfac.shape) for m in (0, 3)}
        else:
            exp_cfac = r.rand(H_a.shape[1], rank)
            exp_dual = {m: r.rand(mode_sizes[m], rank) for m in (0, 3)}

        for n in range(5):
            np.testing.assert_array_equal(A[n], exp_A[n])
            np.testing.assert_array_equal(np.asarray(state.fac[n]),
                                          exp_fac[n])
        np.testing.assert_array_equal(Delta[1], exp_D)
        for p in range(2):
            np.testing.assert_array_equal(np.asarray(data.objects[p]),
                                          exp_X[p])
        np.testing.assert_array_equal(np.asarray(state.coupling_fac[0]),
                                      exp_cfac)
        for m in (0, 3):
            np.testing.assert_array_equal(
                np.asarray(state.coupling_dual_fac[m]), exp_dual[m])
        # streams fully consumed in lockstep
        np.testing.assert_array_equal(rng_out.rand(4, 1), r.rand(4, 1))

    H_a = g.standard_normal((3, 3)) + 2 * np.eye(3)
    H_b = g.standard_normal((3, 3)) + 2 * np.eye(3)
    H_b[1] = 0.0    # zero row -> all-zero lsqminnorm column -> refill
    run_case(2, (10, 8, 9, 10, 7), 3, H_a, H_b,
             ("rand", "randn", "rand", "rand", "randn"), 0.3)
    H_a3 = g.standard_normal((12, 6))
    H_b3 = g.standard_normal((12, 6))
    run_case(3, (12, 8, 9, 12, 7), 2, H_a3, H_b3,
             ("randn", "rand", "randn", "randn", "rand"), 0.2)
