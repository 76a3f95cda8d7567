import numpy as np
import jax.numpy as jnp
import pytest
from scipy.optimize import minimize

from matlab_code_tpu.ops import prox as P
from matlab_code_tpu.ops.isotonic import project_monotone, project_unimodal
from matlab_code_tpu.ops.tv import prox_tv

rng = np.random.default_rng(42)


def _numeric_prox(y, g, bounds=None):
    """Reference minimizer of 1/2||x-y||^2 + g(x) via scipy."""
    res = minimize(lambda x: 0.5 * np.sum((x - y) ** 2) + g(x), y,
                   method="L-BFGS-B", bounds=bounds,
                   options={"maxiter": 2000, "ftol": 1e-15, "gtol": 1e-12})
    return res.x


def test_box():
    x = rng.standard_normal((6, 3))
    got = np.asarray(P.project_box(jnp.asarray(x), 0.0, 1.0))
    np.testing.assert_allclose(got, np.clip(x, 0, 1))


def test_simplex_cols():
    x = rng.standard_normal((10, 4))
    got = np.asarray(P.project_simplex_cols(jnp.asarray(x), 1.0))
    assert np.all(got >= -1e-12)
    np.testing.assert_allclose(got.sum(axis=0), 1.0, rtol=1e-10)
    # optimality vs numeric projection per column
    for c in range(4):
        want = _numeric_prox(x[:, c], lambda v: 0.0,
                             bounds=[(0, None)] * 10)
        # project numeric solution onto sum constraint via scipy SLSQP
        from scipy.optimize import minimize as mz
        res = mz(lambda v: 0.5 * np.sum((v - x[:, c]) ** 2), np.ones(10) / 10,
                 constraints={"type": "eq", "fun": lambda v: v.sum() - 1.0},
                 bounds=[(0, None)] * 10, method="SLSQP",
                 options={"maxiter": 500, "ftol": 1e-14})
        np.testing.assert_allclose(got[:, c], res.x, atol=1e-6)


def test_l1_ball():
    x = rng.standard_normal((8, 3)) * 2
    eta = 1.5
    got = np.asarray(P.project_l1ball_cols(jnp.asarray(x), eta))
    assert np.all(np.abs(got).sum(axis=0) <= eta + 1e-10)
    # a column already inside is unchanged
    x2 = x * 0.01
    got2 = np.asarray(P.project_l1ball_cols(jnp.asarray(x2), eta))
    np.testing.assert_allclose(got2, x2)


def test_l2_ball_and_sphere():
    x = rng.standard_normal((8, 3)) * 3
    got = np.asarray(P.project_l2ball_cols(jnp.asarray(x), 1.0))
    np.testing.assert_allclose(np.linalg.norm(got, axis=0),
                               np.minimum(np.linalg.norm(x, axis=0), 1.0),
                               rtol=1e-10)
    y = np.array([[-1.0, 2.0], [-2.0, 1.0]])
    got = np.asarray(P.prox_normalized_nonneg(jnp.asarray(y)))
    # first column all-negative -> indicator at argmax (row 0)
    np.testing.assert_allclose(got[:, 0], [1.0, 0.0])
    np.testing.assert_allclose(got[:, 1], y[:, 1] / np.linalg.norm(y[:, 1]))


def test_orthonormal():
    x = rng.standard_normal((7, 3))
    got = np.asarray(P.project_orthonormal(jnp.asarray(x)))
    np.testing.assert_allclose(got.T @ got, np.eye(3), atol=1e-10)


def test_soft_hard_threshold():
    x = np.array([-2.0, -0.5, 0.1, 0.7, 3.0])
    np.testing.assert_allclose(np.asarray(P.prox_l1(jnp.asarray(x), 0.6)),
                               np.sign(x) * np.maximum(np.abs(x) - 0.6, 0))
    got = np.asarray(P.prox_l0(jnp.asarray(x), 0.5))  # threshold = 1.0
    np.testing.assert_allclose(got, np.where(np.abs(x) > 1.0, x, 0.0))


def test_group_l2():
    x = rng.standard_normal((6, 2))
    g = 0.8
    got = np.asarray(P.prox_l2_cols(jnp.asarray(x), g))
    for c in range(2):
        n = np.linalg.norm(x[:, c])
        want = x[:, c] * max(0, 1 - g / n)
        np.testing.assert_allclose(got[:, c], want, rtol=1e-10)


def test_monotone_pava():
    y = rng.standard_normal(30)
    got = np.asarray(project_monotone(jnp.asarray(y)[:, None], True))[:, 0]
    assert np.all(np.diff(got) >= -1e-12)
    # optimality: isotonic regression via scipy
    from scipy.optimize import lsq_linear  # noqa: F401 (presence check)
    want = _numeric_isotonic(y)
    np.testing.assert_allclose(got, want, atol=1e-8)
    # non-increasing
    got_dec = np.asarray(project_monotone(jnp.asarray(y)[:, None], False))[:, 0]
    np.testing.assert_allclose(got_dec, -_numeric_isotonic(-y), atol=1e-8)


def _numeric_isotonic(y):
    try:
        from sklearn.isotonic import isotonic_regression
        return isotonic_regression(y)
    except ImportError:
        # PAVA, textbook implementation
        y = list(map(float, y))
        lvl = [[v] for v in y]
        means = [v for v in y]
        i = 0
        while i < len(means) - 1:
            if means[i] > means[i + 1] + 0:
                lvl[i] += lvl[i + 1]
                means[i] = sum(lvl[i]) / len(lvl[i])
                del lvl[i + 1], means[i + 1]
                while i > 0 and means[i - 1] > means[i]:
                    lvl[i - 1] += lvl[i]
                    means[i - 1] = sum(lvl[i - 1]) / len(lvl[i - 1])
                    del lvl[i], means[i]
                    i -= 1
            else:
                i += 1
        out = []
        for block, mval in zip(lvl, means):
            out += [mval] * len(block)
        return np.array(out)


def _numeric_unimodal(y, nonneg):
    """Brute force: try every peak, isotonic each side."""
    n = len(y)
    best, best_err = None, np.inf
    for peak in range(n):
        left = _numeric_isotonic(y[:peak + 1])
        right = -_numeric_isotonic(-y[peak:])
        for cand_left, cand_right in [(left, right)]:
            # enforce shared peak by taking max-consistent merge: simple
            # approach: fit left on [0..peak], right on [peak..n-1],
            # average peak value (works for scoring approximately)
            x = np.concatenate([cand_left[:-1],
                                [max(cand_left[-1], cand_right[0])],
                                cand_right[1:]])
            if nonneg:
                x = np.maximum(x, 0)
            err = np.sum((x - y) ** 2)
            if err < best_err:
                best_err, best = err, x
    return best, best_err


def test_unimodal_properties():
    y = rng.standard_normal(25)
    got = np.asarray(project_unimodal(jnp.asarray(y)[:, None], False))[:, 0]
    d = np.diff(got)
    # unimodal: non-decreasing then non-increasing
    peak = int(np.argmax(got))
    assert np.all(d[:peak] >= -1e-10)
    assert np.all(d[peak:] <= 1e-10)
    # error no worse than the (approximate) brute force
    _, brute_err = _numeric_unimodal(y, False)
    err = np.sum((got - y) ** 2)
    assert err <= brute_err + 1e-6


def test_unimodal_nonneg():
    y = rng.standard_normal(20) - 0.3
    got = np.asarray(project_unimodal(jnp.asarray(y)[:, None], True))[:, 0]
    assert np.all(got >= -1e-12)
    peak = int(np.argmax(got))
    d = np.diff(got)
    assert np.all(d[:peak] >= -1e-10)
    assert np.all(d[peak:] <= 1e-10)


def test_unimodal_already_unimodal():
    y = np.array([0.1, 0.5, 2.0, 1.0, 0.2])
    got = np.asarray(project_unimodal(jnp.asarray(y)[:, None], False))[:, 0]
    np.testing.assert_allclose(got, y, atol=1e-12)


def _tv_kkt_check(y, x, lam, tol=1e-9):
    """Exact optimality certificate for min 1/2||x-y||^2 + lam*TV(x):
    the dual variable s_i = -cumsum(y - x)_i must satisfy |s_i| <= lam,
    s_n == 0, and s_i == lam*sign(x_{i+1}-x_i) wherever the jump is nonzero."""
    r = y - x
    s = -np.cumsum(r)
    assert abs(s[-1]) < tol, f"cumsum residual {s[-1]}"
    assert np.all(np.abs(s[:-1]) <= lam + tol)
    jumps = np.diff(x)
    nz = np.abs(jumps) > 1e-8
    np.testing.assert_allclose(s[:-1][nz], lam * np.sign(jumps[nz]), atol=tol)


def test_tv_prox_kkt_random():
    for trial in range(5):
        y = rng.standard_normal(15 + trial)
        lam = 0.3
        got = np.asarray(prox_tv(jnp.asarray(y)[:, None], lam))[:, 0]
        _tv_kkt_check(y, got, lam)


def test_tv_prox_piecewise_constant():
    y = np.concatenate([np.zeros(5), np.ones(5) * 4, np.zeros(5)])
    got = np.asarray(prox_tv(jnp.asarray(y)[:, None], 0.5))[:, 0]
    # each end plateau (1 jump) moves by lam/5, the middle (2 jumps) by 2lam/5
    np.testing.assert_allclose(
        got, np.concatenate([np.full(5, 0.1), np.full(5, 3.8),
                             np.full(5, 0.1)]), atol=1e-10)
    _tv_kkt_check(y, got, 0.5)


def test_tv_prox_kkt_fuzz():
    # regression: a vmin-clobbering bug in the boundary restart survived the
    # small fixed cases; fuzz across lengths and strengths with the exact
    # optimality certificate
    r = np.random.default_rng(123)
    for n in (5, 9, 23, 51, 101):
        for lam in (0.01, 0.2, 1.0, 5.0):
            y = r.standard_normal(n) * r.uniform(0.5, 3)
            got = np.asarray(prox_tv(jnp.asarray(y)[:, None], lam))[:, 0]
            _tv_kkt_check(y, got, lam, tol=1e-8)


def test_tv_prox_large_lambda_is_mean():
    y = rng.standard_normal(12)
    got = np.asarray(prox_tv(jnp.asarray(y)[:, None], 100.0))[:, 0]
    np.testing.assert_allclose(got, np.full(12, y.mean()), atol=1e-10)


def test_tv_zero_lambda():
    y = rng.standard_normal(10)
    got = np.asarray(prox_tv(jnp.asarray(y)[:, None], 0.0))[:, 0]
    np.testing.assert_allclose(got, y)


def test_t_smoothness_prox_matches_dense_solve():
    K, J, R = 6, 4, 3
    Bs = rng.standard_normal((K, J, R))
    rho = rng.uniform(0.5, 2.0, K)
    eta = 10.0
    got = np.asarray(P.t_smoothness_prox(jnp.asarray(Bs), jnp.asarray(rho), eta))
    # dense block system: (A kron I) x = rho_k B_k with A from the reference
    A = np.zeros((K, K))
    for i in range(K):
        A[i, i] = 4 * eta + rho[i]
        if i > 0:
            A[i, i - 1] = -2 * eta
        if i < K - 1:
            A[i, i + 1] = -2 * eta
    A[0, 0] -= 2 * eta
    A[-1, -1] -= 2 * eta
    rhs = (rho[:, None, None] * Bs).reshape(K, -1)
    want = np.linalg.solve(A, rhs).reshape(K, J, R)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-10)


def test_quadratic_prox():
    n = 12
    L = np.asarray(P.gl_smoothness_matrix(n))
    eta, rho = 0.7, 2.0
    prox, reg = P.make_quadratic_prox(jnp.asarray(L), eta)
    x = rng.standard_normal((n, 3))
    got = np.asarray(prox(jnp.asarray(x), rho))
    want = np.linalg.solve(2 * eta / rho * L + np.eye(n), x)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(float(reg(jnp.asarray(x))),
                               eta * np.trace(x.T @ L @ x), rtol=1e-10)


@pytest.mark.parametrize("kind,params", [
    ("non-negativity", ()),
    ("box", (-0.5, 0.5)),
    ("simplex column-wise", (1.0,)),
    ("simplex row-wise", (2.0,)),
    ("non-decreasing", ()),
    ("non-increasing", ()),
    ("unimodality", (True,)),
    ("l1-ball", (1.0,)),
    ("l2-ball", (1.0,)),
    ("non-negative l2-ball", (1.0,)),
    ("non-negative l2-sphere", (1.0,)),
    ("orthonormal", ()),
    ("l1 regularization", (0.1,)),
    ("l0 regularization", (0.1,)),
    ("l2 regularization", (0.1,)),
    ("ridge", (0.1,)),
    ("quadratic regularization", (0.1,)),
    ("GL smoothness", (0.1,)),
    ("TV regularization", (0.1,)),
    ("tPARAFAC2", (0.1,)),
    ("custom", ()),
])
def test_make_prox_all_kinds_run(kind, params):
    kw = {}
    if kind == "quadratic regularization":
        kw["matrix"] = np.asarray(P.gl_smoothness_matrix(8))
    if kind == "custom":
        kw["fns"] = ((lambda x, rho: jnp.clip(x, 0.0)),
                     (lambda x: jnp.sum(x * x)))
    spec = P.ConstraintSpec(kind=kind, params=params, **kw)
    prox, reg = P.make_prox(spec, mode_size=8)
    # tPARAFAC2's joint prox acts on the stacked (K, J, R) Bk slices with a
    # per-slice rho vector (cmtf_fun_AOADMM.m:553-565)
    shape = (5, 8, 3) if kind == "tPARAFAC2" else (8, 3)
    rho = jnp.full((5,), 2.0) if kind == "tPARAFAC2" else 2.0
    x = jnp.asarray(rng.standard_normal(shape))
    out = prox(x, rho)
    assert out.shape == x.shape
    assert np.all(np.isfinite(np.asarray(out)))
    if reg is not None:
        assert np.isfinite(float(reg(x)))


def test_make_prox_parametrization_covers_every_known_kind():
    """Guard against KNOWN_CONSTRAINT_KINDS and make_prox's dispatch chain
    drifting apart: the parametrized runner above must exercise every kind
    the eager validator admits."""
    covered = {kind for (kind, _params) in
               test_make_prox_all_kinds_run.pytestmark[0].args[1]}
    assert covered == set(P.KNOWN_CONSTRAINT_KINDS)


def test_constraint_spec_rejects_unknown_kind_eagerly():
    """A typo'd constraint kind fails at spec CONSTRUCTION, not at trace
    time deep inside fit() (constraints_to_prox.m:89-91 errors up front).
    Kind-specific operands (custom fns, quadratic L) are required eagerly
    too."""
    import pytest
    from matlab_code_tpu import ConstraintSpec
    with pytest.raises(ValueError, match="Unknown constraint kind"):
        ConstraintSpec("temporal smoothness (tPARAFAC2)", (0.1,))
    with pytest.raises(ValueError, match="custom"):
        ConstraintSpec("custom")
    with pytest.raises(ValueError, match="quadratic regularization"):
        ConstraintSpec("quadratic regularization", (1.0,))
    # every documented kind still constructs (with its required operands)
    from matlab_code_tpu.ops.prox import KNOWN_CONSTRAINT_KINDS
    for k in KNOWN_CONSTRAINT_KINDS:
        if k == "custom":
            ConstraintSpec(k, fns=((lambda x, rho: x),))
        elif k == "quadratic regularization":
            ConstraintSpec(k, (1.0,), matrix=np.eye(4))
        else:
            ConstraintSpec(k, (1.0,))
