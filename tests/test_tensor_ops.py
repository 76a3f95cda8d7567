import numpy as np
import jax.numpy as jnp

from matlab_code_tpu.ops import tensor as T


rng = np.random.default_rng(0)


def _naive_mttkrp(X, factors, mode):
    n = X.ndim
    R = factors[0].shape[1]
    out = np.zeros((X.shape[mode], R))
    Xm = np.moveaxis(X, mode, 0).reshape(X.shape[mode], -1)
    # khatri-rao of the remaining factors, C-order over remaining modes
    rest = [factors[i] for i in range(n) if i != mode]
    kr = rest[0]
    for f in rest[1:]:
        kr = (kr[:, None, :] * f[None, :, :]).reshape(-1, R)
    return Xm @ kr


def test_mttkrp_3way():
    X = rng.standard_normal((5, 6, 7))
    U = [rng.standard_normal((s, 3)) for s in X.shape]
    for m in range(3):
        got = np.asarray(T.mttkrp(jnp.asarray(X), [jnp.asarray(u) for u in U], m))
        want = _naive_mttkrp(X, U, m)
        np.testing.assert_allclose(got, want, rtol=1e-10)


def test_mttkrp_4way_and_matrix():
    X = rng.standard_normal((4, 5, 6, 3))
    U = [rng.standard_normal((s, 2)) for s in X.shape]
    for m in range(4):
        got = np.asarray(T.mttkrp(jnp.asarray(X), [jnp.asarray(u) for u in U], m))
        np.testing.assert_allclose(got, _naive_mttkrp(X, U, m), rtol=1e-10)
    M = rng.standard_normal((5, 7))
    V = [rng.standard_normal((5, 2)), rng.standard_normal((7, 2))]
    np.testing.assert_allclose(
        np.asarray(T.mttkrp(jnp.asarray(M), [jnp.asarray(v) for v in V], 0)),
        M @ V[1], rtol=1e-10)


def test_ktensor_full():
    U = [rng.standard_normal((4, 2)), rng.standard_normal((5, 2)),
         rng.standard_normal((6, 2))]
    w = np.array([2.0, 0.5])
    want = np.einsum("ir,jr,kr,r->ijk", *U, w)
    got = np.asarray(T.ktensor_full([jnp.asarray(u) for u in U], jnp.asarray(w)))
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_cp_frob_objective_matches_direct():
    U = [rng.standard_normal((4, 2)), rng.standard_normal((5, 2)),
         rng.standard_normal((6, 2))]
    X = np.einsum("ir,jr,kr->ijk", *U) + 0.1 * rng.standard_normal((4, 5, 6))
    znorm = np.sum(X * X)
    direct = np.sum((X - np.einsum("ir,jr,kr->ijk", *U)) ** 2)
    got = float(T.cp_frob_objective(jnp.asarray(X),
                                    [jnp.asarray(u) for u in U],
                                    jnp.asarray(znorm), 1.0))
    np.testing.assert_allclose(got, direct, rtol=1e-8)
