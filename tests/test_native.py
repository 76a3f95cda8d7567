"""C++ native kernels agree with the JAX implementations (golden cross-check)."""
import numpy as np
import jax.numpy as jnp
import pytest

native = pytest.importorskip("native")

from matlab_code_tpu.ops.tv import prox_tv as jax_prox_tv
from matlab_code_tpu.ops.isotonic import project_monotone, project_unimodal
from matlab_code_tpu.ops.prox import project_simplex_cols

rng = np.random.default_rng(11)


def test_tv_matches_jax():
    for n in (7, 20, 51):
        y = rng.standard_normal(n)
        for lam in (0.05, 0.4, 3.0):
            c = native.tv_denoise(y, lam)
            j = np.asarray(jax_prox_tv(jnp.asarray(y)[:, None], lam))[:, 0]
            np.testing.assert_allclose(c, j, atol=1e-10)


def test_tv_cols():
    Y = rng.standard_normal((25, 4))
    C = native.prox_tv(Y, 0.3)
    J = np.asarray(jax_prox_tv(jnp.asarray(Y), 0.3))
    np.testing.assert_allclose(C, J, atol=1e-10)


def test_isotonic_matches_jax():
    for n in (5, 17, 40):
        y = rng.standard_normal(n)
        c = native.isotonic(y)
        j = np.asarray(project_monotone(jnp.asarray(y)[:, None], True))[:, 0]
        np.testing.assert_allclose(c, j, atol=1e-10)
        c = native.isotonic(y, increasing=False)
        j = np.asarray(project_monotone(jnp.asarray(y)[:, None], False))[:, 0]
        np.testing.assert_allclose(c, j, atol=1e-10)


def test_unimodal_matches_jax():
    for n in (6, 15, 33):
        for nonneg in (False, True):
            y = rng.standard_normal(n)
            c = native.unimodal(y, nonneg)
            j = np.asarray(project_unimodal(jnp.asarray(y)[:, None],
                                            nonneg))[:, 0]
            np.testing.assert_allclose(c, j, atol=1e-10)


def test_simplex_matches_jax():
    y = rng.standard_normal(12)
    c = native.simplex_project(y, 1.0)
    j = np.asarray(project_simplex_cols(jnp.asarray(y)[:, None], 1.0))[:, 0]
    np.testing.assert_allclose(c, j, atol=1e-10)


def test_lbfgsb_native_quadratic():
    n = 15
    A = rng.standard_normal((n, n))
    A = A @ A.T + n * np.eye(n)
    b = rng.standard_normal(n)

    def fun(x):
        return 0.5 * x @ A @ x - b @ x, A @ x - b

    x, its = native.lbfgsb(fun, np.zeros(n), 0.0, np.inf, maxiter=300,
                           pgtol=1e-10, factr=10.0)
    from scipy.optimize import minimize
    want = minimize(lambda v: 0.5 * v @ A @ v - b @ v, np.zeros(n),
                    jac=lambda v: A @ v - b, method="L-BFGS-B",
                    bounds=[(0, None)] * n,
                    options={"ftol": 1e-16, "gtol": 1e-12}).x
    np.testing.assert_allclose(x, want, atol=1e-6)
