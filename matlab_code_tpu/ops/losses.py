"""Loss functions: squared Frobenius and the beta-divergence family.

Equivalent of the loss setup in cmtf_AOADMM.m:123-190.  Each non-Frobenius
loss provides elementwise fh(X, M) and gh(X, M) = d fh / d M plus the
data-only constant Znorm_const so that  loss = Znorm_const + sum(fh(X, M)).
"""
from __future__ import annotations

import jax.numpy as jnp

FROBENIUS = "Frobenius"
KL = "KL"
IS = "IS"
BETA = "beta"


def znorm_const(loss: str, X: jnp.ndarray, eps_log: float,
                beta: float | None = None,
                mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Data-only additive constant of the loss (cmtf_AOADMM.m:130-189)."""
    if loss == FROBENIUS:
        Xm = jnp.where(mask, X, 0.0) if mask is not None else X
        return jnp.sum(Xm * Xm)
    if loss == KL:
        return jnp.sum(X * jnp.log(X + eps_log) - X)
    if loss == IS:
        return jnp.sum(-jnp.log(X + eps_log) - 1.0)
    if loss == BETA:
        return jnp.sum(X ** beta) / (beta * (beta - 1.0))
    raise ValueError(f"Unknown loss {loss!r}")


def loss_fh(loss: str, X, M, eps_log: float, beta: float | None = None):
    """Elementwise fh(X, M) (cmtf_AOADMM.m:168,178,185)."""
    if loss == KL:
        return M - X * jnp.log(M + eps_log)
    if loss == IS:
        return X / (M + eps_log) + jnp.log(M + eps_log)
    if loss == BETA:
        return (1.0 / beta) * M ** beta - (1.0 / (beta - 1.0)) * X * M ** (beta - 1.0)
    raise ValueError(f"No fh for loss {loss!r}")


def loss_gh(loss: str, X, M, eps_log: float, beta: float | None = None):
    """Elementwise gradient gh(X, M) wrt M (cmtf_AOADMM.m:169,179,186)."""
    if loss == KL:
        return 1.0 - X / (M + eps_log)
    if loss == IS:
        return -X / ((M + eps_log) ** 2) + 1.0 / (M + eps_log)
    if loss == BETA:
        return M ** (beta - 1.0) - X * M ** (beta - 2.0)
    raise ValueError(f"No gh for loss {loss!r}")


def loss_bounds(loss: str) -> tuple[float, float]:
    """Box bounds for the L-BFGS-B factor subproblem (cmtf_AOADMM.m:170-188)."""
    if loss == FROBENIUS:
        return (-jnp.inf, jnp.inf)
    return (0.0, jnp.inf)
