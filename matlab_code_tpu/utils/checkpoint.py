"""Checkpoint / resume for the solver state.

The reference's warm-start mechanism (cmtf_AOADMM.m:44-45: `init` accepts a
full G struct; the returned Fac carries every dual) maps here to saving and
restoring the SolverState pytree; `fit(spec, data, restored_state, options)`
resumes exactly.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from matlab_code_tpu.state import SolverState

_FIELDS = ("fac", "constraint_fac", "constraint_dual_fac", "coupling_fac",
           "coupling_dual_fac", "P", "DeltaB", "mu_DeltaB")


def save_state(path: str, state: SolverState) -> None:
    """Serialize a SolverState to an .npz file (None slots preserved)."""
    arrays = {}
    meta = {}
    for f in _FIELDS:
        t = getattr(state, f)
        meta[f] = len(t)
        for i, x in enumerate(t):
            if x is not None:
                arrays[f"{f}.{i}"] = np.asarray(x)
    arrays["__meta__"] = np.array([meta[f] for f in _FIELDS], dtype=np.int64)
    np.savez(path, **arrays)


def load_state(path: str) -> SolverState:
    with np.load(path) as z:
        lens = z["__meta__"]
        kw = {}
        for f, n in zip(_FIELDS, lens):
            kw[f] = tuple(
                jnp.asarray(z[f"{f}.{i}"]) if f"{f}.{i}" in z else None
                for i in range(int(n)))
    return SolverState(**kw)
