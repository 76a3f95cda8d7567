"""Solver state: the reference's `G` / `Fac` struct as a single pytree
(init_coupled_AOADMM_CMTF.m:41-45, 62-68).

Every field is a tuple indexed by mode / coupling id / dataset, with None in
slots that do not apply; the whole state is jit-carryable and checkpointable
(the reference's warm-start mechanism, cmtf_AOADMM.m:44-45, is `init=state`).

Shapes:
  fac[m]              (I_m, R)           CP mode / PAR2 A mode
                      (K, Jmax, R)       PAR2 Bk mode (zero-padded rows)
                      (K, R)             PAR2 C mode
  constraint_fac[m], constraint_dual_fac[m]: like fac[m] (None if unconstrained)
  coupling_fac[c-1]   Delta of coupling id c (shape depends on type)
  coupling_dual_fac[m] mu_Delta (None if uncoupled)
  P[p]                (K, Jmax, R)       PAR2 only (orthonormal, padded)
  DeltaB[p]           (R, R)
  mu_DeltaB[p]        (K, Jmax, R)
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax


@jax.tree_util.register_dataclass
@dataclass
class SolverState:
    fac: tuple
    constraint_fac: tuple
    constraint_dual_fac: tuple
    coupling_fac: tuple
    coupling_dual_fac: tuple
    P: tuple
    DeltaB: tuple
    mu_DeltaB: tuple

    def replace(self, **kw) -> "SolverState":
        import dataclasses
        return dataclasses.replace(self, **kw)

    @staticmethod
    def empty(nb_modes: int, n_couplings: int, n_datasets: int) -> "SolverState":
        none = lambda n: tuple(None for _ in range(n))
        return SolverState(
            fac=none(nb_modes), constraint_fac=none(nb_modes),
            constraint_dual_fac=none(nb_modes),
            coupling_fac=none(n_couplings), coupling_dual_fac=none(nb_modes),
            P=none(n_datasets), DeltaB=none(n_datasets),
            mu_DeltaB=none(n_datasets))


def tuple_set(t: tuple, i: int, v: Any) -> tuple:
    return t[:i] + (v,) + t[i + 1:]
