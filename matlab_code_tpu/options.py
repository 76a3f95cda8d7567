"""Algorithm and initialization options (the reference's `options` and
`init_options` structs, example_script1:108-123 / 44-48).  Static, hashable —
one compiled program per options value."""
from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class LbfgsbOptions:
    """Mirrors the reference lbfgsb_options (example_script7:64-69)."""
    m: int = 5
    maxIts: int = 100
    maxTotalIts: int = 1000
    pgtol: float = 1e-4
    factr: float = 1e-6 / 2.220446049250313e-16  # 1e-6/eps, like the scripts


@dataclass(frozen=True)
class AlgOptions:
    Display: str = "no"                 # 'iter' | 'final' | 'no'
    DisplayIters: int = 10
    MaxOuterIters: int = 2000
    MaxInnerIters: int = 5
    AbsFuncTol: float = 1e-7
    OuterRelTol: float = 1e-8
    innerRelPrTol_coupl: float = 1e-5
    innerRelPrTol_constr: float = 1e-5
    innerRelDualTol_coupl: float = 1e-5
    innerRelDualTol_constr: float = 1e-5
    bsum: bool = False
    bsum_weight: float = 0.0
    eps_log: float = 1e-10
    iter_start_PAR2Bkconstraint: int = 0   # cmtf_fun_AOADMM.m:7-9
    increase_factor_rhoBk: float | None = None  # cmtf_fun_AOADMM.m:196-198
    lbfgsb: LbfgsbOptions = field(default_factory=LbfgsbOptions)
    # share the X x_0 A partial between the mode-1/2 MTTKRPs of 3-way CP
    # sweeps (exact numerics; trades one data pass for an (J,K,R)
    # intermediate — measured slower on v5e for the bench shapes, so off by
    # default; the PARAFAC2 W-reuse is free and always on)
    cp_dimension_tree: bool = False


@dataclass(frozen=True)
class InitOptions:
    """Initialization config (init_coupled_AOADMM_CMTF.m:16-20).

    distr[m] names the sampling distribution of mode m's initial factor /
    auxiliary draws: 'rand' (U[0,1]), 'randn' (N(0,1)), 'rand+0.1'
    (U[0,1]+0.1), matching the function handles used across the example
    scripts.  A callable (key, shape) -> array is also accepted.
    """
    distr: tuple = ()                  # per mode
    normalize: bool = True
    nvecs: bool = False
    lambdas_init: tuple = ()           # per dataset; lengths define ranks
