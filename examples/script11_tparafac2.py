"""Example 11: tPARAFAC2 — PARAFAC2 with temporal smoothness (eta=1000) on
the Bk mode and nonneg C, on temporally smooth synthetic data (the reference
loads shipped .mat fixtures, example_script11_tPARAFAC2.m:20-42; we generate
an equivalent smooth-in-time ground truth).  Constraint spec :73-74, options
:125-135 (AbsFuncTol 1e-14)."""
import sys
sys.path.insert(0, __file__.rsplit("/", 2)[0])

from matlab_code_tpu import (
    ProblemSpec, DatasetSpec, CouplingSpec, ConstraintSpec, AlgOptions)
from examples.common import run


def build(small=False, eta=1000.0):
    K, J, I = (10, 20, 20) if small else (20, 50, 40)
    spec = ProblemSpec(
        mode_sizes=(I, (J,) * K, K),
        datasets=(DatasetSpec(model="PAR2", modes=(0, 1, 2), rank=3),),
        coupling=CouplingSpec(lin_coupled_modes=(0, 0, 0), coupling_type=()),
        constraints=(None, ConstraintSpec("tPARAFAC2", (eta,)),
                     ConstraintSpec("non-negativity")))
    opts = AlgOptions(MaxOuterIters=500 if small else 5000, MaxInnerIters=5,
                      AbsFuncTol=1e-14, OuterRelTol=1e-8)
    return dict(spec=spec, lambdas=[[1, 1, 1]],
                distr=["randn", "rand", "rand+0.1"], opts=opts, key=2,
                bk_style="temporal", noise=0.05)


if __name__ == "__main__":
    run(**build())
