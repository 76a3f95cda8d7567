"""Example 12: CP (20x30x40) + PARAFAC2 (20 x 25*30 x 30) exactly coupled on
mode 0/3, with 20% missing-at-random entries in both datasets, recovered by
EM imputation.  Port of example_script12_CP_PAR2_EM.m (sizes :34,
coupling :45, missing setup :115-147)."""
import sys
sys.path.insert(0, __file__.rsplit("/", 2)[0])

from matlab_code_tpu import (
    ProblemSpec, DatasetSpec, CouplingSpec, ConstraintSpec, AlgOptions)
from examples.common import run


def build(small=False):
    K, J = (8, 15) if small else (30, 25)
    spec = ProblemSpec(
        mode_sizes=(20, 30, 40, 20, (J,) * K, K),
        datasets=(DatasetSpec(model="CP", modes=(0, 1, 2), rank=3, weight=0.5),
                  DatasetSpec(model="PAR2", modes=(3, 4, 5), rank=3,
                              weight=0.5)),
        coupling=CouplingSpec(lin_coupled_modes=(1, 0, 0, 1, 0, 0),
                              coupling_type=(0,)),
        constraints=(None,) * 6)
    opts = AlgOptions(MaxOuterIters=400 if small else 4000, MaxInnerIters=5,
                      AbsFuncTol=1e-7, OuterRelTol=1e-8)
    return dict(spec=spec, lambdas=[[1, 1, 1], [1, 1, 1]],
                distr=["randn", "randn", "randn", "randn", "randn",
                       "rand+0.1"],
                opts=opts, key=2, miss_fraction=0.2)


if __name__ == "__main__":
    run(**build())
