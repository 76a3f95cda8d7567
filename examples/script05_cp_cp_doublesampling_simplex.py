"""Example 5: CP (50x30x40) + CP (100x70x80) rank 4, type-1 coupling
H C = Delta with a double-sampling-rate selector (every 2nd row of the
100-row factor), column-wise simplex constraint on mode 5.
Port of example_script5_CP_CP_doublesamplingrate_simplex.m
(sizes :26, coupling :37-44, constraint :67)."""
import sys
sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

from matlab_code_tpu import (
    ProblemSpec, DatasetSpec, CouplingSpec, ConstraintSpec, AlgOptions)
from examples.common import run


def build(small=False):
    n1, n2 = 50, 100
    spec = ProblemSpec(
        mode_sizes=(n1, 30, 40, n2, 70, 80),
        datasets=(DatasetSpec(model="CP", modes=(0, 1, 2), rank=4, weight=0.5),
                  DatasetSpec(model="CP", modes=(3, 4, 5), rank=4,
                              weight=0.5)),
        coupling=CouplingSpec(lin_coupled_modes=(1, 0, 0, 1, 0, 0),
                              coupling_type=(1,)),
        constraints=(None, None, None, None, None,
                     ConstraintSpec("simplex column-wise", (1.0,))))
    H0 = np.eye(n1)
    H3 = np.zeros((n1, n2))
    for i in range(n1):
        H3[i, 2 * i] = 1.0
    # mode 5's true factor lives on the simplex (example5simplex:73-77)
    simplex_post = {5: lambda A: A / A.sum(axis=0, keepdims=True)}
    opts = AlgOptions(MaxOuterIters=600 if small else 6000, MaxInnerIters=5,
                      AbsFuncTol=1e-4, OuterRelTol=1e-8)
    return dict(spec=spec, lambdas=[[1] * 4, [1] * 4],
                distr=["rand", "randn", "randn", "rand", "rand", "rand"],
                coupl_trafo=[H0, None, None, H3, None, None],
                mode_post=simplex_post, opts=opts, key=2)


if __name__ == "__main__":
    run(**build())
