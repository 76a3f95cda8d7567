"""Example 13: CP rank 4 (50x30x40) + CP rank 3 (100x70x80), type-5 coupling
H1 C = Delta H2 with a double-sampling H1 and shared-subspace selectors H2
(first 3 of 4 components shared).  Port of
example_script13_CP_CP_doublesamplingrate_partialcoupling.m (coupling
:36-48, constraints :69-72)."""
import sys
sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

from matlab_code_tpu import (
    ProblemSpec, DatasetSpec, CouplingSpec, ConstraintSpec, AlgOptions)
from examples.common import run

NN = ConstraintSpec("non-negativity")


def build(small=False):
    n1, n2 = 50, 100
    spec = ProblemSpec(
        mode_sizes=(n1, 30, 40, n2, 70, 80),
        datasets=(DatasetSpec(model="CP", modes=(0, 1, 2), rank=4, weight=0.5),
                  DatasetSpec(model="CP", modes=(3, 4, 5), rank=3,
                              weight=0.5)),
        coupling=CouplingSpec(lin_coupled_modes=(1, 0, 0, 1, 0, 0),
                              coupling_type=(5,)),
        constraints=(NN, None, None, NN, NN, NN))
    H1_0 = np.eye(n1)
    H1_3 = np.zeros((n1, n2))
    for i in range(n1):
        H1_3[i, 2 * i] = 1.0
    H2_0 = np.eye(4)
    H2_3 = np.vstack([np.eye(3), np.zeros((1, 3))])
    opts = AlgOptions(MaxOuterIters=600 if small else 6000, MaxInnerIters=5,
                      AbsFuncTol=1e-8, OuterRelTol=1e-8)
    return dict(spec=spec, lambdas=[[1] * 4, [1] * 3],
                distr=["rand", "randn", "randn", "rand", "rand", "rand"],
                coupl_trafo=[H1_0, None, None, H1_3, None, None],
                coupl_trafo2=[H2_0, None, None, H2_3, None, None],
                delta_shapes={1: (n1, 4)}, opts=opts, key=2)


if __name__ == "__main__":
    run(**build())
