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


def _reference_masks(data, rng):
    """Replay example_script12's missing-mask construction (:115-147):
    miss_mask(randperm(n, round(0.2*n))) = false with MATLAB's LINEAR
    (column-major) indexing, one call for the CP block and one per PAR2
    slice, then the masked entries of the (already normalized) data are
    set to 0 (:143-147).  randperm consumption per
    utils/matlab_rng.MatlabRNG.randperm (its docstring states the
    anchor-validated scope)."""
    import dataclasses
    import numpy as np
    import jax.numpy as jnp

    def mround(x):                       # MATLAB round: half away from zero
        return int(np.floor(x + 0.5))

    X0 = np.asarray(data.objects[0])
    n = X0.size
    m = np.ones(n, bool)
    m[rng.randperm(n, mround(0.2 * n)) - 1] = False
    mask_cp = m.reshape(X0.shape, order="F")

    Xp = data.objects[1]
    sl = np.asarray(Xp.slices)                     # (K, I, Jmax)
    colmask = np.asarray(Xp.mask)                  # (K, Jmax)
    K, I, _ = sl.shape
    mask_p2 = np.ones(sl.shape, bool)
    for k in range(K):
        J = int(colmask[k].sum())
        nk = I * J
        mk = np.ones(nk, bool)
        mk[rng.randperm(nk, mround(0.2 * nk)) - 1] = False
        mask_p2[k, :, :J] = mk.reshape((I, J), order="F")

    objects = (jnp.asarray(np.where(mask_cp, X0, 0.0)),
               type(Xp)(slices=jnp.asarray(np.where(mask_p2, sl, 0.0)),
                        mask=Xp.mask))
    return dataclasses.replace(
        data, objects=objects,
        miss=(jnp.asarray(mask_cp), jnp.asarray(mask_p2)))


def run_reference(verbose=True):
    """FULL reference-seeded replay of example_script12: data regenerated
    with the BIT-EXACT rng("default") draw sequence of
    create_coupled_data.m (all-randn factors, shift-PARAFAC Bk, noise
    0.05), normalized, then the ~20% missing masks drawn from the SAME
    stream via randperm (example_script12:115-147; index-exact under the
    sort-based construction pinned by the randperm doc anchors — see
    MatlabRNG.randperm for the validated scope), then init on the same
    stream.  EM imputation recovers the held-out entries."""
    from examples.common import run_reference_seeded
    cfg = build()
    return run_reference_seeded(
        cfg["spec"], cfg["lambdas"], cfg["distr"], cfg["opts"],
        noise=0.05, pre_init=_reference_masks, verbose=verbose)


if __name__ == "__main__":
    import os
    if os.environ.get("REFERENCE_REPLAY") == "1":
        run_reference()
    else:
        run(**build())
