"""Initialization of the solver state (init_coupled_AOADMM_CMTF.m).

Random draws use JAX PRNG keys split in a fixed order (the MATLAB global RNG
stream cannot be replicated; the reference's own seeds only pin its stream).
Spectral ('nvecs') initialization mirrors cmtf_nvecs.m / the per-slice eigs
path for PARAFAC2.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from matlab_code_tpu.problem import (
    ProblemSpec, ProblemData, CP, PAR2, Parafac2Tensor, SparseTensor)
from matlab_code_tpu.options import InitOptions
from matlab_code_tpu.state import SolverState
from matlab_code_tpu.ops.linalg import top_eigvecs
from matlab_code_tpu.ops.tensor import unfold
from matlab_code_tpu.models.solver import build_proxes


def _sampler(distr):
    if callable(distr):
        return distr
    if distr == "rand":
        return lambda key, shape, dt: jax.random.uniform(key, shape, dt)
    if distr == "randn":
        return lambda key, shape, dt: jax.random.normal(key, shape, dt)
    if distr == "rand+0.1":
        return lambda key, shape, dt: jax.random.uniform(key, shape, dt) + 0.1
    raise ValueError(f"Unknown distr {distr!r}")


def _normalize_cols(A):
    return A / jnp.linalg.norm(A, axis=0, keepdims=True)


def _coo_unfolding_gram(X: SparseTensor, shape, mode):
    """Gram U_mode @ U_mode.T of the mode unfolding of a COO tensor without
    densifying (the reference's sptenmat path, cmtf_nvecs.m:41-42).

    Host-side setup work (init runs once per fit): a scipy CSR with rows =
    mode index, cols = linearized rest index, then one sparse-sparse product
    yields the small (I_n, I_n) Gram.  Any consistent column linearization
    gives the same Gram."""
    from scipy.sparse import csr_matrix
    idx = np.asarray(X.indices)
    val = np.asarray(X.values, np.float64)
    rows = idx[:, mode].astype(np.int64)
    rid = np.zeros(len(val), np.int64)
    ncols = 1
    for d in range(len(shape)):
        if d != mode:
            rid = rid * shape[d] + idx[:, d]
            ncols *= int(shape[d])
    S = csr_matrix((val, (rows, rid)), shape=(int(shape[mode]), ncols))
    return np.asarray((S @ S.T).todense())


def cmtf_nvecs(spec: ProblemSpec, data: ProblemData, n: int, r: int):
    """Leading r eigenvectors of the Gram of the concatenated mode-n
    unfoldings of every dataset containing mode n (cmtf_nvecs.m:34-56),
    including the sptenmat path for COO tensors (cmtf_nvecs.m:41-42)."""
    Y = None
    for p, ds in enumerate(spec.datasets):
        if n in ds.modes and ds.model == CP:
            X = data.objects[p]
            if isinstance(X, SparseTensor):
                sizes = tuple(spec.mode_sizes[m] for m in ds.modes)
                G = jnp.asarray(
                    _coo_unfolding_gram(X, sizes, ds.modes.index(n)),
                    dtype=X.values.dtype)
            else:
                U = unfold(jnp.asarray(X), ds.modes.index(n))
                G = U @ U.T
            Y = G if Y is None else Y + G
    if Y is None:
        raise ValueError(f"nvecs: mode {n} not found in any CP dataset")
    return top_eigvecs(Y, r)


def init_coupled(spec: ProblemSpec, data: ProblemData,
                 init_options: InitOptions, key=None,
                 delta_shapes: dict | None = None,
                 dtype=None) -> SolverState:
    """Build a full initial SolverState (factors, ADMM auxiliaries, duals,
    PARAFAC2 P/DeltaB) — init_coupled_AOADMM_CMTF.m:37-169."""
    if key is None:
        key = jax.random.PRNGKey(0)
    if isinstance(key, int):
        key = jax.random.PRNGKey(key)
    dt = dtype or jnp.result_type(float)
    nb = spec.nb_modes
    ncpl = spec.coupling.n_couplings
    P = len(spec.datasets)
    distr = init_options.distr or tuple("rand" for _ in range(nb))
    if len(distr) != nb:
        raise ValueError(
            f"init_options.distr has {len(distr)} entries for {nb} modes")
    # In the reference, lambdas_init only defines the init rank per dataset
    # (init_coupled_AOADMM_CMTF.m:17,52 uses length(lambdas{p}) exclusively);
    # here ranks come from DatasetSpec.rank, so a non-empty lambdas_init
    # must agree with the spec instead of being silently ignored.
    if init_options.lambdas_init:
        li = init_options.lambdas_init
        if len(li) != P:
            raise ValueError(
                f"init_options.lambdas_init has {len(li)} entries for "
                f"{P} datasets")
        for p, lam in enumerate(li):
            if len(lam) != spec.datasets[p].rank:
                raise ValueError(
                    f"init_options.lambdas_init[{p}] has length {len(lam)} "
                    f"but dataset {p} has rank {spec.datasets[p].rank} "
                    "(the reference derives the init rank from "
                    "length(lambdas_init); here DatasetSpec.rank is "
                    "authoritative and they must agree)")

    def draw(m, shape):
        nonlocal key
        key, sub = jax.random.split(key)
        return _sampler(distr[m])(sub, shape, dt)

    def rand(shape):
        nonlocal key
        key, sub = jax.random.split(key)
        return jax.random.uniform(sub, shape, dt)

    fac = [None] * nb
    Pfac = [None] * P
    DeltaB = [None] * P
    mu_DeltaB = [None] * P

    for p, ds in enumerate(spec.datasets):
        R = ds.rank
        for n in ds.modes:
            if ds.model == PAR2 and ds.modes.index(n) == 1:
                K = spec.par2_K(p)
                Jmax = spec.par2_Jmax(p)
                sizes = spec.par2_slice_sizes(p)
                DeltaB[p] = rand((R, R))
                Bs = np.zeros((K, Jmax, R), dtype=dt)
                Ps = np.zeros((K, Jmax, R), dtype=dt)
                mus = np.zeros((K, Jmax, R), dtype=dt)
                for k, J in enumerate(sizes):
                    if init_options.nvecs:
                        M = data.objects[p].slices[k, :, :J].T  # (J, I)
                        Bk = np.asarray(top_eigvecs(M @ M.T, R))
                    else:
                        Bk = np.asarray(draw(n, (J, R)))
                        if init_options.normalize:
                            Bk = Bk / np.linalg.norm(Bk, axis=0, keepdims=True)
                    Bs[k, :J] = Bk
                    Ps[k, :J] = np.eye(J, R)
                    mus[k, :J] = np.asarray(rand((J, R)))
                fac[n] = jnp.asarray(Bs)
                Pfac[p] = jnp.asarray(Ps)
                mu_DeltaB[p] = jnp.asarray(mus)
            elif ds.model == PAR2 and ds.modes.index(n) == 0 and init_options.nvecs:
                # Gram of horizontally concatenated slices (init:54-60);
                # padded columns are zero and add nothing to M M^T.
                Xs = data.objects[p].slices  # (K, I, Jmax)
                Y = jnp.einsum("kij,klj->il", Xs, Xs)
                fac[n] = top_eigvecs(Y, R)
            elif ds.model == PAR2 and ds.modes.index(n) == 2 and init_options.nvecs:
                fac[n] = jnp.ones((spec.mode_sizes[n], R), dt)
            elif init_options.nvecs and ds.model == CP:
                fac[n] = cmtf_nvecs(spec, data, n, R)
            else:
                A = draw(n, (spec.mode_sizes[n], R))
                if init_options.normalize:
                    A = _normalize_cols(A)
                fac[n] = A

    # constraint auxiliaries (init:99-129)
    proxes, _ = build_proxes(spec)
    constraint_fac = [None] * nb
    constraint_dual = [None] * nb
    for p, ds in enumerate(spec.datasets):
        for n in ds.modes:
            if not spec.is_constrained(n):
                continue
            if ds.model == PAR2 and ds.modes.index(n) == 1:
                K = spec.par2_K(p)
                Jmax = spec.par2_Jmax(p)
                sizes = spec.par2_slice_sizes(p)
                R = ds.rank
                Zs = np.zeros((K, Jmax, R), dtype=dt)
                duals = np.zeros((K, Jmax, R), dtype=dt)
                is_tpar2 = spec.constraints[n].kind == "tPARAFAC2"
                for k, J in enumerate(sizes):
                    z = draw(n, (J, R))
                    if not is_tpar2:
                        z = proxes[n](z, 1.0)  # init:110-112
                    Zs[k, :J] = np.asarray(z)
                    duals[k, :J] = np.asarray(rand((J, R)))
                constraint_fac[n] = jnp.asarray(Zs)
                constraint_dual[n] = jnp.asarray(duals)
            else:
                z = draw(n, fac[n].shape)
                constraint_fac[n] = proxes[n](z, 1.0)
                constraint_dual[n] = rand(fac[n].shape)

    # coupling Delta + duals (init:132-169)
    coupling_fac = [None] * ncpl
    coupling_dual = [None] * nb
    for cid in range(1, ncpl + 1):
        cmodes = spec.coupled_modes_of(cid)
        m1 = cmodes[0]
        ctype = spec.coupling.coupling_type[cid - 1]
        H1 = data.coupl_trafo[m1] if data.coupl_trafo else None
        if ctype == 0:
            coupling_fac[cid - 1] = rand(fac[m1].shape)
            for m in cmodes:
                coupling_dual[m] = rand(fac[m1].shape)
        elif ctype == 1:
            shape = (H1.shape[0], fac[m1].shape[-1])
            coupling_fac[cid - 1] = rand(shape)
            for m in cmodes:
                coupling_dual[m] = rand(shape)
        elif ctype == 2:
            shape = (fac[m1].shape[0], H1.shape[1])
            coupling_fac[cid - 1] = rand(shape)
            for m in cmodes:
                coupling_dual[m] = rand(shape)
        elif ctype == 3:
            coupling_fac[cid - 1] = rand((H1.shape[1], fac[m1].shape[-1]))
            for m in cmodes:
                coupling_dual[m] = rand(fac[m].shape)
        elif ctype == 4:
            coupling_fac[cid - 1] = rand((fac[m1].shape[0], H1.shape[0]))
            for m in cmodes:
                coupling_dual[m] = rand(fac[m].shape)
        else:  # 5: needs an explicit Delta shape hint (init:163-167)
            if delta_shapes is None or cid not in delta_shapes:
                raise ValueError(
                    "coupling type 5 requires delta_shapes={cid: (rows, cols)}")
            coupling_fac[cid - 1] = rand(delta_shapes[cid])
            for m in cmodes:
                coupling_dual[m] = rand((delta_shapes[cid][0],
                                         fac[m].shape[-1]))

    return SolverState(
        fac=tuple(fac), constraint_fac=tuple(constraint_fac),
        constraint_dual_fac=tuple(constraint_dual),
        coupling_fac=tuple(coupling_fac),
        coupling_dual_fac=tuple(coupling_dual),
        P=tuple(Pfac), DeltaB=tuple(DeltaB), mu_DeltaB=tuple(mu_DeltaB))
