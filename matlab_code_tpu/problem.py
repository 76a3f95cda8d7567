"""Problem specification: the static structure of a coupled factorization.

Splits the reference's `Z` struct (example_script1:74-82) into
  * ProblemSpec   — static, hashable; resolved at trace time (models, modes,
                    coupling types, constraint kinds, losses, shapes),
  * ProblemData   — a pytree of device arrays (data tensors, missing masks,
                    coupling transformation matrices).

All mode indices are 0-based; coupling ids are 1-based with 0 = uncoupled,
mirroring Z.coupling.lin_coupled_modes (example_script1:32).
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from matlab_code_tpu.ops.prox import ConstraintSpec  # re-export

CP = "CP"
PAR2 = "PAR2"


@dataclass(frozen=True)
class DatasetSpec:
    """One dataset: model type, its global modes, loss, weight, rank."""
    model: str                      # 'CP' | 'PAR2'
    modes: tuple[int, ...]          # global mode ids (0-based)
    rank: int
    loss: str = "Frobenius"
    loss_param: float | None = None
    weight: float = 1.0


@dataclass(frozen=True)
class CouplingSpec:
    """Linear coupling structure (Z.coupling).

    lin_coupled_modes[m] = coupling id of mode m (0 = uncoupled).
    coupling_type[c-1]   = type of coupling id c, in 0..5
                           (0 exact, 1 HC=D, 2 CH=D, 3 C=HD, 4 C=DH, 5 H1C=DH2).
    """
    lin_coupled_modes: tuple[int, ...] = ()
    coupling_type: tuple[int, ...] = ()

    @property
    def n_couplings(self) -> int:
        return max(self.lin_coupled_modes, default=0)


@dataclass(frozen=True)
class ProblemSpec:
    """Static problem structure.  mode_sizes[m] is an int, or a tuple of ints
    for the (possibly ragged) Bk mode of a PARAFAC2 dataset."""
    mode_sizes: tuple
    datasets: tuple[DatasetSpec, ...]
    coupling: CouplingSpec = CouplingSpec()
    constraints: tuple = ()          # per mode: ConstraintSpec | None
    ridge: tuple | None = None       # per mode: float, or None for no ridge

    # ---- derived structure (static) ----
    @property
    def nb_modes(self) -> int:
        return len(self.mode_sizes)

    def which_p(self, m: int) -> int:
        """Dataset index owning mode m (cmtf_fun_AOADMM.m:12-15)."""
        for p, ds in enumerate(self.datasets):
            if m in ds.modes:
                return p
        raise ValueError(f"mode {m} belongs to no dataset")

    def mode_role(self, m: int) -> str:
        """'cp' | 'par2_A' | 'par2_B' | 'par2_C'."""
        p = self.which_p(m)
        ds = self.datasets[p]
        if ds.model == CP:
            return "cp"
        return ("par2_A", "par2_B", "par2_C")[ds.modes.index(m)]

    def mode_rank(self, m: int) -> int:
        return self.datasets[self.which_p(m)].rank

    def par2_K(self, p: int) -> int:
        """Number of slices of PARAFAC2 dataset p."""
        ds = self.datasets[p]
        return len(self.mode_sizes[ds.modes[1]])

    def par2_Jmax(self, p: int) -> int:
        ds = self.datasets[p]
        return max(self.mode_sizes[ds.modes[1]])

    def par2_slice_sizes(self, p: int) -> tuple[int, ...]:
        ds = self.datasets[p]
        return tuple(self.mode_sizes[ds.modes[1]])

    def is_constrained(self, m: int) -> bool:
        return self.constraints and self.constraints[m] is not None

    def coupling_id(self, m: int) -> int:
        if not self.coupling.lin_coupled_modes:
            return 0
        return self.coupling.lin_coupled_modes[m]

    def coupled_modes_of(self, cid: int) -> tuple[int, ...]:
        return tuple(m for m in range(self.nb_modes)
                     if self.coupling_id(m) == cid)

    def coupling_ids(self) -> tuple[int, ...]:
        """unique(lin_coupled_modes) including 0 if any uncoupled mode exists
        (cmtf_fun_AOADMM.m:10)."""
        if not self.coupling.lin_coupled_modes:
            return (0,)
        return tuple(sorted(set(self.coupling.lin_coupled_modes)))

    def has_non_frobenius(self) -> bool:
        return any(ds.loss != "Frobenius" for ds in self.datasets)


@jax.tree_util.register_dataclass
@dataclass
class Parafac2Tensor:
    """Padded ragged PARAFAC2 data: slices (K, I, Jmax), mask (K, Jmax) bool
    (True = real column of slice k)."""
    slices: Any
    mask: Any

    @staticmethod
    def from_list(slice_list, dtype=None):
        K = len(slice_list)
        I = slice_list[0].shape[0]
        Jmax = max(s.shape[1] for s in slice_list)
        dt = dtype or jnp.result_type(*[np.asarray(s).dtype for s in slice_list])
        out = np.zeros((K, I, Jmax), dtype=dt)
        mask = np.zeros((K, Jmax), dtype=bool)
        for k, s in enumerate(slice_list):
            out[k, :, :s.shape[1]] = np.asarray(s)
            mask[k, :s.shape[1]] = True
        return Parafac2Tensor(jnp.asarray(out), jnp.asarray(mask))

    def to_list(self, sizes):
        return [np.asarray(self.slices[k, :, :j]) for k, j in enumerate(sizes)]


@jax.tree_util.register_dataclass
@dataclass
class SparseTensor:
    """COO sparse dense-shaped tensor for CP datasets (the reference's
    Tensor Toolbox `sptensor`).  indices (nnz, ndim) int32, values (nnz,).
    Like the reference, restricted to Frobenius loss and incompatible with
    missing-data masks (cmtf_AOADMM.m:77-79).

    plans: optional per-mode blocked layouts for the Pallas one-hot-MXU
    MTTKRP (ops/sparse_pallas.py; 3-way tensors only) — attach with
    `with_plans()` (fit() does this automatically on TPU).  The plan
    depends only on the sparsity pattern; values are carried in plan order.
    """
    indices: Any
    values: Any
    plans: Any = None

    @property
    def ndim(self):
        return self.indices.shape[1]

    def with_plans(self, shape, block: int = 512):
        """Attach Pallas MTTKRP plans (host-side preprocessing, once per
        sparsity pattern).  shape: the dense mode sizes of this tensor."""
        from matlab_code_tpu.ops.sparse_pallas import build_plans
        if self.ndim != 3:
            return self
        return SparseTensor(self.indices, self.values,
                            build_plans(self.indices, self.values, shape,
                                        block=block))

    @staticmethod
    def from_dense(X, threshold=0.0):
        X = np.asarray(X)
        idx = np.argwhere(np.abs(X) > threshold)
        return SparseTensor(jnp.asarray(idx.astype(np.int32)),
                            jnp.asarray(X[tuple(idx.T)]))

    def to_dense(self, shape):
        out = np.zeros(shape, dtype=np.asarray(self.values).dtype)
        out[tuple(np.asarray(self.indices).T)] = np.asarray(self.values)
        return out


@jax.tree_util.register_dataclass
@dataclass
class ProblemData:
    """Device-array side of the problem (pytree).

    objects[p]: CP -> dense ndarray; PAR2 -> Parafac2Tensor.
    miss[p]:    None or boolean mask, True = OBSERVED entry (CP: same shape as
                the tensor; PAR2: (K, I, Jmax)).  Matches Z.miss semantics
                (cmtf_AOADMM.m:66-121; mask entries are 1 where data exists).
    coupl_trafo[m], coupl_trafo2[m]: None or H / H2 matrices
                (Z.coupling.coupl_trafo_matrices{m}).
    """
    objects: tuple
    miss: tuple = ()
    coupl_trafo: tuple = ()
    coupl_trafo2: tuple = ()

    def __post_init__(self):
        if not self.miss:
            object.__setattr__(self, "miss", tuple(None for _ in self.objects))


def has_missing(data: ProblemData) -> bool:
    return any(m is not None for m in data.miss)


# ---------------------------------------------------------------------------
# validation (port of functions/check_data_input.m)
# ---------------------------------------------------------------------------


def check_data_input(spec: ProblemSpec, data: ProblemData | None = None) -> None:
    """Validate coupling/model shape contracts (check_data_input.m:1-159).

    Raises ValueError on violation.  H-matrix rank/shape rules are checked
    when `data` (with coupl_trafo) is provided.
    """
    nmodes = spec.nb_modes
    seen = [m for ds in spec.datasets for m in ds.modes]
    if sorted(seen) != list(range(nmodes)):
        raise ValueError("Mismatch between mode_sizes and dataset modes")
    cpl = spec.coupling
    if cpl.lin_coupled_modes and len(cpl.lin_coupled_modes) != nmodes:
        raise ValueError("lin_coupled_modes must have one entry per mode")
    if cpl.n_couplings != len(cpl.coupling_type):
        raise ValueError("Mismatch between number of couplings and coupling types")

    if data is not None:
        for p, ds in enumerate(spec.datasets):
            if data.miss[p] is not None and ds.loss != "Frobenius":
                raise ValueError(
                    "Missing data (miss) is only supported for Frobenius "
                    "loss functions")  # cmtf_AOADMM.m:71-74
            if isinstance(data.objects[p], SparseTensor):
                if ds.loss != "Frobenius":
                    raise ValueError(
                        "Sparse tensors are only supported with Frobenius "
                        "loss")  # mirrors the sptensor restrictions
                if data.miss[p] is not None:
                    raise ValueError(
                        "Missing data (miss) not supported for sparse "
                        "tensors")  # cmtf_AOADMM.m:77-79
    for p, ds in enumerate(spec.datasets):
        if ds.model == PAR2:
            szB = spec.mode_sizes[ds.modes[1]]
            if not isinstance(szB, (tuple, list)):
                raise ValueError(
                    f"PAR2 dataset {p}: Bk mode size must be a tuple of slice sizes")
            szC = spec.mode_sizes[ds.modes[2]]
            if szC != len(szB):
                raise ValueError(
                    "size mismatch in PARAFAC2 model between mode C and Bk "
                    f"(dataset {p})")  # check_data_input.m:21-25
            if ds.loss != "Frobenius":
                raise ValueError(
                    "Parafac2 decomposition only implemented for Frobenius loss")
            if spec.coupling_id(ds.modes[1]) != 0:
                raise ValueError(
                    "Coupling in 2. mode (the varying mode) of Parafac2 "
                    "not supported")  # check_data_input.m:31-33
            for k, J in enumerate(szB):
                if J < ds.rank:
                    raise ValueError(
                        f"Rank {ds.rank} larger than slice {k} size {J} of "
                        f"PAR2 dataset {p}")  # cmtf_AOADMM.m:55-65
        # tPARAFAC2 placement (cmtf_AOADMM.m:33-41)
        for m in ds.modes:
            c = spec.constraints[m] if spec.constraints else None
            if c is not None and c.kind == "tPARAFAC2":
                if ds.model != PAR2 or ds.modes.index(m) != 1:
                    raise ValueError(
                        "The tPARAFAC2 constraint can only be imposed on the "
                        "second mode of a PARAFAC2 model")
                if len(set(spec.mode_sizes[m])) > 1:
                    raise ValueError(
                        "tPARAFAC2 requires equal slice sizes (the temporal "
                        "difference ||B_k - B_{k-1}|| is undefined for "
                        "ragged slices)")
        # Ragged Bk slices: row-coupled projections (unimodality, monotone,
        # simplex, TV, l1-ball, ...) run through the size-bucketed slice-wise
        # prox (models/admm.py prox_slicewise_ragged), matching the
        # reference's per-slice Z.prox_operators{m}(B{k}, rho(k)) on the true
        # J_k (cmtf_fun_AOADMM.m:567-578).  The only kinds that cannot work
        # on ragged slices are the ones whose operator is built from a single
        # fixed mode size — the reference constructs their matrix L from
        # sz{m}(1) only (constraints_to_prox.m:62-77), so ragged slices would
        # size-mismatch there too.
        if ds.model == PAR2:
            mB = ds.modes[1]
            c = spec.constraints[mB] if spec.constraints else None
            ragged = len(set(spec.mode_sizes[mB])) > 1
            size_parameterized = {"GL smoothness", "quadratic regularization"}
            if c is not None and ragged and c.kind in size_parameterized:
                raise ValueError(
                    f"Constraint {c.kind!r} on a ragged PARAFAC2 Bk mode is "
                    "not supported: its operator matrix is built for a single "
                    "fixed slice size (the reference builds it from sz(1), "
                    "constraints_to_prox.m:62-77, and would size-mismatch on "
                    "ragged slices as well)")

    def rank_of_mode(m):
        return spec.mode_rank(m)

    for cid in range(1, cpl.n_couplings + 1):
        ctype = cpl.coupling_type[cid - 1]
        cmodes = spec.coupled_modes_of(cid)
        ranks = {rank_of_mode(m) for m in cmodes}
        if ctype in (0, 1, 3) and len(ranks) > 1:
            raise ValueError(
                f"Coupled modes {cmodes} need the same number of components")
        if ctype in (0, 2, 4):
            rows = {spec.mode_sizes[m] for m in cmodes}
            if len(rows) > 1:
                raise ValueError(
                    f"Coupled factor matrices of modes {cmodes} need the same "
                    "number of rows")
        if data is not None and ctype != 0:
            for m in cmodes:
                H = data.coupl_trafo[m] if data.coupl_trafo else None
                if H is None:
                    raise ValueError(f"Coupling matrix for mode {m} is missing")
                H = np.asarray(H)
                if ctype in (1, 5):
                    if np.linalg.matrix_rank(H) < H.shape[0]:
                        raise ValueError(
                            f"Coupling matrix for mode {m} is not right-invertible")
                    if H.shape[1] != spec.mode_sizes[m]:
                        raise ValueError(
                            f"Mismatch between size and columns of H for mode {m}")
                if ctype == 2:
                    if H.shape[0] != rank_of_mode(m):
                        raise ValueError(
                            f"Mismatch between rank and rows of H for mode {m}")
                    if H.shape[1] > rank_of_mode(m):
                        raise ValueError(
                            f"Coupling matrix for mode {m} cannot have more "
                            "columns than rows")
                if ctype == 3 and H.shape[0] != spec.mode_sizes[m]:
                    raise ValueError(
                        f"Mismatch between size and rows of H for mode {m}")
                if ctype == 4 and H.shape[1] != rank_of_mode(m):
                    raise ValueError(
                        f"Mismatch between rank and columns of H for mode {m}")
                if ctype == 5:
                    H2 = data.coupl_trafo2[m] if data.coupl_trafo2 else None
                    if H2 is None:
                        raise ValueError(
                            f"Coupling matrix H2 for mode {m} is missing")
