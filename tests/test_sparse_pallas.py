"""Pallas one-hot-MXU sparse MTTKRP (ops/sparse_pallas.py): plan building,
kernel equality vs the gather path, and end-to-end solver parity.

On CPU the kernel runs in Pallas interpret mode (identical semantics to the
Mosaic lowering); the TPU-compiled kernel is additionally cross-checked on
the real chip by bench_sparse_pallas.py.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from matlab_code_tpu import (
    ProblemSpec, DatasetSpec, CouplingSpec, ConstraintSpec, AlgOptions,
    InitOptions)
from matlab_code_tpu.models.init import init_coupled
from matlab_code_tpu.models.solver import fit, attach_sparse_plans
from matlab_code_tpu.ops import sparse_pallas as sp
from matlab_code_tpu.ops.tensor import mttkrp_sparse
from matlab_code_tpu.problem import ProblemData, SparseTensor

rng = np.random.default_rng(3)


def _random_coo(shape, nnz):
    idx = np.unique(
        (rng.integers(0, 1 << 30, size=(nnz, 3)) % np.asarray(shape))
        .astype(np.int32), axis=0)
    val = rng.standard_normal(len(idx))
    return idx, val


@pytest.mark.parametrize("shape", [(300, 257, 129), (64, 64, 64),
                                   (1000, 40, 40)])
def test_kernel_matches_gather(shape):
    idx, val = _random_coo(shape, 20000)
    facs = tuple(jnp.asarray(rng.standard_normal((d, 7))) for d in shape)
    plans = sp.build_plans(idx, val, shape, block=256)
    for m in range(3):
        ref = mttkrp_sparse(jnp.asarray(idx), jnp.asarray(val), list(facs),
                            m, shape[m])
        out = sp.mttkrp_sparse_pallas(plans[m], facs, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-10, atol=1e-12)


def test_block_window_split():
    """A bucket whose nonzeros span more than one 128-row output window must
    be split so every block's scatter stays inside its window: all j,k in
    one 128-tile, i spread over 1000 rows, 300 nnz per 256-block."""
    shape = (1000, 100, 100)
    n = 300
    idx = np.stack([
        np.sort(rng.choice(1000, n, replace=False)).astype(np.int32),
        rng.integers(0, 100, n).astype(np.int32),
        rng.integers(0, 100, n).astype(np.int32)], axis=1)
    val = rng.standard_normal(n)
    plan = sp.build_plan_mode(idx, val, shape, 0, block=256)
    assert plan.packed.shape[0] >= 3     # split happened
    spans = np.asarray(plan.rowstart)
    assert np.all(spans % 8 == 0)
    facs = tuple(jnp.asarray(rng.standard_normal((d, 5))) for d in shape)
    ref = mttkrp_sparse(jnp.asarray(idx), jnp.asarray(val), list(facs),
                        0, shape[0])
    out = sp.mttkrp_sparse_pallas(plan, facs, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-10, atol=1e-12)


def test_fit_pallas_matches_gather():
    """End-to-end: a sparse CP fit through sparse_mttkrp='pallas' follows
    the 'gather' trajectory (same math, different summation order)."""
    shape = (60, 50, 40)
    R = 4
    facs = [rng.uniform(size=(d, R)) for d in shape]
    dense = np.einsum("ir,jr,kr->ijk", *facs)
    dense[rng.uniform(size=shape) > 0.1] = 0.0
    st = SparseTensor.from_dense(dense)
    spec = ProblemSpec(
        mode_sizes=shape,
        datasets=(DatasetSpec(model="CP", modes=(0, 1, 2), rank=R),),
        coupling=CouplingSpec(lin_coupled_modes=(0, 0, 0), coupling_type=()),
        constraints=(ConstraintSpec("non-negativity"),) * 3)
    data = ProblemData(objects=(st,), coupl_trafo=(None,) * 3,
                      coupl_trafo2=(None,) * 3)
    opts = AlgOptions(MaxOuterIters=25, AbsFuncTol=0.0, OuterRelTol=0.0,
                      sparse_mttkrp="gather")
    init = InitOptions(distr=("rand",) * 3, normalize=True,
                       lambdas_init=((1,) * R,))
    state0 = init_coupled(spec, data, init, key=0)
    st_g, out_g = fit(spec, data, state0, opts)

    data_p = attach_sparse_plans(
        spec, data, dataclasses.replace(opts, sparse_mttkrp="pallas"))
    assert data_p.objects[0].plans is not None
    st_p, out_p = fit(spec, data_p, state0,
                      dataclasses.replace(opts, sparse_mttkrp="pallas"))
    np.testing.assert_allclose(np.asarray(out_p.func_val_conv),
                               np.asarray(out_g.func_val_conv),
                               rtol=1e-9, atol=1e-12)
    for m in range(3):
        np.testing.assert_allclose(np.asarray(st_p.fac[m]),
                                   np.asarray(st_g.fac[m]),
                                   rtol=1e-6, atol=1e-8)


def test_plan_value_order_roundtrip():
    """Every nonzero lands in exactly one plan slot (padding is zero)."""
    shape = (200, 150, 90)
    idx, val = _random_coo(shape, 5000)
    plan = sp.build_plan_mode(idx, val, shape, 1, block=128)
    assert float(jnp.sum(plan.vals)) == pytest.approx(float(val.sum()),
                                                      rel=1e-10)
    nnz_slots = int(jnp.sum(plan.vals != 0.0))
    assert nnz_slots == int((val != 0).sum())


def test_native_plan_matches_python():
    """The C++ plan builder (native.sparse_plan, the production path)
    reproduces the numpy golden builder EXACTLY — same blocks, packed codes,
    value order, and metadata — for every target mode, including duplicate
    coordinates (stable-sort tie order matters)."""
    pytest.importorskip("native")
    shape = (300, 1000, 517)
    idx, val = _random_coo(shape, 60_000)
    # inject duplicates to exercise stable tie ordering
    idx = np.concatenate([idx, idx[:500]], axis=0)
    val = np.concatenate([val, rng.standard_normal(500)])
    for mode in range(3):
        a = sp.build_plan_mode(idx, val, shape, mode, use_native=True)
        b = sp.build_plan_mode(idx, val, shape, mode, use_native=False)
        for f in ("packed", "vals", "btile", "ctile", "rowstart"):
            np.testing.assert_array_equal(
                np.asarray(getattr(a, f)), np.asarray(getattr(b, f)),
                err_msg=f"mode {mode} field {f}")
        assert (a.block, a.dpad, a.gather_modes, a.out_mode) == \
               (b.block, b.dpad, b.gather_modes, b.out_mode)
