"""Fused Pallas MTTKRP kernel for 3-way tensors (mode 0).

out[i, r] = sum_{j,k} X[i,j,k] * B[j,r] * C[k,r]

XLA's einsum path contracts in two passes (materializing the (I,J,R)
intermediate in HBM); this kernel streams each X tile through VMEM exactly
once and fuses both contractions:

  per (i-tile, j-tile):   P = reshape(X[i,j,:], (TI*TJ, K)) @ C   (MXU)
                          out[i] += sum_j P * B[j]                 (VPU)

The j-grid axis is innermost, so the out block stays resident in VMEM across
the accumulation.

STATUS: experimental kernel baseline, not wired into the solver.  Round-2
HBM-scale A/B (537 MB X, in-jit loops, docs/ROOFLINE.md): XLA einsum
sustains 683 GB/s (83% of v5e HBM peak) vs 464 GB/s for this kernel's best
tile, so ops/tensor.mttkrp remains the production path — the roof is HBM
bandwidth and XLA is within 1.2x of it.  Kept (with tests) as a baseline.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, b_ref, c_ref, o_ref):
    j = pl.program_id(1)
    TI, TJ, K = x_ref.shape
    R = c_ref.shape[1]
    acc_dt = o_ref.dtype
    x = x_ref[:].reshape(TI * TJ, K)
    p = jnp.dot(x, c_ref[:], preferred_element_type=acc_dt)
    p = p.reshape(TI, TJ, R) * b_ref[:][None, :, :].astype(acc_dt)
    acc = jnp.sum(p, axis=1)

    @pl.when(j == 0)
    def _():
        o_ref[:] = acc

    @pl.when(j > 0)
    def _():
        o_ref[:] = o_ref[:] + acc


@partial(jax.jit, static_argnames=("ti", "tj", "interpret"))
def mttkrp3_mode0(X: jnp.ndarray, B: jnp.ndarray, C: jnp.ndarray,
                  ti: int = 8, tj: int = 64,
                  interpret: bool = False) -> jnp.ndarray:
    """Mode-0 MTTKRP of a dense (I, J, K) tensor; requires I % ti == 0 and
    J % tj == 0 (callers check via `supports`)."""
    I, J, K = X.shape
    R = B.shape[1]
    grid = (I // ti, J // tj)
    flops = 2 * I * J * K * R
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ti, tj, K), lambda i, j: (i, j, 0),
                         memory_space=pl.ANY
                         if interpret else pltpu.VMEM),
            pl.BlockSpec((tj, R), lambda i, j: (j, 0),
                         memory_space=pl.ANY
                         if interpret else pltpu.VMEM),
            pl.BlockSpec((K, R), lambda i, j: (0, 0),
                         memory_space=pl.ANY
                         if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ti, R), lambda i, j: (i, 0),
                               memory_space=pl.ANY
                               if interpret else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (I, R), jnp.promote_types(X.dtype, jnp.float32)),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=X.size * X.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(X, B, C)


def supports(X_shape, R: int, ti: int = 8, tj: int = 64) -> bool:
    if len(X_shape) != 3:
        return False
    I, J, K = X_shape
    vmem = ti * tj * K * 4 + tj * R * 4 + K * R * 4 + ti * R * 4
    return I % ti == 0 and J % tj == 0 and vmem < 12 * 1024 * 1024
