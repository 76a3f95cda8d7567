"""Pallas TPU kernel for sparse COO MTTKRP (3-way tensors).

TPU-native replacement for the gather/segment-sum sptensor path
(ops/tensor.mttkrp_sparse; reference: Tensor Toolbox mttkrp on sptensor
data, cmtf_fun_AOADMM.m:97).  The XLA gather path is random-access-bound
(~16 GB/s effective, docs/ROOFLINE.md): the VPU gathers one factor row per
~4 cycles from HBM-class paths.  This kernel reformulates every gather and
the scatter as ONE-HOT MATMULS on the MXU against VMEM-resident factor
tiles:

  * nonzeros are pre-sorted into (j-tile, k-tile) buckets (tile = 128 rows
    of the gathered factors) and chopped into fixed-size blocks, so each
    block's B/C gathers are one-hot matmuls against a single 128-row tile
    selected by scalar-prefetched block metadata;
  * within a bucket, nonzeros are sorted by output row i and blocks are cut
    so each block's outputs fall in one 128-row window of the output; the
    scatter-add is a transposed one-hot matmul accumulated into that window
    of a VMEM-resident output accumulator (D_pad x R, <= 128 KB at the
    bench shapes) — the output is written back to HBM once;
  * per-nonzero metadata is packed into one int32 (7-bit j/k/i-rel local
    offsets) so the COO stream is 8 bytes/nnz.

The plan (sort/bucket/pack) depends only on the sparsity pattern and is
built once per (tensor, mode) with `build_plans`; values are re-ordered
into the plan at build time.  Results match mttkrp_sparse to f32
accumulation order.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128          # gathered-factor tile rows and output window rows


@partial(jax.tree_util.register_dataclass,
         data_fields=("packed", "vals", "btile", "ctile", "rowstart"),
         meta_fields=("block", "dpad", "gather_modes", "out_mode"))
@dataclass
class SparsePlan:
    """Blocked/bucketed layout of one mode's COO stream.

    packed  (nblocks, 1, block) int32: bits 0-6 j_loc, 7-13 k_loc,
            14-20 i_rel (the middle 1-dim keeps streamed BlockSpecs within
            Mosaic's block-shape rules)
    vals    (nblocks, 1, block) float: values in plan order (0 = padding)
    btile   (nblocks,) int32: j-tile index of the block's bucket
    ctile   (nblocks,) int32: k-tile index
    rowstart(nblocks,) int32: output window start (multiple of 8)
    gather_modes: (local mode of B, local mode of C); out_mode: local mode.
    """
    packed: Any
    vals: Any
    btile: Any
    ctile: Any
    rowstart: Any
    block: int
    dpad: int
    gather_modes: tuple
    out_mode: int


def _pad_to(x, n, fill=0):
    if len(x) == n:
        return x
    return np.concatenate([x, np.full(n - len(x), fill, x.dtype)])


def build_plan_mode(indices: np.ndarray, values: np.ndarray, shape,
                    mode: int, block: int = 512,
                    use_native: bool = True) -> SparsePlan:
    """Build the blocked layout for one target mode of a 3-way COO tensor.

    The sort/bucket/chop/pack runs in C++ (native.sparse_plan, 45 s -> 6.7 s
    for all 3 modes at 1e7 nnz) when the native library is available; the
    numpy path below is the golden reference (tests pin exact native ==
    python layout equality)."""
    assert indices.shape[1] == 3, "pallas sparse MTTKRP is 3-way only"
    gm = tuple(ax for ax in range(3) if ax != mode)
    if use_native:
        plan = _build_plan_mode_native(indices, values, shape, mode, gm,
                                       block)
        if plan is not None:
            return plan
    i = indices[:, mode].astype(np.int64)
    j = indices[:, gm[0]].astype(np.int64)
    k = indices[:, gm[1]].astype(np.int64)
    D = int(shape[mode])
    dpad = max(TILE, -(-D // 8) * 8)
    ntk = -(-int(shape[gm[1]]) // TILE)
    jt, kt = j // TILE, k // TILE
    order = np.lexsort((i, kt, jt))
    i, j, k = i[order], j[order], k[order]
    vals = np.asarray(values)[order]
    bucket = (jt[order] * ntk + kt[order]).astype(np.int64)

    # chop each bucket into blocks of `block` nnz, then split any block whose
    # outputs span more than one 128-row window (rare for uniform data)
    starts = np.flatnonzero(np.r_[True, bucket[1:] != bucket[:-1]])
    ends = np.r_[starts[1:], len(bucket)]
    blocks = []          # (lo, hi) nnz ranges, each within one bucket+window
    for lo, hi in zip(starts, ends):
        pos = lo
        while pos < hi:
            cand = min(pos + block, hi)
            rs = min((int(i[pos]) // 8) * 8, dpad - TILE)
            if int(i[cand - 1]) - rs >= TILE:
                cand = pos + int(np.searchsorted(i[pos:cand], rs + TILE))
            blocks.append((pos, cand, rs))
            pos = cand

    nb = len(blocks)
    # (nb, 1, block) so the streamed BlockSpec (1, 1, block) satisfies the
    # Mosaic block-shape rule (last two dims equal array dims / 128-divisible)
    packed = np.zeros((nb, 1, block), np.int32)
    pvals = np.zeros((nb, 1, block), vals.dtype)
    btile = np.zeros(nb, np.int32)
    ctile = np.zeros(nb, np.int32)
    rowstart = np.zeros(nb, np.int32)
    for b, (lo, hi, rs) in enumerate(blocks):
        n = hi - lo
        jl = (j[lo:hi] % TILE).astype(np.int32)
        kl = (k[lo:hi] % TILE).astype(np.int32)
        ir = (i[lo:hi] - rs).astype(np.int32)
        packed[b, 0, :n] = jl | (kl << 7) | (ir << 14)
        pvals[b, 0, :n] = vals[lo:hi]
        btile[b] = j[lo] // TILE
        ctile[b] = k[lo] // TILE
        rowstart[b] = rs
    return SparsePlan(packed=jnp.asarray(packed), vals=jnp.asarray(pvals),
                      btile=jnp.asarray(btile), ctile=jnp.asarray(ctile),
                      rowstart=jnp.asarray(rowstart), block=block, dpad=dpad,
                      gather_modes=gm, out_mode=mode)


def _build_plan_mode_native(indices, values, shape, mode, gm, block):
    """C++ plan builder (native/kernels.cc sparse_plan_build).  Returns None
    when the native library is unavailable or the tile-bucket id would
    overflow its 32-bit key field (astronomically large modes only)."""
    try:
        from native import sparse_plan
    except Exception:
        return None
    D = int(shape[mode])
    dpad = max(TILE, -(-D // 8) * 8)
    ntj = -(-int(shape[gm[0]]) // TILE)
    ntk = -(-int(shape[gm[1]]) // TILE)
    if ntj * ntk >= 2**31:
        return None
    idx = np.ascontiguousarray(indices, np.int32)
    vals = np.asarray(values)
    packed, btile, ctile, rowstart, slots, order = sparse_plan(
        idx, mode, gm[0], gm[1], int(shape[gm[1]]), dpad, block, TILE)
    nb = packed.shape[0]
    pvals = np.zeros((nb, block), vals.dtype)
    pvals.reshape(-1)[slots] = vals[order]
    return SparsePlan(
        packed=jnp.asarray(packed[:, None, :]),
        vals=jnp.asarray(pvals[:, None, :]),
        btile=jnp.asarray(btile), ctile=jnp.asarray(ctile),
        rowstart=jnp.asarray(rowstart), block=block, dpad=dpad,
        gather_modes=gm, out_mode=mode)


def build_plans(indices, values, shape, block: int = 512) -> tuple:
    """Plans for all 3 modes (host-side, once per sparsity pattern)."""
    idx = np.asarray(indices)
    val = np.asarray(values)
    return tuple(build_plan_mode(idx, val, shape, m, block) for m in range(3))


def _kernel(btile_ref, ctile_ref, rs_ref, packed_ref, vals_ref,
            b_ref, c_ref, o_ref):
    """b_ref/c_ref: (S, TILE, R) bf16-SPLIT factor tiles (see _split_tiles):
    the MXU feeds f32 operands as bf16 passes, but a one-hot matmul against
    a bf16-REPRESENTABLE component gathers it exactly, so summing S split
    components recovers the f32 row to ~2^-(9S) relative error instead of
    the ~2^-9 of a single pass.  The scatter splits `contrib` the same way
    in-kernel.  S=1 is the raw fast path."""
    blk = pl.program_id(0)
    S = b_ref.shape[0]
    N = packed_ref.shape[-1]
    acc = o_ref.dtype

    @pl.when(blk == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    code = packed_ref[0, 0]                    # (N,) int32
    jl = code & 0x7F
    kl = (code >> 7) & 0x7F
    ir = (code >> 14) & 0x7F
    lanes = lax.broadcasted_iota(jnp.int32, (N, TILE), 1)
    oh_j = (jl[:, None] == lanes).astype(acc)
    oh_k = (kl[:, None] == lanes).astype(acc)
    bj = jnp.dot(oh_j, b_ref[0], preferred_element_type=acc)
    ck = jnp.dot(oh_k, c_ref[0], preferred_element_type=acc)
    for s in range(1, S):
        bj = bj + jnp.dot(oh_j, b_ref[s], preferred_element_type=acc)
        ck = ck + jnp.dot(oh_k, c_ref[s], preferred_element_type=acc)
    contrib = vals_ref[0, 0][:, None].astype(acc) * bj * ck       # (N, R)
    rows = lax.broadcasted_iota(jnp.int32, (TILE, N), 0)
    oh_iT = (rows == ir[None, :]).astype(acc)
    scat = jnp.zeros_like(o_ref[pl.ds(0, TILE), :])
    rem = contrib
    for s in range(S - 1):
        # split off the top 16 bits (= exactly bf16-representable, fed to
        # the MXU without rounding).  NB a bf16 cast round-trip gets
        # canonicalized away by Mosaic (measured: the scatter then runs as
        # one bf16-fed dot, ~2e-3 error); the bitmask form survives.
        if acc == jnp.float32:
            part = lax.bitcast_convert_type(
                lax.bitcast_convert_type(rem, jnp.uint32)
                & jnp.uint32(0xFFFF0000), acc)
        else:
            part = rem.astype(jnp.bfloat16).astype(acc)
        rem = rem - part
        scat = scat + jnp.dot(oh_iT, part, preferred_element_type=acc)
    scat = scat + jnp.dot(oh_iT, rem, preferred_element_type=acc)
    rs = pl.multiple_of(rs_ref[blk], 8)
    o_ref[pl.ds(rs, TILE), :] = o_ref[pl.ds(rs, TILE), :] + scat


def _split_tiles(F, passes, acc):
    """(Dpad, R) -> (passes, Dpad, R): bf16-representable components whose
    sum is EXACTLY F (the last component carries the unrounded residual, so
    interpret/CPU results are exact at any `passes`; on the MXU only the
    last component is bf16-rounded on feed, ~2^-(9*passes) relative)."""
    if passes == 1:
        return F[None]
    parts = []
    rem = F
    for _ in range(passes - 1):
        if acc == jnp.float32:
            # top-16-bit truncation: exactly bf16-representable and immune
            # to convert-roundtrip canonicalization (see _kernel)
            p = lax.bitcast_convert_type(
                lax.bitcast_convert_type(rem, jnp.uint32)
                & jnp.uint32(0xFFFF0000), acc)
        else:
            p = rem.astype(jnp.bfloat16).astype(acc)
        parts.append(p)
        rem = rem - p
    parts.append(rem)
    return jnp.stack(parts)


@partial(jax.jit, static_argnames=("passes", "interpret"))
def mttkrp_sparse_pallas(plan: SparsePlan, factors: tuple, passes: int = 3,
                         interpret: bool = False) -> jnp.ndarray:
    """MTTKRP into plan.out_mode.  factors: the 3 factor matrices in local
    mode order (the target mode's entry is unused).  Returns (D_mode, R)
    where D_mode = factors[out_mode].shape[0].

    passes: bf16 splits per gather/scatter matmul — 1 = fastest (~2e-3
    relative, the MXU's single-pass bf16 feed), 2 ~ 1e-5, 3 = f32-faithful.
    """
    B = factors[plan.gather_modes[0]]
    C = factors[plan.gather_modes[1]]
    D = factors[plan.out_mode].shape[0]
    R = B.shape[1]
    acc = jnp.promote_types(B.dtype, jnp.float32)

    def padt(F):
        rows = -(-F.shape[0] // TILE) * TILE
        return jnp.pad(F, ((0, rows - F.shape[0]), (0, 0))).astype(acc)

    Bp = _split_tiles(padt(B), passes, acc)
    Cp = _split_tiles(padt(C), passes, acc)
    nb = plan.packed.shape[0]
    N = plan.block
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1, N), lambda b, bt, ct, rs: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda b, bt, ct, rs: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((passes, TILE, R),
                         lambda b, bt, ct, rs: (0, bt[b], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((passes, TILE, R),
                         lambda b, bt, ct, rs: (0, ct[b], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((plan.dpad, R), lambda b, bt, ct, rs: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    flops = (2 * passes + 1) * 2 * nb * N * TILE * R
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.dpad, R), acc),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=plan.packed.size * 8 + plan.dpad * R * 4,
            transcendentals=0),
        interpret=interpret,
    )(plan.btile, plan.ctile, plan.rowstart,
      plan.packed, plan.vals.astype(acc), Bp, Cp)
    return out[:D].astype(B.dtype)
