"""Explicit SPMD MTTKRP via shard_map: partial per-shard MTTKRPs reduced
with psum over the ICI mesh axis.

This is the hand-written collective layout of SURVEY.md §2.3 ("shard each
tensor along its longest mode ... partial MTTKRPs reduced over ICI"); the
pjit path in parallel/sharding.py lets XLA derive the same program from
sharding annotations — this module pins it explicitly, which also makes the
communication cost auditable: one psum of an (I_m, R) matrix per mode update.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from matlab_code_tpu.ops.tensor import mttkrp


def make_sharded_mttkrp(mesh: Mesh, axis: str, ndim: int, shard_dim: int,
                        target_mode: int):
    """Build an SPMD mttkrp(X_sharded, factors) for a dense ndim-way tensor
    sharded along `shard_dim`, producing the (replicated) mode-`target_mode`
    MTTKRP.

    If target_mode == shard_dim the partial results are disjoint row blocks
    (all_gather); otherwise each shard holds a partial sum (psum).
    """
    xspec = [None] * ndim
    xspec[shard_dim] = axis
    in_specs = (P(*xspec),
                tuple(P(axis, None) if i == shard_dim else P(None, None)
                      for i in range(ndim)))
    out_spec = P(None, None)

    @partial(shard_map, mesh=mesh, in_specs=in_specs, out_specs=out_spec,
             check_vma=False)
    def f(x_shard, factors):
        local = mttkrp(x_shard, list(factors), target_mode)
        if target_mode == shard_dim:
            return jax.lax.all_gather(local, axis, axis=0, tiled=True)
        return jax.lax.psum(local, axis)

    return f


def build_sharded_mttkrps(spec, data, mesh, axis=None):
    """Explicit-collective MTTKRP implementations for every >=3-way CP
    dataset whose longest mesh-divisible mode can be sharded.

    Returns {(p, target_local_mode): fn(X, factors) -> mttkrp} for use by
    make_outer_step(..., mttkrp_impls=...) — the row-sharded option of
    SURVEY.md §2.3 with its collectives (one psum or tiled all_gather of an
    (I_m, R) matrix per mode update) pinned by hand instead of derived by
    XLA from sharding annotations.
    """
    from matlab_code_tpu.problem import CP
    from matlab_code_tpu.parallel.sharding import (
        choose_cp_shard_mode, DATA_AXIS)
    axis = axis or DATA_AXIS
    n = mesh.devices.size
    impls = {}
    for p, ds in enumerate(spec.datasets):
        if ds.model != CP:
            continue
        X = data.objects[p]
        if getattr(X, "ndim", 0) < 3:
            continue
        local = choose_cp_shard_mode(spec, p, n)
        if local is None:
            continue
        for target in range(X.ndim):
            impls[(p, target)] = make_sharded_mttkrp(
                mesh, axis, X.ndim, local, target)
    return impls
