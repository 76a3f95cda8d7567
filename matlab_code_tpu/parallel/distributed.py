"""Multi-host initialization helper.

On a multi-host TPU slice, call `initialize()` (or jax.distributed.initialize
directly) in every process before building a mesh; `make_global_mesh` then
spans all hosts' devices, and the sharding layouts in parallel/sharding.py
place ICI collectives within a slice and DCN collectives across slices
exactly as jax/XLA derive them from the device order.

This box has a single chip; the multi-host path is exercised structurally by
the 8-virtual-device CPU tests and `__graft_entry__.dryrun_multichip`.
"""
from __future__ import annotations

import jax


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Wrapper over jax.distributed.initialize with TPU auto-detection
    (all-None on Cloud TPU pods auto-configures from the metadata server)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def make_global_mesh(axis: str = "d"):
    """Mesh over every device of every participating process."""
    from matlab_code_tpu.parallel.sharding import make_mesh
    return make_mesh(devices=jax.devices())
