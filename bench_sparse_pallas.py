"""Sparse COO MTTKRP: Pallas one-hot-MXU kernel vs the XLA gather path, on
the bench_large workload (1e7 nnz of 2048^3, R=16), real TPU chip.

Methodology per docs/ROOFLINE.md: in-jit loops with factor feedback (a
loop whose MTTKRP depends only on loop-constant factors gets hoisted and
measures nothing), np.asarray host sync, best-of-3.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from matlab_code_tpu.ops import sparse_pallas as sp
from matlab_code_tpu.ops.tensor import mttkrp_sparse

D, NNZ, R = 2048, 10_000_000, 16


def main():
    print(f"# device: {jax.devices()[0]}", flush=True)
    t0 = time.perf_counter()
    rng = np.random.default_rng(0)
    idx = np.unique(rng.integers(0, D, size=(NNZ, 3)).astype(np.int32),
                    axis=0)
    val = rng.uniform(size=len(idx)).astype(np.float32)
    print(f"# nnz={len(idx)} [{time.perf_counter()-t0:.0f}s]", flush=True)
    plans = sp.build_plans(idx, val, (D, D, D), block=512)
    nb = [int(p.packed.shape[0]) for p in plans]
    pad = [b * 512 / len(idx) - 1 for b in nb]
    print(f"# plans built: nblocks={nb} padding={[f'{p:.1%}' for p in pad]} "
          f"[{time.perf_counter()-t0:.0f}s]", flush=True)
    facs = tuple(jnp.asarray(rng.standard_normal((D, R)).astype(np.float32))
                 for _ in range(3))
    idx_d = jnp.asarray(idx)
    val_d = jnp.asarray(val)
    jax.block_until_ready(facs)
    print(f"# data on device [{time.perf_counter()-t0:.0f}s]", flush=True)

    reps = 10

    def timed(fn, *args):
        jfn = jax.jit(fn)
        np.asarray(jfn(*args))
        best = np.inf
        for _ in range(3):
            t1 = time.perf_counter()
            np.asarray(jfn(*args))
            best = min(best, (time.perf_counter() - t1) / reps)
        return best

    def loop_xla(idx_d, val_d, A, B, C):
        def body(i, c):
            A, B, C, acc = c
            out = mttkrp_sparse(idx_d, val_d, [A, B, C], 0, D)
            s = jnp.sum(out)
            return (A, B + 1e-30 * s, C + 1e-30 * s, acc + s)
        return jax.lax.fori_loop(0, reps, body,
                                 (A, B, C, jnp.float32(0)))[3]

    t_x = timed(loop_xla, idx_d, val_d, *facs)
    print(f"xla gather MTTKRP (mode 0):  {t_x*1e3:8.2f} ms", flush=True)
    ref = mttkrp_sparse(idx_d, val_d, list(facs), 0, D)
    ideal = len(idx) * 8 / 819e9   # 8-byte COO stream at HBM peak
    for passes in (1, 2, 3):
        out = sp.mttkrp_sparse_pallas(plans[0], facs, passes=passes)
        err = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))

        def loop_pallas(plan, A, B, C, passes=passes):
            def body(i, c):
                A, B, C, acc = c
                out = sp.mttkrp_sparse_pallas(plan, (A, B, C), passes=passes)
                s = jnp.sum(out)
                return (A, B + 1e-30 * s, C + 1e-30 * s, acc + s)
            return jax.lax.fori_loop(0, reps, body,
                                     (A, B, C, jnp.float32(0)))[3]

        t_p = timed(loop_pallas, plans[0], *facs)
        print(f"pallas passes={passes} (mode 0):   {t_p*1e3:8.2f} ms  "
              f"({t_x/t_p:.1f}x)  rel err {err:.1e}  "
              f"{ideal/t_p:.1%} of stream bound", flush=True)


if __name__ == "__main__":
    main()
