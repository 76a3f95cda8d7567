"""MTTKRP roofline microbenchmark — methodology per docs/ROOFLINE.md:

  * loops INSIDE jit (the tunnel has ~0.9 ms/dispatch and a ~27 ms host
    sync floor; short per-call timings are meaningless),
  * a jnp.sum(result) feedback into the loop carry so XLA can neither hoist
    the contraction nor slice the tensor (an A0[0,0] dependency lets XLA
    slice X down to one row),
  * an HBM-RESIDENT tensor (537 MB; anything <= ~128 MB fits in v5e VMEM
    and measures VMEM bandwidth instead),
  * data generated ON DEVICE (537 MB through the tunnel takes minutes).

Variants: XLA einsum mode-0, the Pallas kernel (ops/mttkrp_pallas.py),
full 3-mode einsum sweep, dimension-tree sweep (2 X passes).
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from matlab_code_tpu.ops import mttkrp_pallas

I, J, K, R = 256, 1024, 512, 16
HBM_PEAK_GBS = 819.0   # v5e


def timeit(fn, *args):
    out = fn(*args)
    np.asarray(out[-1])          # real host sync (block_until_ready lies)
    best = np.inf
    for _ in range(2):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out[-1])
        best = min(best, time.perf_counter() - t0)
    return best


def make_m0(impl, n):
    @jax.jit
    def loop(X, B, C):
        def body(i, c):
            B, C, acc = c
            A0 = impl(X, B, C)
            s = jnp.sum(A0)      # consume ALL of A0
            return (B + 1e-30 * s, C + 1e-30 * s, acc + s)
        return jax.lax.fori_loop(0, n, body, (B, C, jnp.float32(0)))
    return loop


def make_sweep(dimtree, n):
    @jax.jit
    def loop(X, A, B, C):
        def body(i, c):
            A, B, C, acc = c
            A0 = jnp.einsum("ijk,jr,kr->ir", X, B, C, optimize=True)
            A = A + 1e-30 * jnp.sum(A0)
            if dimtree:
                T1 = jnp.einsum("ijk,ir->jkr", X, A, optimize=True)
                A1 = jnp.einsum("jkr,kr->jr", T1, C, optimize=True)
                B = B + 1e-30 * jnp.sum(A1)
                A2 = jnp.einsum("jkr,jr->kr", T1, B, optimize=True)
            else:
                A1 = jnp.einsum("ijk,ir,kr->jr", X, A, C, optimize=True)
                B = B + 1e-30 * jnp.sum(A1)
                A2 = jnp.einsum("ijk,ir,jr->kr", X, A, B, optimize=True)
            C = C + 1e-30 * jnp.sum(A2)
            return (A, B, C, acc + jnp.sum(A2))
        return jax.lax.fori_loop(0, n, body, (A, B, C, jnp.float32(0)))
    return loop


def main(with_pallas="--pallas" in sys.argv):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    X = jax.random.normal(ks[0], (I, J, K), jnp.float32)
    A = jax.random.normal(ks[1], (I, R), jnp.float32)
    B = jax.random.normal(ks[2], (J, R), jnp.float32)
    C = jax.random.normal(ks[3], (K, R), jnp.float32)
    np.asarray(X[0, 0, :3])
    GB = X.size * 4 / 1e9
    dev = jax.devices()[0]
    print(f"# device: {dev}; X {X.shape} f32 = {GB * 1e3:.0f} MB "
          f"(HBM-resident); R={R}")

    N = 60
    ein = lambda X, B, C: jnp.einsum("ijk,jr,kr->ir", X, B, C, optimize=True)
    t = timeit(make_m0(ein, N), X, B, C)
    bw = GB / (t / N)
    print(f"einsum mode-0   : {t / N * 1e6:7.1f} us/iter  {bw:6.1f} GB/s "
          f"X-read = {bw / HBM_PEAK_GBS:.0%} of HBM peak")

    if with_pallas:   # remote pallas compiles take minutes — opt-in
        for ti, tj in [(8, 256)]:
            if not mttkrp_pallas.supports((I, J, K), R, ti, tj):
                continue
            f = (lambda X, B, C, ti=ti, tj=tj:
                 mttkrp_pallas.mttkrp3_mode0(X, B, C, ti=ti, tj=tj))
            try:
                t = timeit(make_m0(f, N), X, B, C)
                bw = GB / (t / N)
                print(f"pallas {ti}x{tj}    : {t / N * 1e6:7.1f} us/iter  "
                      f"{bw:6.1f} GB/s = {bw / HBM_PEAK_GBS:.0%}")
            except Exception as e:
                print(f"pallas {ti}x{tj} failed: {str(e)[:90]}")

    n = 20
    t = timeit(make_sweep(False, n), X, A, B, C)
    bw = 3 * GB / (t / n)
    print(f"3-mode sweep    : {t / n * 1e6:7.1f} us/iter  {bw:6.1f} GB/s "
          f"X-traffic = {bw / HBM_PEAK_GBS:.0%} of HBM peak")
    t = timeit(make_sweep(True, n), X, A, B, C)
    print(f"dimtree sweep   : {t / n * 1e6:7.1f} us/iter  "
          f"(2 X passes + (J,K,R) intermediate)")


if __name__ == "__main__":
    main()
