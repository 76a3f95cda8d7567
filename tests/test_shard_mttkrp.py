"""shard_map MTTKRP equals the single-device einsum on an 8-device mesh."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from matlab_code_tpu.parallel.sharding import make_mesh, DATA_AXIS
from matlab_code_tpu.parallel.shard_mttkrp import make_sharded_mttkrp
from matlab_code_tpu.ops.tensor import mttkrp

rng = np.random.default_rng(0)


def test_sharded_mttkrp_psum_and_gather():
    n = 8
    mesh = make_mesh(n)
    I, J, K, R = 16, 24, 10, 3
    X = jnp.asarray(rng.standard_normal((I, J, K)))
    facs = tuple(jnp.asarray(rng.standard_normal((s, R)))
                 for s in (I, J, K))
    Xsh = jax.device_put(X, NamedSharding(mesh, P(DATA_AXIS, None, None)))
    fsh = tuple(jax.device_put(
        f, NamedSharding(mesh, P(DATA_AXIS, None) if i == 0 else P(None, None)))
        for i, f in enumerate(facs))
    for target in range(3):
        f = make_sharded_mttkrp(mesh, DATA_AXIS, 3, shard_dim=0,
                                target_mode=target)
        got = np.asarray(jax.jit(f)(Xsh, fsh))
        want = np.asarray(mttkrp(X, list(facs), target))
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)
