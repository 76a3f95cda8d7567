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


def test_sharded_mttkrp_sparse_matches_gather():
    """nnz-partitioned COO MTTKRP (psum of per-shard partials) equals the
    single-device gather/segment-sum for every target mode."""
    from matlab_code_tpu.problem import SparseTensor
    from matlab_code_tpu.parallel.shard_mttkrp import (
        make_sharded_mttkrp_sparse, pad_sparse_nnz)
    from matlab_code_tpu.ops.tensor import mttkrp_sparse

    n = 8
    mesh = make_mesh(n)
    shape = (16, 24, 10)
    X = rng.standard_normal(shape)
    X[rng.uniform(size=shape) < 0.7] = 0.0
    st = pad_sparse_nnz(SparseTensor.from_dense(X), n)
    assert st.indices.shape[0] % n == 0
    facs = tuple(jnp.asarray(rng.standard_normal((s, 3))) for s in shape)
    idx_sh = jax.device_put(st.indices,
                            NamedSharding(mesh, P(DATA_AXIS, None)))
    val_sh = jax.device_put(st.values, NamedSharding(mesh, P(DATA_AXIS)))
    st_sh = SparseTensor(idx_sh, val_sh)
    for target in range(3):
        f = make_sharded_mttkrp_sparse(mesh, DATA_AXIS, target, shape[target])
        got = np.asarray(f(st_sh, facs))
        want = np.asarray(mttkrp_sparse(st.indices, st.values, list(facs),
                                        target, shape[target]))
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_fit_mesh_sparse_matches_plain():
    """fit(mesh=) on an nnz-sharded SparseTensor dataset reproduces the plain
    sparse fit's trajectory and factors (sparse analogue of the dense
    shard_map test below)."""
    import dataclasses
    from matlab_code_tpu import (
        ProblemSpec, DatasetSpec, CouplingSpec, ConstraintSpec, AlgOptions,
        InitOptions)
    from matlab_code_tpu.problem import SparseTensor
    from matlab_code_tpu.models.init import init_coupled
    from matlab_code_tpu.models.solver import fit
    from matlab_code_tpu.utils.datagen import create_coupled_data, \
        normalize_data
    from matlab_code_tpu.parallel.sharding import data_shardings, \
        state_shardings
    from matlab_code_tpu.parallel.shard_mttkrp import pad_sparse_nnz

    spec = ProblemSpec(
        mode_sizes=(12, 11, 10),
        datasets=(DatasetSpec(model="CP", modes=(0, 1, 2), rank=2),),
        coupling=CouplingSpec(lin_coupled_modes=(0, 0, 0), coupling_type=()),
        constraints=(ConstraintSpec("non-negativity"), None, None))
    data, _, _, _ = create_coupled_data(
        spec, lambdas=[[1, 1]], noise=0.0, distr=["rand", "randn", "randn"],
        rng=7)
    data, _ = normalize_data(spec, data)
    Xd = np.array(data.objects[0])
    Xd[rng.uniform(size=Xd.shape) < 0.5] = 0.0
    n = 8
    sp_data = dataclasses.replace(
        data, objects=(pad_sparse_nnz(SparseTensor.from_dense(Xd), n),))
    init = InitOptions(distr=("rand", "randn", "randn"), normalize=True,
                       lambdas_init=((1, 1),))
    state0 = init_coupled(spec, sp_data, init, key=3)
    opts = AlgOptions(MaxOuterIters=20, AbsFuncTol=0.0, OuterRelTol=0.0)

    st_ref, out_ref = fit(spec, sp_data, state0, opts)

    mesh = make_mesh(n)
    data_sh, sharded_modes = data_shardings(spec, sp_data, mesh)
    st_sh, out_sh = fit(spec, jax.device_put(sp_data, data_sh),
                        jax.device_put(state0,
                                       state_shardings(spec, state0, mesh,
                                                       sharded_modes)),
                        opts, mesh=mesh)
    np.testing.assert_allclose(out_sh.func_val_conv, out_ref.func_val_conv,
                               rtol=1e-11, atol=1e-13)
    for m in range(spec.nb_modes):
        np.testing.assert_allclose(np.asarray(st_sh.fac[m]),
                                   np.asarray(st_ref.fac[m]),
                                   rtol=1e-9, atol=1e-11)


def test_fit_with_explicit_shard_map_matches_plain():
    """fit(..., mesh=mesh) routes CP MTTKRPs through the explicit shard_map
    collectives and reproduces the plain fit's trajectory and factors."""
    from matlab_code_tpu import (
        ProblemSpec, DatasetSpec, CouplingSpec, ConstraintSpec, AlgOptions,
        InitOptions)
    from matlab_code_tpu.models.init import init_coupled
    from matlab_code_tpu.models.solver import fit
    from matlab_code_tpu.utils.datagen import create_coupled_data, \
        normalize_data
    from matlab_code_tpu.parallel.sharding import data_shardings, \
        state_shardings

    spec = ProblemSpec(
        mode_sizes=(16, 12, 10, 16, 14),
        datasets=(DatasetSpec(model="CP", modes=(0, 1, 2), rank=2,
                              weight=0.5),
                  DatasetSpec(model="CP", modes=(3, 4), rank=2, weight=0.5)),
        coupling=CouplingSpec(lin_coupled_modes=(1, 0, 0, 1, 0),
                              coupling_type=(0,)),
        constraints=(ConstraintSpec("non-negativity"), None, None,
                     ConstraintSpec("non-negativity"), None))
    data, _, _, _ = create_coupled_data(
        spec, lambdas=[[1, 1], [1, 1]], noise=0.02,
        distr=["rand", "randn", "randn", "rand", "randn"], rng=4)
    data, _ = normalize_data(spec, data)
    init = InitOptions(distr=("rand", "randn", "randn", "rand", "randn"),
                       normalize=True, lambdas_init=((1, 1), (1, 1)))
    state0 = init_coupled(spec, data, init, key=3)
    opts = AlgOptions(MaxOuterIters=25, AbsFuncTol=0.0, OuterRelTol=0.0)

    st_ref, out_ref = fit(spec, data, state0, opts)

    mesh = make_mesh(8)
    data_sh, sharded_modes = data_shardings(spec, data, mesh)
    st_sh, out_sh = fit(spec, jax.device_put(data, data_sh),
                        jax.device_put(state0,
                                       state_shardings(spec, state0, mesh,
                                                       sharded_modes)),
                        opts, mesh=mesh)
    np.testing.assert_allclose(out_sh.func_val_conv, out_ref.func_val_conv,
                               rtol=1e-11, atol=1e-13)
    for m in range(spec.nb_modes):
        np.testing.assert_allclose(np.asarray(st_sh.fac[m]),
                                   np.asarray(st_ref.fac[m]),
                                   rtol=1e-9, atol=1e-11)


def test_cmtf_aoadmm_mesh_kwarg():
    """The public driver's mesh= forwards through fit() with the framework's
    shardings applied automatically (no manual device_put needed)."""
    from matlab_code_tpu import (
        ProblemSpec, DatasetSpec, CouplingSpec, ConstraintSpec, AlgOptions,
        InitOptions, cmtf_aoadmm)
    from matlab_code_tpu.utils.datagen import create_coupled_data, \
        normalize_data

    spec = ProblemSpec(
        mode_sizes=(16, 12, 10),
        datasets=(DatasetSpec(model="CP", modes=(0, 1, 2), rank=2),),
        coupling=CouplingSpec(lin_coupled_modes=(0, 0, 0), coupling_type=()),
        constraints=(ConstraintSpec("non-negativity"), None, None))
    data, _, _, _ = create_coupled_data(
        spec, lambdas=[[1, 1]], noise=0.02, distr=["rand", "randn", "randn"],
        rng=4)
    data, _ = normalize_data(spec, data)
    init = InitOptions(distr=("rand", "randn", "randn"), normalize=True,
                       lambdas_init=((1, 1),))
    opts = AlgOptions(MaxOuterIters=15, AbsFuncTol=0.0, OuterRelTol=0.0)
    _, st_ref, _, out_ref = cmtf_aoadmm(spec, data, opts,
                                        init_options=init, key=5)
    mesh = make_mesh(8)
    _, st_sh, _, out_sh = cmtf_aoadmm(spec, data, opts, init_options=init,
                                      key=5, mesh=mesh)
    np.testing.assert_allclose(out_sh.func_val_conv, out_ref.func_val_conv,
                               rtol=1e-11, atol=1e-13)
    for m in range(spec.nb_modes):
        np.testing.assert_allclose(np.asarray(st_sh.fac[m]),
                                   np.asarray(st_ref.fac[m]),
                                   rtol=1e-9, atol=1e-11)


def test_pipelined_ring_mttkrp_matches_plain():
    """The ring-pipelined MTTKRP (collective-permute per chunk, overlapped
    with the next chunk's contraction) equals the bulk-psum path and the
    single-device einsum for every psum-reducing target, at 8 devices."""
    from matlab_code_tpu.parallel.shard_mttkrp import (
        make_sharded_mttkrp_pipelined)
    n = 8
    mesh = make_mesh(n)
    I, J, K, R = 32, 24, 40, 3
    X = jnp.asarray(rng.standard_normal((I, J, K)))
    facs = tuple(jnp.asarray(rng.standard_normal((s, R)))
                 for s in (I, J, K))
    for target in (1, 2):                    # target != shard_dim
        f = make_sharded_mttkrp_pipelined(mesh, DATA_AXIS, 3, 0, target, n)
        got = np.asarray(jax.jit(f)(X, facs))
        want = np.asarray(mttkrp(X, list(facs), target))
        np.testing.assert_allclose(got, want, rtol=1e-11, atol=1e-12)


def test_pipelined_ring_hlo_structure():
    """Compiled-HLO audit of the overlap design: n-1 collective-permute
    sites per ring, and each in-flight permute is INDEPENDENT of the next
    chunk's contraction — the permute's consumer combines it with a dot
    that is not downstream of the permute, so the scheduler can overlap
    them (async start/done pairs on backends that split collectives; the
    CPU backend lowers permutes synchronously but the dataflow
    independence is what the census checks).  The audit itself lives in
    parallel/hlo_census.ring_permute_census, shared with bench_scaling's
    SCALING-artifact census so the two cannot drift apart."""
    from matlab_code_tpu.parallel.hlo_census import ring_permute_census
    from matlab_code_tpu.parallel.shard_mttkrp import (
        make_sharded_mttkrp_pipelined)
    n = 8
    mesh = make_mesh(n)
    X = jnp.asarray(rng.standard_normal((32, 24, 40)))
    facs = tuple(jnp.asarray(rng.standard_normal((s, 3)))
                 for s in (32, 24, 40))
    f = jax.jit(make_sharded_mttkrp_pipelined(mesh, DATA_AXIS, 3, 0, 1, n))
    txt = f.lower(X, facs).compile().as_text()
    res = ring_permute_census(txt, n)
    assert res["ring_steps"] == n - 1


def test_fit_with_pipelined_collectives_matches_plain():
    """make_outer_step with pipelined ring MTTKRPs reproduces the plain
    solver's trajectory (float-rounding tolerance: the ring reduces in a
    different association order than psum)."""
    from matlab_code_tpu import (
        ProblemSpec, DatasetSpec, CouplingSpec, ConstraintSpec, AlgOptions,
        InitOptions)
    from matlab_code_tpu.models.init import init_coupled
    from matlab_code_tpu.models.solver import (
        init_cache, make_outer_step, build_proxes)
    from matlab_code_tpu.parallel.shard_mttkrp import build_sharded_mttkrps
    from matlab_code_tpu.utils.datagen import create_coupled_data, \
        normalize_data

    spec = ProblemSpec(
        mode_sizes=(16, 24, 16),
        datasets=(DatasetSpec(model="CP", modes=(0, 1, 2), rank=2),),
        coupling=CouplingSpec(lin_coupled_modes=(0, 0, 0), coupling_type=()),
        constraints=(ConstraintSpec("non-negativity"), None, None))
    data, _, _, _ = create_coupled_data(
        spec, lambdas=[[1, 1]], noise=0.02, distr=["rand", "randn", "randn"],
        rng=4)
    data, _ = normalize_data(spec, data)
    init = InitOptions(distr=("rand", "randn", "randn"), normalize=True,
                       lambdas_init=((1, 1),))
    state0 = init_coupled(spec, data, init, key=3)
    opts = AlgOptions(MaxOuterIters=20)
    proxes, reg_fns = build_proxes(spec)
    mesh = make_mesh(8)
    impls_pipe = build_sharded_mttkrps(spec, data, mesh, pipelined=True)
    # the pipelined builder swapped in ring variants for the non-sharded
    # targets (mode sizes 24 and 16 are both divisible by 8)
    assert set(impls_pipe) == {(0, t) for t in range(3)}

    def sweep(impls):
        step = make_outer_step(spec, opts, proxes, reg_fns, True,
                               mttkrp_impls=impls)
        state, (grams, colnorms) = state0, init_cache(spec, state0)
        for _ in range(opts.MaxOuterIters):
            state, grams, colnorms, *_ = step(state, data, grams, colnorms)
        return state

    st_plain = sweep(None)
    st_pipe = sweep(impls_pipe)
    for m in range(3):
        np.testing.assert_allclose(np.asarray(st_pipe.fac[m]),
                                   np.asarray(st_plain.fac[m]),
                                   rtol=1e-9, atol=1e-11)


def test_fit_mesh_pipelined_option_matches_plain():
    """AlgOptions.mesh_pipelined_collectives=True under fit(mesh=) routes
    the psum targets through the ring-pipelined path and reproduces the
    plain fit's trajectory to float rounding."""
    from matlab_code_tpu import (
        ProblemSpec, DatasetSpec, CouplingSpec, ConstraintSpec, AlgOptions,
        InitOptions)
    from matlab_code_tpu.models.init import init_coupled
    from matlab_code_tpu.models.solver import fit
    from matlab_code_tpu.utils.datagen import create_coupled_data, \
        normalize_data
    from matlab_code_tpu.parallel.sharding import data_shardings, \
        state_shardings

    spec = ProblemSpec(
        mode_sizes=(16, 24, 16),
        datasets=(DatasetSpec(model="CP", modes=(0, 1, 2), rank=2),),
        coupling=CouplingSpec(lin_coupled_modes=(0, 0, 0), coupling_type=()),
        constraints=(ConstraintSpec("non-negativity"), None, None))
    data, _, _, _ = create_coupled_data(
        spec, lambdas=[[1, 1]], noise=0.02, distr=["rand", "randn", "randn"],
        rng=4)
    data, _ = normalize_data(spec, data)
    init = InitOptions(distr=("rand", "randn", "randn"), normalize=True,
                       lambdas_init=((1, 1),))
    state0 = init_coupled(spec, data, init, key=3)
    opts = AlgOptions(MaxOuterIters=15, AbsFuncTol=0.0, OuterRelTol=0.0,
                      mesh_pipelined_collectives=True)

    st_ref, out_ref = fit(spec, data, state0,
                          AlgOptions(MaxOuterIters=15, AbsFuncTol=0.0,
                                     OuterRelTol=0.0))
    mesh = make_mesh(8)
    data_sh, sharded_modes = data_shardings(spec, data, mesh)
    st_sh, out_sh = fit(spec, jax.device_put(data, data_sh),
                        jax.device_put(state0,
                                       state_shardings(spec, state0, mesh,
                                                       sharded_modes)),
                        opts, mesh=mesh)
    np.testing.assert_allclose(out_sh.func_val_conv, out_ref.func_val_conv,
                               rtol=1e-9, atol=1e-12)
    for m in range(spec.nb_modes):
        np.testing.assert_allclose(np.asarray(st_sh.fac[m]),
                                   np.asarray(st_ref.fac[m]),
                                   rtol=1e-8, atol=1e-10)
