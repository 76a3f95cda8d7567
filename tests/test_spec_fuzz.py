"""Randomized-spec robustness fuzz: random valid problem specs across the
models x couplings x constraints x losses space, short fits, finiteness and
shape invariants.

The reference's combinatorial surface (cmtf_fun_AOADMM.m's nested dispatch
over model roles, coupling types 0-5, constraint kinds, and losses) is
covered pointwise by the oracle/golden/example tests; this fuzz sweeps
random corners of the product space that no hand-written config hits.  Each
seed builds a DIFFERENT spec, so failures name the seed for replay.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from matlab_code_tpu import (
    ProblemSpec, DatasetSpec, CouplingSpec, ConstraintSpec, AlgOptions,
    InitOptions, check_data_input)
from matlab_code_tpu.models.init import init_coupled
from matlab_code_tpu.models.solver import fit
from matlab_code_tpu.utils.datagen import create_coupled_data, normalize_data

# constraint kinds safe on any dense mode (name, params, needs_nonneg_distr)
SAFE_CONSTRAINTS = [
    ("non-negativity", None, True),
    ("box", (0.0, 1.0), True),
    ("l1-ball", (2.0,), False),
    ("l2-ball", (1.5,), False),
    ("simplex column-wise", (1.0,), True),
    ("non-decreasing", None, False),
    ("l1 regularization", (0.01,), False),
    ("l2 regularization", (0.05,), False),
    ("ridge", (0.1,), False),
    (None, None, False),
    (None, None, False),
]


def _random_spec(rng):
    """One random valid (spec, distr, trafo, trafo2, delta_shapes)."""
    n_ds = int(rng.integers(1, 4))
    mode_sizes = []
    datasets = []
    mode_id = 0
    first_modes = []
    for _ in range(n_ds):
        kind = rng.choice(["CP3", "CP2", "PAR2"])
        R = int(rng.integers(2, 4))
        if kind == "PAR2":
            I = int(rng.integers(max(R + 1, 5), 10))
            J = int(rng.integers(max(R + 1, 5), 10))
            K = int(rng.integers(3, 6))
            modes = (mode_id, mode_id + 1, mode_id + 2)
            mode_sizes += [I, (J,) * K, K]
            datasets.append(DatasetSpec(model="PAR2", modes=modes, rank=R))
            first_modes.append((modes[0], I, R, "PAR2"))
            mode_id += 3
        else:
            nm = 3 if kind == "CP3" else 2
            sizes = [int(rng.integers(5, 12)) for _ in range(nm)]
            modes = tuple(range(mode_id, mode_id + nm))
            mode_sizes += sizes
            loss = "KL" if rng.uniform() < 0.15 else "Frobenius"
            datasets.append(DatasetSpec(model="CP", modes=modes, rank=R,
                                        weight=1.0 / n_ds, loss=loss))
            first_modes.append((modes[0], sizes[0], R, "CP"))
            mode_id += nm
    nb = mode_id

    # coupling: with two+ datasets, couple the first modes of the first two
    lin = [0] * nb
    ctypes = ()
    trafo = [None] * nb
    trafo2 = [None] * nb
    delta_shapes = None
    if n_ds >= 2 and rng.uniform() < 0.8:
        (m0, s0, r0, _), (m1, s1, r1, _) = first_modes[0], first_modes[1]
        # shape rules (check_data_input.m:46-125): types 0/2/4 share Delta's
        # row dim (s0 == s1); types 0/1/3 share Delta's columns (r0 == r1)
        valid = [t for t in (0, 1, 2, 3, 4)
                 if (s0 == s1 or t in (1, 3)) and (r0 == r1 or t in (2, 4))]
        ctype = int(rng.choice(valid)) if valid else None
        if ctype is None:
            pass
        elif ctype == 0:
            pass
        elif ctype == 1:
            # H_i C_i = Delta, H_i (D, s_i) right-invertible ([I 0] rows)
            D = min(s0, s1)
            trafo[m0] = np.eye(D, s0)
            trafo[m1] = np.eye(D, s1)
        elif ctype == 2:
            rr = min(r0, r1)
            trafo[m0] = np.asarray(
                np.eye(r0)[:, :rr] + 0.1 * rng.standard_normal((r0, rr)))
            trafo[m1] = np.asarray(
                np.eye(r1)[:, :rr] + 0.1 * rng.standard_normal((r1, rr)))
        elif ctype == 3:
            D = min(s0, s1)
            trafo[m0] = rng.standard_normal((s0, D))
            trafo[m1] = rng.standard_normal((s1, D))
        elif ctype == 4:
            rr = max(r0, r1)
            trafo[m0] = np.eye(rr)[:, :r0] * 1.0
            trafo[m1] = np.eye(rr)[:, :r1] * 1.0
        if ctype is not None:
            lin[m0] = lin[m1] = 1
            ctypes = (ctype,)

    # constraints (never on PAR2 C-of-type1-coupled etc.; keep to safe set)
    constraints = []
    distr = []
    for m in range(nb):
        name, params, needs_nonneg = SAFE_CONSTRAINTS[
            int(rng.integers(0, len(SAFE_CONSTRAINTS)))]
        role_par2_b = any(ds.model == "PAR2" and ds.modes[1] == m
                          for ds in datasets)
        if name is None:
            constraints.append(None)
        else:
            constraints.append(ConstraintSpec(name, params)
                               if params else ConstraintSpec(name))
        kl_mode = any(ds.loss == "KL" and m in ds.modes for ds in datasets)
        want_nonneg = needs_nonneg or role_par2_b or kl_mode
        distr.append("rand" if want_nonneg or name else "randn")
        if any(ds.model == "PAR2" and ds.modes[2] == m for ds in datasets):
            distr[-1] = "rand+0.1"
    spec = ProblemSpec(
        mode_sizes=tuple(mode_sizes), datasets=tuple(datasets),
        coupling=CouplingSpec(lin_coupled_modes=tuple(lin),
                              coupling_type=ctypes),
        constraints=tuple(constraints))
    return spec, distr, trafo, trafo2, delta_shapes


@pytest.mark.parametrize("seed", range(12))
def test_random_spec_short_fit(seed):
    rng = np.random.default_rng(1000 + seed)
    spec, distr, trafo, trafo2, delta_shapes = _random_spec(rng)
    lambdas = [[1] * ds.rank for ds in spec.datasets]
    data, _, _, _ = create_coupled_data(
        spec, lambdas=lambdas, noise=0.05, distr=distr, rng=2000 + seed,
        coupl_trafo=(trafo if any(t is not None for t in trafo) else None),
        coupl_trafo2=(trafo2
                      if any(t is not None for t in trafo2) else None))
    check_data_input(spec, data)
    if not spec.has_non_frobenius():
        data, _ = normalize_data(spec, data)   # keep KL data as counts
    # occasionally run a Frobenius CP dataset through the sparse dispatch
    import dataclasses
    from matlab_code_tpu.problem import SparseTensor
    for p, ds in enumerate(spec.datasets):
        if ds.model == "CP" and ds.loss == "Frobenius" \
                and rng.uniform() < 0.25:
            X = np.array(data.objects[p])
            X[rng.uniform(size=X.shape) < 0.4] = 0.0
            data = dataclasses.replace(data, objects=tuple(
                SparseTensor.from_dense(X) if q == p else o
                for q, o in enumerate(data.objects)))
            break
    init = InitOptions(distr=tuple(distr), normalize=True,
                       lambdas_init=tuple(tuple(l) for l in lambdas))
    state0 = init_coupled(spec, data, init, key=seed,
                          delta_shapes=delta_shapes)
    opts = AlgOptions(MaxOuterIters=5, AbsFuncTol=0.0, OuterRelTol=0.0)
    state, out = fit(spec, data, state0, opts)
    streams = np.asarray([out.f_tensors, out.f_couplings, out.f_constraints,
                          out.f_PAR2_couplings])
    assert np.all(np.isfinite(streams)), (seed, spec, streams)
    for m in range(spec.nb_modes):
        assert bool(jnp.all(jnp.isfinite(state.fac[m]))), (seed, m)
    assert np.all(np.isfinite(np.asarray(out.func_val_conv))), seed


def _mesh_round(spec):
    """Round the random spec's sizes so the mesh actually shards: CP mode
    sizes up to a multiple of 8, PARAFAC2 K to 8 — except COUPLED modes,
    whose sizes are baked into the generated trafo matrices / type-0
    equal-size rule.  KL datasets are flipped to Frobenius: the L-BFGS-B
    inner solver's line-search branches legitimately flip under sharded
    reduction order at the default loose pgtol (both iterate paths valid),
    so bitwise mesh-equality is a property of the CLOSED-FORM paths only —
    the KL mesh contract is pinned separately at matched tolerance
    (test_mesh_coupled.py::test_mesh_kl_lbfgsb)."""
    import dataclasses
    spec = dataclasses.replace(
        spec, datasets=tuple(
            dataclasses.replace(ds, loss="Frobenius", loss_param=None)
            for ds in spec.datasets))
    sizes = list(spec.mode_sizes)
    for ds in spec.datasets:
        if ds.model == "PAR2":
            J = sizes[ds.modes[1]][0]
            sizes[ds.modes[1]] = (J,) * 8
            sizes[ds.modes[2]] = 8
        else:
            for m in ds.modes:
                if spec.coupling.lin_coupled_modes and \
                        spec.coupling.lin_coupled_modes[m]:
                    continue
                sizes[m] = ((sizes[m] + 7) // 8) * 8
    import dataclasses
    return dataclasses.replace(spec, mode_sizes=tuple(sizes))


@pytest.mark.parametrize("seed", range(6))
def test_random_spec_mesh_matches_plain(seed):
    """fit(mesh=) equals the plain fit on RANDOM corners of the
    models x couplings x constraints space (sizes rounded mesh-divisible) —
    the property the hand-picked tests in test_mesh_coupled.py pin
    pointwise."""
    import jax
    from matlab_code_tpu.parallel.sharding import (
        make_mesh, data_shardings, state_shardings)
    rng = np.random.default_rng(5000 + seed)
    spec, distr, trafo, trafo2, delta_shapes = _random_spec(rng)
    spec = _mesh_round(spec)
    lambdas = [[1] * ds.rank for ds in spec.datasets]
    data, _, _, _ = create_coupled_data(
        spec, lambdas=lambdas, noise=0.05, distr=distr, rng=6000 + seed,
        coupl_trafo=(trafo if any(t is not None for t in trafo) else None),
        coupl_trafo2=(trafo2
                      if any(t is not None for t in trafo2) else None))
    check_data_input(spec, data)
    if not spec.has_non_frobenius():
        data, _ = normalize_data(spec, data)
    init = InitOptions(distr=tuple(distr), normalize=True,
                       lambdas_init=tuple(tuple(l) for l in lambdas))
    state0 = init_coupled(spec, data, init, key=seed,
                          delta_shapes=delta_shapes)
    opts = AlgOptions(MaxOuterIters=6, AbsFuncTol=0.0, OuterRelTol=0.0)
    st_ref, out_ref = fit(spec, data, state0, opts)
    mesh = make_mesh(8)
    data_sh, sharded_modes = data_shardings(spec, data, mesh)
    st_sh, out_sh = fit(spec, jax.device_put(data, data_sh),
                        jax.device_put(state0,
                                       state_shardings(spec, state0, mesh,
                                                       sharded_modes)),
                        opts, mesh=mesh)
    np.testing.assert_allclose(np.asarray(out_sh.func_val_conv),
                               np.asarray(out_ref.func_val_conv),
                               rtol=1e-8, atol=1e-11, err_msg=f"seed {seed}")
    for m in range(spec.nb_modes):
        np.testing.assert_allclose(np.asarray(st_sh.fac[m]),
                                   np.asarray(st_ref.fac[m]),
                                   rtol=1e-6, atol=1e-8,
                                   err_msg=f"seed {seed} mode {m}")
