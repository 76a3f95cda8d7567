"""Exact trajectory parity between the jitted solver and the independent
numpy oracle (tests/oracle.py)."""
import numpy as np
import jax.numpy as jnp

from matlab_code_tpu import (
    ProblemSpec, DatasetSpec, CouplingSpec, ConstraintSpec, AlgOptions,
    InitOptions)
from matlab_code_tpu.models.init import init_coupled
from matlab_code_tpu.models.solver import (
    fit, build_proxes, compute_znorm_consts)
from matlab_code_tpu.utils.datagen import create_coupled_data, normalize_data
from tests.oracle import OracleCMTF, OracleParafac2


def test_oracle_parity_coupled_cp():
    spec = ProblemSpec(
        mode_sizes=(8, 9, 10, 8, 11),
        datasets=(DatasetSpec(model="CP", modes=(0, 1, 2), rank=2,
                              weight=0.5),
                  DatasetSpec(model="CP", modes=(3, 4), rank=2, weight=0.5)),
        coupling=CouplingSpec(lin_coupled_modes=(1, 0, 0, 1, 0),
                              coupling_type=(0,)),
        constraints=(ConstraintSpec("non-negativity"), None,
                     ConstraintSpec("non-negativity"),
                     ConstraintSpec("non-negativity"), None))
    data, _, _, _ = create_coupled_data(
        spec, lambdas=[[1, 1], [1, 1]], noise=0.05,
        distr=["rand", "randn", "rand", "rand", "randn"], rng=6)
    data, _ = normalize_data(spec, data)
    init = InitOptions(distr=("rand", "randn", "rand", "rand", "randn"),
                       normalize=True, lambdas_init=((1, 1), (1, 1)))
    state0 = init_coupled(spec, data, init, key=5)
    T = 15
    opts = AlgOptions(MaxOuterIters=T, AbsFuncTol=0.0, OuterRelTol=0.0)

    state, out = fit(spec, data, state0, opts)

    orc = OracleCMTF(
        Xs=[np.asarray(data.objects[0]), np.asarray(data.objects[1])],
        modes=[(0, 1, 2), (3, 4)], weights=[0.5, 0.5],
        constrained={0, 2, 3}, coupled_modes=(0, 3), state=state0)
    znorms = [float(z) for z in compute_znorm_consts(spec, data, opts)]
    traj = []
    for _ in range(T):
        orc.sweep(opts)
        traj.append(orc.objective(znorms))
    traj = np.asarray(traj)

    np.testing.assert_allclose(out.func_val_conv[1:], traj[:, 0],
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(out.func_coupl_conv[1:], traj[:, 1],
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(out.func_constr_conv[1:], traj[:, 2],
                               rtol=1e-8, atol=1e-12)
    # final factors agree elementwise
    for m in range(5):
        np.testing.assert_allclose(np.asarray(state.fac[m]), orc.fac[m],
                                   rtol=1e-8, atol=1e-10)


def test_oracle_parity_parafac2():
    K, J, I, R = 4, 9, 7, 2
    spec = ProblemSpec(
        mode_sizes=(I, (J,) * K, K),
        datasets=(DatasetSpec(model="PAR2", modes=(0, 1, 2), rank=R),),
        coupling=CouplingSpec(lin_coupled_modes=(0, 0, 0), coupling_type=()),
        constraints=(ConstraintSpec("non-negativity"), None,
                     ConstraintSpec("non-negativity")))
    data, _, _, _ = create_coupled_data(
        spec, lambdas=[[1, 1]], noise=0.05,
        distr=["rand", "randn", "rand+0.1"], rng=6)
    data, _ = normalize_data(spec, data)
    init = InitOptions(distr=("rand", "randn", "rand+0.1"), normalize=True,
                       lambdas_init=((1, 1),))
    state0 = init_coupled(spec, data, init, key=5)
    T = 12
    opts = AlgOptions(MaxOuterIters=T, AbsFuncTol=0.0, OuterRelTol=0.0)

    state, out = fit(spec, data, state0, opts)

    slices = [np.asarray(data.objects[0].slices[k]) for k in range(K)]
    orc = OracleParafac2(slices, state0, weight=1.0)
    znorm = float(compute_znorm_consts(spec, data, opts)[0])
    fs, fps = [], []
    for _ in range(T):
        orc.sweep(opts)
        f, fp = orc.objective(znorm)
        fs.append(f)
        fps.append(fp)

    np.testing.assert_allclose(out.func_val_conv[1:], fs, rtol=1e-9,
                               atol=1e-12)
    np.testing.assert_allclose(out.func_PAR2_coupl[1:], fps, rtol=1e-8,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(state.fac[0]), orc.A, rtol=1e-8,
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(state.fac[2]), orc.C, rtol=1e-8,
                               atol=1e-10)
    for k in range(K):
        np.testing.assert_allclose(np.asarray(state.fac[1][k]), orc.B[k],
                                   rtol=1e-7, atol=1e-9)


def _coupled_H_problem(ctype):
    import numpy as np
    if ctype == 1:
        n1, n2 = 12, 6
        H_a = np.zeros((n2, n1))
        for i in range(n2):
            H_a[i, 2 * i] = 1.0
        H_b = np.eye(n2)
        sizes = (n1, 7, 8, n2, 9)
        Hs = {0: H_a, 3: H_b}
    else:  # type 4 selector
        R1 = 2
        H_a = np.eye(2, R1)
        H_b = np.eye(2, R1)
        sizes = (10, 7, 8, 10, 9)
        Hs = {0: H_a, 3: H_b}
    spec = ProblemSpec(
        mode_sizes=sizes,
        datasets=(DatasetSpec(model="CP", modes=(0, 1, 2), rank=2,
                              weight=0.5),
                  DatasetSpec(model="CP", modes=(3, 4), rank=2, weight=0.5)),
        coupling=CouplingSpec(lin_coupled_modes=(1, 0, 0, 1, 0),
                              coupling_type=(ctype,)),
        constraints=(ConstraintSpec("non-negativity"), None, None,
                     ConstraintSpec("non-negativity"), None))
    return spec, Hs


def _run_parity_H(ctype):
    import numpy as np
    from tests.oracle import OracleCoupledH
    spec, Hs = _coupled_H_problem(ctype)
    trafo = [Hs.get(m) for m in range(5)]
    data, _, _, _ = create_coupled_data(
        spec, lambdas=[[1, 1], [1, 1]], noise=0.05,
        distr=["rand", "randn", "randn", "rand", "randn"],
        coupl_trafo=trafo, rng=6)
    data, _ = normalize_data(spec, data)
    init = InitOptions(distr=("rand", "randn", "randn", "rand", "randn"),
                       normalize=True, lambdas_init=((1, 1), (1, 1)))
    state0 = init_coupled(spec, data, init, key=5)
    T = 12
    opts = AlgOptions(MaxOuterIters=T, AbsFuncTol=0.0, OuterRelTol=0.0)
    state, out = fit(spec, data, state0, opts)

    orc = OracleCoupledH(
        Xs=[np.asarray(data.objects[0]), np.asarray(data.objects[1])],
        modes=[(0, 1, 2), (3, 4)], weights=[0.5, 0.5], ctype=ctype,
        Hs=Hs, constrained={0, 3}, state=state0)
    znorms = [float(z) for z in compute_znorm_consts(spec, data, opts)]
    traj = []
    for _ in range(T):
        orc.sweep(opts)
        traj.append(orc.objective(znorms))
    traj = np.asarray(traj)
    np.testing.assert_allclose(out.func_val_conv[1:], traj[:, 0],
                               rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(out.func_coupl_conv[1:], traj[:, 1],
                               rtol=1e-7, atol=1e-11)
    for m in range(5):
        np.testing.assert_allclose(np.asarray(state.fac[m]),
                                   orc.base.fac[m], rtol=1e-7, atol=1e-9)


def test_oracle_parity_type1_sylvester():
    _run_parity_H(1)


def test_oracle_parity_type4():
    _run_parity_H(4)


def _run_parity_H2(ctype):
    import numpy as np
    from tests.oracle import OracleCoupledH2
    if ctype == 3:
        Hs = {0: np.random.default_rng(1).standard_normal((10, 5)),
              3: np.random.default_rng(2).standard_normal((10, 5))}
        H2s = {}
        sizes = (10, 7, 8, 10, 9)
        R1 = R2 = 2
    else:  # 5 — example-13 geometry: the larger coupled mode is dataset 2's
        n1, n2 = 6, 12
        H_b = np.zeros((n1, n2))
        for i in range(n1):
            H_b[i, 2 * i] = 1.0
        Hs = {0: np.eye(n1), 3: H_b}
        R1, R2 = 3, 2
        H2s = {0: np.eye(R1, R1), 3: np.vstack([np.eye(R2),
                                                np.zeros((R1 - R2, R2))])}
        sizes = (n1, 7, 8, n2, 9)
    spec = ProblemSpec(
        mode_sizes=sizes,
        datasets=(DatasetSpec(model="CP", modes=(0, 1, 2), rank=R1,
                              weight=0.5),
                  DatasetSpec(model="CP", modes=(3, 4), rank=R2, weight=0.5)),
        coupling=CouplingSpec(lin_coupled_modes=(1, 0, 0, 1, 0),
                              coupling_type=(ctype,)),
        constraints=(ConstraintSpec("non-negativity"), None, None,
                     ConstraintSpec("non-negativity"), None))
    trafo = [Hs.get(m) for m in range(5)]
    trafo2 = [H2s.get(m) for m in range(5)] if H2s else None
    data, _, _, _ = create_coupled_data(
        spec, lambdas=[[1] * R1, [1] * R2], noise=0.05,
        distr=["rand", "randn", "randn", "rand", "randn"],
        coupl_trafo=trafo, coupl_trafo2=trafo2, rng=6)
    data, _ = normalize_data(spec, data)
    init = InitOptions(distr=("rand", "randn", "randn", "rand", "randn"),
                       normalize=True,
                       lambdas_init=((1,) * R1, (1,) * R2))
    delta_shapes = {1: (n1, R1)} if ctype == 5 else None
    state0 = init_coupled(spec, data, init, key=5,
                          delta_shapes=delta_shapes)
    T = 10
    opts = AlgOptions(MaxOuterIters=T, AbsFuncTol=0.0, OuterRelTol=0.0)
    state, out = fit(spec, data, state0, opts)

    orc = OracleCoupledH2(
        Xs=[np.asarray(data.objects[0]), np.asarray(data.objects[1])],
        modes=[(0, 1, 2), (3, 4)], weights=[0.5, 0.5], ctype=ctype,
        Hs=Hs, H2s=H2s or None, constrained={0, 3}, state=state0)
    znorms = [float(z) for z in compute_znorm_consts(spec, data, opts)]
    traj = []
    for _ in range(T):
        orc.sweep(opts)
        traj.append(orc.objective(znorms))
    traj = np.asarray(traj)
    np.testing.assert_allclose(out.func_val_conv[1:], traj[:, 0],
                               rtol=1e-7, atol=1e-11)
    np.testing.assert_allclose(out.func_coupl_conv[1:], traj[:, 1],
                               rtol=1e-6, atol=1e-10)
    for m in range(5):
        np.testing.assert_allclose(np.asarray(state.fac[m]),
                                   orc.base.fac[m], rtol=1e-6, atol=1e-8)


def test_oracle_parity_type3():
    _run_parity_H2(3)


def test_oracle_parity_type5_quirk():
    _run_parity_H2(5)


def test_oracle_parity_type2():
    import numpy as np
    from tests.oracle import OracleCoupledH
    rng = np.random.default_rng(3)
    H_a = rng.standard_normal((2, 2)) + 2 * np.eye(2)
    H_b = rng.standard_normal((2, 2)) + 2 * np.eye(2)
    Hs = {0: H_a, 3: H_b}
    spec = ProblemSpec(
        mode_sizes=(10, 7, 8, 10, 9),
        datasets=(DatasetSpec(model="CP", modes=(0, 1, 2), rank=2,
                              weight=0.5),
                  DatasetSpec(model="CP", modes=(3, 4), rank=2, weight=0.5)),
        coupling=CouplingSpec(lin_coupled_modes=(1, 0, 0, 1, 0),
                              coupling_type=(2,)),
        constraints=(None,) * 5)
    data, _, _, _ = create_coupled_data(
        spec, lambdas=[[1, 1], [1, 1]], noise=0.05,
        distr=["randn"] * 5, coupl_trafo=[H_a, None, None, H_b, None],
        rng=6)
    data, _ = normalize_data(spec, data)
    init = InitOptions(distr=("randn",) * 5, normalize=True,
                       lambdas_init=((1, 1), (1, 1)))
    state0 = init_coupled(spec, data, init, key=5)
    T = 10
    opts = AlgOptions(MaxOuterIters=T, AbsFuncTol=0.0, OuterRelTol=0.0)
    state, out = fit(spec, data, state0, opts)
    orc = OracleCoupledH(
        Xs=[np.asarray(data.objects[0]), np.asarray(data.objects[1])],
        modes=[(0, 1, 2), (3, 4)], weights=[0.5, 0.5], ctype=2, Hs=Hs,
        constrained=set(), state=state0)
    znorms = [float(z) for z in compute_znorm_consts(spec, data, opts)]
    traj = []
    for _ in range(T):
        orc.sweep(opts)
        traj.append(orc.objective(znorms))
    traj = np.asarray(traj)
    np.testing.assert_allclose(out.func_val_conv[1:], traj[:, 0],
                               rtol=1e-7, atol=1e-11)
    np.testing.assert_allclose(out.func_coupl_conv[1:], traj[:, 1],
                               rtol=1e-6, atol=1e-10)


def test_oracle_parity_missing_em():
    import numpy as np
    import jax.numpy as jnp
    import dataclasses
    from tests.oracle import OracleMissingEM
    spec = ProblemSpec(
        mode_sizes=(9, 10, 11),
        datasets=(DatasetSpec(model="CP", modes=(0, 1, 2), rank=2),),
        coupling=CouplingSpec(lin_coupled_modes=(0, 0, 0), coupling_type=()),
        constraints=(ConstraintSpec("non-negativity"), None, None))
    data, _, _, _ = create_coupled_data(
        spec, lambdas=[[1, 1]], noise=0.03, distr=["rand", "randn", "randn"],
        rng=8)
    data, _ = normalize_data(spec, data)
    rng = np.random.default_rng(4)
    mask = rng.uniform(size=(9, 10, 11)) > 0.25
    X0 = np.asarray(data.objects[0])
    data = dataclasses.replace(
        data, objects=(jnp.asarray(np.where(mask, X0, 0.0)),),
        miss=(jnp.asarray(mask),))
    init = InitOptions(distr=("rand", "randn", "randn"), normalize=True,
                       lambdas_init=((1, 1),))
    state0 = init_coupled(spec, data, init, key=3)
    T = 12
    opts = AlgOptions(MaxOuterIters=T, AbsFuncTol=0.0, OuterRelTol=0.0)
    state, out = fit(spec, data, state0, opts)

    orc = OracleMissingEM(np.where(mask, X0, 0.0), mask, (0, 1, 2),
                          constrained={0}, state=state0)
    znorm = float(np.sum(np.where(mask, X0, 0.0) ** 2))
    fs, frs = [], []
    for _ in range(T):
        fr = orc.sweep_em(opts)
        fs.append(orc.objective_missing(znorm))
        frs.append(fr)
    np.testing.assert_allclose(out.func_val_conv[1:], fs, rtol=1e-8,
                               atol=1e-12)
    np.testing.assert_allclose(out.func_rel_missing[1:], frs, rtol=1e-8,
                               atol=1e-12)
    for m in range(3):
        np.testing.assert_allclose(np.asarray(state.fac[m]), orc.fac[m],
                                   rtol=1e-7, atol=1e-9)


def test_oracle_parity_ragged_bk_simplex():
    """Ragged PARAFAC2 with a row-coupled (simplex) Bk constraint: the
    size-bucketed slice-wise prox must reproduce the reference recurrence
    (per-slice prox on true J_k, cmtf_fun_AOADMM.m:567-578) exactly."""
    sizes = (9, 12, 9, 14)
    K, I, R = len(sizes), 7, 2
    spec = ProblemSpec(
        mode_sizes=(I, sizes, K),
        datasets=(DatasetSpec(model="PAR2", modes=(0, 1, 2), rank=R),),
        coupling=CouplingSpec(lin_coupled_modes=(0, 0, 0), coupling_type=()),
        constraints=(ConstraintSpec("non-negativity"),
                     ConstraintSpec("simplex column-wise", (1.0,)),
                     ConstraintSpec("non-negativity")))
    data, _, _, _ = create_coupled_data(
        spec, lambdas=[[1, 1]], noise=0.05,
        distr=["rand", "randn", "rand+0.1"], rng=6, bk_style="orth")
    data, _ = normalize_data(spec, data)
    init = InitOptions(distr=("rand", "randn", "rand+0.1"), normalize=True,
                       lambdas_init=((1, 1),))
    state0 = init_coupled(spec, data, init, key=5)
    T = 12
    opts = AlgOptions(MaxOuterIters=T, AbsFuncTol=0.0, OuterRelTol=0.0)

    state, out = fit(spec, data, state0, opts)

    def np_simplex_cols(B, rho):
        # Held/Wolfe/Crowder sort-based projection, columns onto {v>=0, sum=1}
        out = np.empty_like(B)
        for c in range(B.shape[1]):
            v = B[:, c]
            u = np.sort(v)[::-1]
            css = np.cumsum(u) - 1.0
            idx = np.arange(1, len(v) + 1)
            k = np.nonzero(u - css / idx > 0)[0][-1]
            tau = css[k] / (k + 1.0)
            out[:, c] = np.maximum(v - tau, 0.0)
        return out

    slices = [np.asarray(data.objects[0].slices[k, :, :J])
              for k, J in enumerate(sizes)]
    orc = OracleParafac2(slices, state0, weight=1.0, sizes=sizes,
                         bk_prox=np_simplex_cols)
    znorm = float(compute_znorm_consts(spec, data, opts)[0])
    fs, fps = [], []
    for _ in range(T):
        orc.sweep(opts)
        f, fp = orc.objective(znorm)
        fs.append(f)
        fps.append(fp)

    np.testing.assert_allclose(out.func_val_conv[1:], fs, rtol=1e-9,
                               atol=1e-12)
    np.testing.assert_allclose(out.func_PAR2_coupl[1:], fps, rtol=1e-8,
                               atol=1e-12)
    for k, J in enumerate(sizes):
        np.testing.assert_allclose(np.asarray(state.fac[1][k, :J]),
                                   orc.B[k], rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(np.asarray(state.fac[1][k, J:]), 0.0,
                                   atol=1e-12)
        # the simplex auxiliary columns sum to 1 on the true rows only
        np.testing.assert_allclose(
            np.asarray(state.constraint_fac[1][k, :J]).sum(axis=0),
            1.0, rtol=1e-8)


def test_oracle_parity_par2C_case5():
    """Case-5 coupling ON THE PARAFAC2 C MODE: kron-vectorized C solve,
    per-row Delta systems, leftover-rho quirk, and mean-rho constraint terms
    with max-rho l1 prox (cmtf_fun_AOADMM.m:998-1054, 1423-1424)."""
    import dataclasses
    from matlab_code_tpu.problem import ProblemData, Parafac2Tensor
    from tests.oracle import OracleParafac2CoupledC5

    K, J, I, R = 4, 6, 5, 2
    n3, n4 = 4, 7
    rng = np.random.default_rng(8)
    slices = [rng.uniform(size=(I, J)) for _ in range(K)]
    Y = rng.uniform(size=(n3, n4))
    H1c = np.eye(K)                          # q == K (per-row Delta indexing)
    H2c = rng.standard_normal((2, R)) + np.eye(2, R)
    H1m = rng.standard_normal((K, n3)) + np.eye(K, n3)
    H2m = rng.standard_normal((2, R)) + np.eye(2, R)
    eta_l1 = 0.05

    spec = ProblemSpec(
        mode_sizes=(I, (J,) * K, K, n3, n4),
        datasets=(DatasetSpec(model="PAR2", modes=(0, 1, 2), rank=R,
                              weight=0.5),
                  DatasetSpec(model="CP", modes=(3, 4), rank=R, weight=0.5)),
        coupling=CouplingSpec(lin_coupled_modes=(0, 0, 1, 1, 0),
                              coupling_type=(5,)),
        constraints=(None, None,
                     ConstraintSpec("l1 regularization", (eta_l1,)),
                     None, None))
    data = ProblemData(
        objects=(Parafac2Tensor.from_list([jnp.asarray(s) for s in slices]),
                 jnp.asarray(Y)),
        coupl_trafo=(None, None, jnp.asarray(H1c), jnp.asarray(H1m), None),
        coupl_trafo2=(None, None, jnp.asarray(H2c), jnp.asarray(H2m), None))
    init = InitOptions(distr=("rand",) * 5, normalize=True,
                       lambdas_init=((1,) * R, (1,) * R))
    state0 = init_coupled(spec, data, init, key=5,
                          delta_shapes={1: (K, 2)})
    T = 10
    opts = AlgOptions(MaxOuterIters=T, AbsFuncTol=0.0, OuterRelTol=0.0)
    state, out = fit(spec, data, state0, opts)

    orc = OracleParafac2CoupledC5(
        slices, Y, state0, Hs={2: H1c, 3: H1m}, H2s={2: H2c, 3: H2m},
        weights=(0.5, 0.5), c_l1_eta=eta_l1)
    znorm_mat = float(compute_znorm_consts(spec, data, opts)[1])
    traj = []
    for _ in range(T):
        orc.sweep(opts)
        traj.append(orc.objective(znorm_mat))
    traj = np.asarray(traj)

    np.testing.assert_allclose(out.func_val_conv[1:], traj[:, 0],
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(out.func_coupl_conv[1:], traj[:, 1],
                               rtol=1e-8, atol=1e-11)
    np.testing.assert_allclose(out.func_constr_conv[1:], traj[:, 2],
                               rtol=1e-8, atol=1e-11)
    np.testing.assert_allclose(out.func_PAR2_coupl[1:], traj[:, 3],
                               rtol=1e-8, atol=1e-11)
    np.testing.assert_allclose(np.asarray(state.fac[2]), orc.par2.C,
                               rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(state.fac[3]), orc.F3,
                               rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(state.coupling_fac[0]), orc.Delta,
                               rtol=1e-7, atol=1e-9)


def test_oracle_parity_tparafac2_joint_prox():
    """tPARAFAC2: the joint block-tridiagonal Thomas prox over all K slices
    (t_smoothness_prox.m:23-56) + its penalty in f_tensors
    (cmtf_fun_AOADMM.m:1276-1277), inside a full fit."""
    from tests.oracle import OracleParafac2

    K, J, I, R = 5, 8, 7, 2
    eta = 3.0
    spec = ProblemSpec(
        mode_sizes=(I, (J,) * K, K),
        datasets=(DatasetSpec(model="PAR2", modes=(0, 1, 2), rank=R),),
        coupling=CouplingSpec(lin_coupled_modes=(0, 0, 0), coupling_type=()),
        constraints=(None, ConstraintSpec("tPARAFAC2", (eta,)), None))
    data, _, _, _ = create_coupled_data(
        spec, lambdas=[[1, 1]], noise=0.05,
        distr=["rand", "randn", "rand+0.1"], rng=6)
    data, _ = normalize_data(spec, data)
    init = InitOptions(distr=("rand", "randn", "rand+0.1"), normalize=True,
                       lambdas_init=((1, 1),))
    state0 = init_coupled(spec, data, init, key=5)
    T = 12
    opts = AlgOptions(MaxOuterIters=T, AbsFuncTol=0.0, OuterRelTol=0.0)
    state, out = fit(spec, data, state0, opts)

    slices = [np.asarray(data.objects[0].slices[k]) for k in range(K)]
    orc = OracleParafac2(slices, state0, weight=1.0, bk_tpar2_eta=eta)
    fs, fps, fzs = [], [], []
    for _ in range(T):
        orc.sweep(opts)
        f, fp = orc.objective(None)
        fs.append(f)
        fps.append(fp)
        fzs.append(orc.constraint_stream_B())

    np.testing.assert_allclose(out.func_val_conv[1:], fs, rtol=1e-9,
                               atol=1e-12)
    np.testing.assert_allclose(out.func_PAR2_coupl[1:], fps, rtol=1e-8,
                               atol=1e-12)
    np.testing.assert_allclose(out.func_constr_conv[1:], fzs, rtol=1e-8,
                               atol=1e-12)
    for k in range(K):
        np.testing.assert_allclose(np.asarray(state.fac[1][k]), orc.B[k],
                                   rtol=1e-7, atol=1e-9)


def test_oracle_parity_ridge_bsum():
    """Ridge (cmtf_fun_AOADMM.m:117-119, objective :1290-1300) and BSUM
    (:124-127) trajectories are deterministic — exact parity."""
    spec = ProblemSpec(
        mode_sizes=(8, 9, 10),
        datasets=(DatasetSpec(model="CP", modes=(0, 1, 2), rank=2),),
        coupling=CouplingSpec(lin_coupled_modes=(0, 0, 0), coupling_type=()),
        constraints=(ConstraintSpec("non-negativity"), None,
                     ConstraintSpec("non-negativity")),
        ridge=(0.05, 0.0, 0.02))
    data, _, _, _ = create_coupled_data(
        spec, lambdas=[[1, 1]], noise=0.05,
        distr=["rand", "randn", "rand"], rng=6)
    data, _ = normalize_data(spec, data)
    init = InitOptions(distr=("rand", "randn", "rand"), normalize=True,
                       lambdas_init=((1, 1),))
    state0 = init_coupled(spec, data, init, key=5)
    T = 12
    opts = AlgOptions(MaxOuterIters=T, AbsFuncTol=0.0, OuterRelTol=0.0,
                      bsum=True, bsum_weight=1e-3)

    state, out = fit(spec, data, state0, opts)

    orc = OracleCMTF(Xs=[np.asarray(data.objects[0])], modes=[(0, 1, 2)],
                     weights=[1.0], constrained={0, 2}, coupled_modes=(),
                     state=state0, ridge=(0.05, 0.0, 0.02),
                     bsum_weight=1e-3)
    znorms = [float(z) for z in compute_znorm_consts(spec, data, opts)]
    traj = []
    for _ in range(T):
        orc.sweep(opts)
        traj.append(orc.objective(znorms))
    traj = np.asarray(traj)
    np.testing.assert_allclose(out.func_val_conv[1:], traj[:, 0],
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(out.func_constr_conv[1:], traj[:, 2],
                               rtol=1e-8, atol=1e-12)
    for m in range(3):
        np.testing.assert_allclose(np.asarray(state.fac[m]), orc.fac[m],
                                   rtol=1e-8, atol=1e-10)


def test_oracle_parity_nvecs_init():
    """The nvecs spectral init (cmtf_nvecs.m:34-56) is deterministic: the
    initial factors must match an independent numpy eig of the concatenated
    unfolding Gram, and the trajectory from that init must match the oracle
    — this trajectory shares NO random draws between solver and oracle on
    the factor matrices."""
    from tests.oracle import nvecs_init
    spec = ProblemSpec(
        mode_sizes=(8, 9, 10, 8, 11),
        datasets=(DatasetSpec(model="CP", modes=(0, 1, 2), rank=2,
                              weight=0.5),
                  DatasetSpec(model="CP", modes=(3, 4), rank=2, weight=0.5)),
        coupling=CouplingSpec(lin_coupled_modes=(1, 0, 0, 1, 0),
                              coupling_type=(0,)),
        constraints=(ConstraintSpec("non-negativity"), None, None,
                     ConstraintSpec("non-negativity"), None))
    data, _, _, _ = create_coupled_data(
        spec, lambdas=[[1, 1], [1, 1]], noise=0.05,
        distr=["rand", "randn", "rand", "rand", "randn"], rng=6)
    data, _ = normalize_data(spec, data)
    init = InitOptions(distr=("rand",) * 5, normalize=True,
                       lambdas_init=((1, 1), (1, 1)), nvecs=True)
    state0 = init_coupled(spec, data, init, key=5)

    Xs = [np.asarray(data.objects[0]), np.asarray(data.objects[1])]
    modes = [(0, 1, 2), (3, 4)]
    for m in range(5):
        np.testing.assert_allclose(
            np.asarray(state0.fac[m]), nvecs_init(Xs, modes, m, 2),
            rtol=1e-9, atol=1e-11, err_msg=f"nvecs init mode {m}")

    T = 10
    opts = AlgOptions(MaxOuterIters=T, AbsFuncTol=0.0, OuterRelTol=0.0)
    state, out = fit(spec, data, state0, opts)
    orc = OracleCMTF(Xs=Xs, modes=modes, weights=[0.5, 0.5],
                     constrained={0, 3}, coupled_modes=(0, 3), state=state0)
    znorms = [float(z) for z in compute_znorm_consts(spec, data, opts)]
    traj = []
    for _ in range(T):
        orc.sweep(opts)
        traj.append(orc.objective(znorms))
    traj = np.asarray(traj)
    np.testing.assert_allclose(out.func_val_conv[1:], traj[:, 0],
                               rtol=1e-9, atol=1e-12)
    for m in range(5):
        np.testing.assert_allclose(np.asarray(state.fac[m]), orc.fac[m],
                                   rtol=1e-8, atol=1e-10)


def test_oracle_parity_kl():
    """KL-loss factor updates: the jitted ops/lbfgsb.py inner solver against
    SCIPY's L-BFGS-B on the identical compute_gen_f_g objective
    (cmtf_fun_AOADMM.m:1365-1418), both at tight inner tolerance
    (pgtol 1e-10).  The iterate paths of the two L-BFGS implementations may
    differ, so the contract is factor-level agreement per OUTER iteration
    (each strictly-convex inner subproblem has one solution), not bitwise
    trajectory equality."""
    from matlab_code_tpu.options import LbfgsbOptions
    from matlab_code_tpu.models.solver import make_outer_step, init_cache
    from tests.oracle import OracleKL

    spec = ProblemSpec(
        mode_sizes=(7, 8, 6),
        datasets=(DatasetSpec(model="CP", modes=(0, 1, 2), rank=2,
                              loss="KL"),),
        coupling=CouplingSpec(lin_coupled_modes=(0, 0, 0), coupling_type=()),
        constraints=(ConstraintSpec("non-negativity"),
                     ConstraintSpec("non-negativity"),
                     ConstraintSpec("non-negativity")))
    data, _, _, _ = create_coupled_data(
        spec, lambdas=[[30, 30]], noise=0.0, distr=["rand"] * 3, rng=6)
    init = InitOptions(distr=("rand",) * 3, normalize=False,
                       lambdas_init=((1, 1),))
    state0 = init_coupled(spec, data, init, key=5)
    T = 5
    lopt = LbfgsbOptions(m=5, maxIts=200, maxTotalIts=20000, pgtol=1e-10,
                         factr=10.0)
    opts = AlgOptions(MaxOuterIters=T, AbsFuncTol=0.0, OuterRelTol=0.0,
                      lbfgsb=lopt)

    proxes, reg_fns = build_proxes(spec)
    step = make_outer_step(spec, opts, proxes, reg_fns, True)
    grams, colnorms = init_cache(spec, state0)
    orc = OracleKL(np.asarray(data.objects[0]), modes=(0, 1, 2),
                   constrained={0, 1, 2}, state=state0,
                   eps_log=opts.eps_log, lbfgsb_m=5, lbfgsb_maxits=200,
                   lbfgsb_pgtol=1e-10, lbfgsb_factr=10.0)
    state = state0
    rho_scale = None
    for t in range(T):
        state, grams, colnorms, rho_scale, *_ = step(
            state, data, grams, colnorms, rho_scale)
        orc.sweep(opts)
        for m in range(3):
            a = np.asarray(state.fac[m])
            b = orc.fac[m]
            err = np.max(np.abs(a - b)) / np.max(np.abs(b))
            assert err < 1e-5, (t, m, err)

    # objective stream parity at the same (loose) level
    znorm = float(compute_znorm_consts(spec, data, opts)[0])
    f, fz = orc.objective(znorm)
    from matlab_code_tpu.models.objective import func_eval
    vals = func_eval(spec, data, state, grams,
                     compute_znorm_consts(spec, data, opts), reg_fns, None,
                     options=opts)
    np.testing.assert_allclose(float(vals[0]), f, rtol=1e-6)


def test_oracle_parity_is_loss():
    """Itakura-Saito loss path (cmtf_AOADMM.m:172-181) against the scipy
    L-BFGS-B oracle — same factor-level per-outer-iteration contract as
    the KL test."""
    from matlab_code_tpu.options import LbfgsbOptions
    from matlab_code_tpu.models.solver import make_outer_step, init_cache
    from tests.oracle import OracleKL

    spec = ProblemSpec(
        mode_sizes=(7, 8, 6),
        datasets=(DatasetSpec(model="CP", modes=(0, 1, 2), rank=2,
                              loss="IS"),),
        coupling=CouplingSpec(lin_coupled_modes=(0, 0, 0), coupling_type=()),
        constraints=(ConstraintSpec("non-negativity"),
                     ConstraintSpec("non-negativity"),
                     ConstraintSpec("non-negativity")))
    data, _, _, _ = create_coupled_data(
        spec, lambdas=[[3, 3]], noise=0.0, distr=["rand+0.1"] * 3, rng=6)
    init = InitOptions(distr=("rand+0.1",) * 3, normalize=False,
                       lambdas_init=((1, 1),))
    state0 = init_coupled(spec, data, init, key=5)
    T = 4
    lopt = LbfgsbOptions(m=5, maxIts=200, maxTotalIts=20000, pgtol=1e-10,
                         factr=10.0)
    opts = AlgOptions(MaxOuterIters=T, AbsFuncTol=0.0, OuterRelTol=0.0,
                      lbfgsb=lopt)
    proxes, reg_fns = build_proxes(spec)
    step = make_outer_step(spec, opts, proxes, reg_fns, True)
    grams, colnorms = init_cache(spec, state0)
    orc = OracleKL(np.asarray(data.objects[0]), modes=(0, 1, 2),
                   constrained={0, 1, 2}, state=state0,
                   eps_log=opts.eps_log, lbfgsb_m=5, lbfgsb_maxits=200,
                   lbfgsb_pgtol=1e-10, lbfgsb_factr=10.0, loss="IS")
    state = state0
    rho_scale = None
    for t in range(T):
        state, grams, colnorms, rho_scale, *_ = step(
            state, data, grams, colnorms, rho_scale)
        orc.sweep(opts)
        for m in range(3):
            a = np.asarray(state.fac[m])
            b = orc.fac[m]
            err = np.max(np.abs(a - b)) / np.max(np.abs(b))
            assert err < 1e-4, (t, m, err)
