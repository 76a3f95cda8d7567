"""Independent numpy oracle of the reference AO-ADMM recurrences.

A third implementation (after the JAX solver and the C++ kernels), written
directly from the reference equations (cmtf_fun_AOADMM.m) in plain numpy with
explicit loops — no code shared with matlab_code_tpu/models.  Used to assert
exact trajectory equality of the jitted solver on small problems.

Covers the heavily-used paths: CP/matrix datasets, Frobenius loss,
non-negativity constraints, exact coupling (type 0), and single PARAFAC2
datasets with nonneg constraints.
"""
from __future__ import annotations

import numpy as np


def _mttkrp(X, facs, mode):
    n = X.ndim
    sub = "abcdef"[:n]
    rest = [f"{sub[i]}r" for i in range(n) if i != mode]
    eq = sub + "," + ",".join(rest) + f"->{sub[mode]}r"
    return np.einsum(eq, X, *[facs[i] for i in range(n) if i != mode],
                     optimize=True)


def _frob(x):
    return np.linalg.norm(np.asarray(x))


def _t_smoothness_prox(mats, rho, eta):
    """tPARAFAC2 joint prox: block-tridiagonal solve by Thomas-algorithm
    Gaussian elimination over matrix-valued RHS, written directly from
    t_smoothness_prox.m:23-56 (diag 4*eta+rho_k, boundary-corrected to
    2*eta+rho_k, off-diag -2*eta, RHS rho_k*(B_k+mu_k))."""
    K = len(rho)
    c = -2.0 * eta
    d = 4.0 * eta + np.asarray(rho, np.float64).copy()
    d[0] -= 2.0 * eta
    d[-1] -= 2.0 * eta
    rhs = [rho[k] * mats[k] for k in range(K)]
    for i in range(1, K):
        mfac = c / d[i - 1]
        d[i] = d[i] - mfac * c
        rhs[i] = rhs[i] - mfac * rhs[i - 1]
    out = [None] * K
    q = rhs[-1] / d[-1]
    out[-1] = q
    for k in range(K - 2, -1, -1):
        q = (rhs[k] - c * q) / d[k]
        out[k] = q
    return out


class OracleCMTF:
    """Coupled CP datasets, Frobenius, nonneg-constrained modes, one exact
    coupling id (or none).  Optional per-mode ridge (cmtf_fun_AOADMM.m:
    117-119, objective :1290-1300) and BSUM proximal term (:124-127)."""

    def __init__(self, Xs, modes, weights, constrained, coupled_modes,
                 state, ridge=None, bsum_weight=None):
        self.ridge = ridge                      # tuple per mode, or None
        self.bsum_weight = bsum_weight          # float, or None
        self.Xs = [np.asarray(x, np.float64) for x in Xs]
        self.modes = modes                      # list of tuples of global ids
        self.weights = weights
        self.constrained = constrained          # set of global mode ids
        self.coupled = tuple(coupled_modes)     # global ids sharing Delta
        nb = 1 + max(m for t in modes for m in t)
        self.nb = nb
        self.fac = [np.array(state.fac[m], np.float64) for m in range(nb)]
        self.Z = [np.array(state.constraint_fac[m], np.float64)
                  if m in constrained else None for m in range(nb)]
        self.U = [np.array(state.constraint_dual_fac[m], np.float64)
                  if m in constrained else None for m in range(nb)]
        if self.coupled:
            self.Delta = np.array(state.coupling_fac[0], np.float64)
            self.muD = [np.array(state.coupling_dual_fac[m], np.float64)
                        if m in self.coupled else None for m in range(nb)]
        self.grams = [f.T @ f for f in self.fac]
        self.last_mttkrp = {}
        self.last_had = {}
        self.last_m = {}

    def _dataset_of(self, m):
        for p, t in enumerate(self.modes):
            if m in t:
                return p
        raise KeyError(m)

    def _precompute(self, m):
        p = self._dataset_of(m)
        t = self.modes[p]
        X = self.Xs[p]
        w = self.weights[p]
        local = t.index(m)
        if X.ndim >= 3:
            A = w * _mttkrp(X, [self.fac[j] for j in t], local)
            C = np.ones_like(self.grams[m])
            for j in t:
                if j != m:
                    C = C * self.grams[j]
        else:
            other = t[1 - local]
            A = w * (X @ self.fac[other] if local == 0
                     else X.T @ self.fac[other])
            C = self.grams[other]
        rho = np.trace(C) / C.shape[0]
        B = w * C
        if self.ridge is not None and self.ridge[m]:
            B = B + self.ridge[m] * np.eye(B.shape[0])   # :117-119
        # cache BEFORE the bsum terms (the reference caches at :121-123,
        # bsum is added at :124-127)
        self.last_mttkrp[p] = A / w
        self.last_had[p] = C
        self.last_m[p] = m
        if self.bsum_weight:
            A = A + self.bsum_weight / 2.0 * self.fac[m]
            B = B + self.bsum_weight / 2.0 * np.eye(B.shape[0])
        return A, B, rho

    def _admm_constrained(self, m, A, B, rho, opts):
        Bc = B + rho / 2 * np.eye(B.shape[0])
        pr = dr = np.inf
        it = 1
        while it <= opts.MaxInnerIters and (
                pr > opts.innerRelPrTol_constr
                or dr > opts.innerRelDualTol_constr):
            Ai = A + rho / 2 * (self.Z[m] - self.U[m])
            self.fac[m] = np.linalg.solve(Bc.T, Ai.T).T
            oldZ = self.Z[m]
            self.Z[m] = np.maximum(self.fac[m] + self.U[m], 0.0)
            self.U[m] = self.U[m] + self.fac[m] - self.Z[m]
            pr = _frob(self.fac[m] - self.Z[m]) / _frob(self.fac[m])
            s = _frob(self.U[m])
            dr = _frob(self.Z[m] - oldZ) / s if s > 0 else _frob(
                self.Z[m] - oldZ)
            it += 1

    def _admm_coupled0(self, pre, opts):
        cm = self.coupled
        prk = prc = drk = drc = np.inf
        it = 1
        Ls = {}
        for m in cm:
            A, B, rho = pre[m]
            B = B + rho / 2 * np.eye(B.shape[0])
            if m in self.constrained:
                B = B + rho / 2 * np.eye(B.shape[0])
            Ls[m] = B
        while it <= opts.MaxInnerIters and (
                prk > opts.innerRelPrTol_coupl
                or prc > opts.innerRelPrTol_constr
                or drk > opts.innerRelDualTol_coupl
                or drc > opts.innerRelDualTol_constr):
            for m in cm:
                A, B, rho = pre[m]
                Ai = A + rho / 2 * (self.Delta - self.muD[m])
                if m in self.constrained:
                    Ai = Ai + rho / 2 * (self.Z[m] - self.U[m])
                self.fac[m] = np.linalg.solve(Ls[m].T, Ai.T).T
            oldD = self.Delta
            num = 0.0
            den = 0.0
            for m in cm:
                rho = pre[m][2]
                num = num + rho * (self.fac[m] + self.muD[m])
                den = den + rho
            self.Delta = num / den
            oldZ = {}
            for m in cm:
                self.muD[m] = self.muD[m] + self.fac[m] - self.Delta
                if m in self.constrained:
                    oldZ[m] = self.Z[m]
                    self.Z[m] = np.maximum(self.fac[m] + self.U[m], 0.0)
                    self.U[m] = self.U[m] + self.fac[m] - self.Z[m]
            prk = sum(_frob(self.fac[m] - self.Delta) / _frob(self.fac[m])
                      for m in cm) / len(cm)
            drk = 0.0
            for m in cm:
                s = _frob(self.muD[m])
                d = _frob(self.Delta - oldD)
                drk += d / s if s > 0 else d
            drk /= len(cm)
            cset = [m for m in cm if m in self.constrained]
            if cset:
                prc = sum(_frob(self.fac[m] - self.Z[m]) / _frob(self.fac[m])
                          for m in cset) / len(cset)
                drc = 0.0
                for m in cset:
                    s = _frob(self.U[m])
                    d = _frob(self.Z[m] - oldZ[m])
                    drc += d / s if s > 0 else d
                drc /= len(cset)
            else:
                prc = drc = 0.0
            it += 1

    def sweep(self, opts):
        """One outer iteration in the reference order: cid 0 modes (per
        dataset, mode order), then the coupled group."""
        for p, t in enumerate(self.modes):
            for m in t:
                if m in self.coupled:
                    continue
                A, B, rho = self._precompute(m)
                if m in self.constrained:
                    self._admm_constrained(m, A, B, rho, opts)
                else:
                    self.fac[m] = np.linalg.solve(B.T, A.T).T
                self.grams[m] = self.fac[m].T @ self.fac[m]
        if self.coupled:
            pre = {}
            for m in self.coupled:
                pre[m] = self._precompute(m)
            self._admm_coupled0(pre, opts)
            for m in self.coupled:
                self.grams[m] = self.fac[m].T @ self.fac[m]

    def objective(self, znorms, compute_fc=True):
        f = 0.0
        for p, t in enumerate(self.modes):
            mk = self.last_mttkrp[p]
            had = self.last_had[p]
            m = self.last_m[p]
            f2 = np.sum(mk * self.fac[m])
            f3 = np.sum(had * self.grams[m])
            f += self.weights[p] * (znorms[p] - 2 * f2 + f3)
        if self.ridge is not None:
            for m in range(self.nb):             # :1290-1300
                if self.ridge[m]:
                    f += self.ridge[m] * np.sum(self.fac[m] ** 2)
        # coupling stream (type-0 form; callers with H-couplings pass
        # compute_fc=False and compute their own)
        fc = 0.0
        if self.coupled and compute_fc:
            acc = sum(_frob(self.fac[m] - self.Delta) / _frob(self.fac[m])
                      for m in self.coupled)
            fc = acc  # single coupling id; nnz normalization = /1
        # constraint stream
        vals = [(_frob(self.fac[m] - self.Z[m]) / _frob(self.fac[m]))
                for m in range(self.nb) if m in self.constrained]
        fz = 0.0
        if vals:
            arr = np.asarray(vals)
            nnz = np.sum(arr != 0)
            fz = arr.sum() / nnz if nnz > 0 else arr.sum()
        return f, fc, fz


class OracleParafac2:
    """Single uncoupled PARAFAC2 dataset (regular or RAGGED slices),
    Frobenius, optional nonneg constraints on A/C and an optional slice-wise
    Bk prox, per cmtf_fun_AOADMM.m:159-248 and ADMM_B_Parafac2 (:509-589).

    sizes:   optional per-slice row counts J_k (ragged); default = full rows
             of the provided state arrays.
    bk_prox: optional numpy callable (B (J_k, R), rho_k) -> (J_k, R) applied
             per slice on the TRUE J_k rows (cmtf_fun_AOADMM.m:567-578)."""

    def __init__(self, slices, state, weight=1.0, sizes=None, bk_prox=None,
                 bk_tpar2_eta=None):
        self.X = [np.array(s, np.float64) for s in slices]
        self.K = len(self.X)
        self.w = weight
        if sizes is None:
            sizes = [np.asarray(state.fac[1]).shape[1]] * self.K
        self.sizes = list(sizes)
        self.bk_prox = bk_prox
        self.bk_tpar2_eta = bk_tpar2_eta
        self.A = np.array(state.fac[0], np.float64)
        self.B = [np.array(state.fac[1][k, :J], np.float64)
                  for k, J in enumerate(self.sizes)]
        self.C = np.array(state.fac[2], np.float64)
        self.P = [np.array(state.P[0][k, :J], np.float64)
                  for k, J in enumerate(self.sizes)]
        self.DB = np.array(state.DeltaB[0], np.float64)
        self.mu = [np.array(state.mu_DeltaB[0][k, :J], np.float64)
                   for k, J in enumerate(self.sizes)]
        self.ZA = (np.array(state.constraint_fac[0], np.float64)
                   if state.constraint_fac[0] is not None else None)
        self.UA = (np.array(state.constraint_dual_fac[0], np.float64)
                   if state.constraint_dual_fac[0] is not None else None)
        if bk_prox is not None or bk_tpar2_eta is not None:
            self.ZB = [np.array(state.constraint_fac[1][k, :J], np.float64)
                       for k, J in enumerate(self.sizes)]
            self.UB = [np.array(state.constraint_dual_fac[1][k, :J],
                                np.float64)
                       for k, J in enumerate(self.sizes)]
        self.ZC = (np.array(state.constraint_fac[2], np.float64)
                   if state.constraint_fac[2] is not None else None)
        self.UC = (np.array(state.constraint_dual_fac[2], np.float64)
                   if state.constraint_dual_fac[2] is not None else None)
        self.gramA = self.A.T @ self.A
        self.gramB = [b.T @ b for b in self.B]

    def sweep(self, opts):
        self._update_A(opts)
        self._update_B(opts)
        self._update_C(opts)

    def _update_A(self, opts):
        R = self.A.shape[1]
        w = self.w
        # mode A (cmtf_fun_AOADMM.m:159-190)
        Am = np.zeros_like(self.A)
        Cm = np.zeros((R, R))
        for k in range(self.K):
            Am += self.X[k] @ self.B[k] @ np.diag(self.C[k])
            Cm += np.diag(self.C[k]) @ self.gramB[k] @ np.diag(self.C[k])
        self.last_mttkrp, self.last_had = Am.copy(), Cm.copy()
        Am = w * Am
        rho = np.trace(Cm) / R
        Bm = w * Cm
        if self.ZA is not None:
            Bc = Bm + rho / 2 * np.eye(R)
            pr = dr = np.inf
            it = 1
            while it <= opts.MaxInnerIters and (
                    pr > opts.innerRelPrTol_constr
                    or dr > opts.innerRelDualTol_constr):
                Ai = Am + rho / 2 * (self.ZA - self.UA)
                self.A = np.linalg.solve(Bc.T, Ai.T).T
                oldZ = self.ZA
                self.ZA = np.maximum(self.A + self.UA, 0.0)
                self.UA = self.UA + self.A - self.ZA
                pr = _frob(self.A - self.ZA) / _frob(self.A)
                s = _frob(self.UA)
                dr = _frob(self.ZA - oldZ) / s if s > 0 else _frob(
                    self.ZA - oldZ)
                it += 1
        else:
            self.A = np.linalg.solve(Bm.T, Am.T).T
        self.gramA = self.A.T @ self.A

    def _update_B(self, opts):
        R = self.A.shape[1]
        w = self.w
        # mode Bk (:191-218, ADMM :509-589)
        constrained_B = self.bk_prox is not None or self.bk_tpar2_eta is not None
        Ak = []
        rhok = np.zeros(self.K)
        Lk = []
        for k in range(self.K):
            a = w * self.X[k].T @ self.A @ np.diag(self.C[k])
            c = np.diag(self.C[k]) @ self.gramA @ np.diag(self.C[k])
            rhok[k] = np.trace(c) / R
            if getattr(opts, "increase_factor_rhoBk", None) is not None:
                rhok[k] = opts.increase_factor_rhoBk * rhok[k]
            b = w * c + rhok[k] / 2 * np.eye(R)
            if constrained_B:
                b = b + rhok[k] / 2 * np.eye(R)   # (:209-211)
            Ak.append(a)
            Lk.append(b)
        prk = drk = np.inf
        prc = drc = np.inf if constrained_B else 0.0
        it = 1
        while it <= opts.MaxInnerIters and (
                prk > opts.innerRelPrTol_coupl
                or prc > opts.innerRelPrTol_constr
                or drk > opts.innerRelDualTol_coupl
                or drc > opts.innerRelDualTol_constr):
            oldP = [p.copy() for p in self.P]
            for k in range(self.K):
                Ai = Ak[k] + rhok[k] / 2 * (self.P[k] @ self.DB - self.mu[k])
                if constrained_B:
                    Ai = Ai + rhok[k] / 2 * (self.ZB[k] - self.UB[k])
                self.B[k] = np.linalg.solve(Lk[k].T, Ai.T).T
                Uu, _, Vt = np.linalg.svd(
                    (self.B[k] + self.mu[k]) @ self.DB.T,
                    full_matrices=False)
                self.P[k] = Uu @ Vt
            oldDB = self.DB
            num = np.zeros_like(self.DB)
            for k in range(self.K):
                num += rhok[k] * self.P[k].T @ (self.B[k] + self.mu[k])
            self.DB = num / rhok.sum()
            for k in range(self.K):
                self.mu[k] = self.mu[k] + self.B[k] - self.P[k] @ self.DB
            if constrained_B:
                # tPARAFAC2 joint prox over all K slices (:553-565) OR
                # slice-wise prox on TRUE sizes (:567-578); residuals
                # identical in both branches (:557-564 vs :570-577)
                oldZs = [z.copy() for z in self.ZB]
                if self.bk_tpar2_eta is not None:
                    self.ZB = _t_smoothness_prox(
                        [self.B[k] + self.UB[k] for k in range(self.K)],
                        rhok, self.bk_tpar2_eta)
                else:
                    for k in range(self.K):
                        self.ZB[k] = self.bk_prox(self.B[k] + self.UB[k],
                                                  rhok[k])
                prc = drc = 0.0
                for k in range(self.K):
                    self.UB[k] = self.UB[k] + self.B[k] - self.ZB[k]
                    prc += _frob(self.B[k] - self.ZB[k]) / _frob(self.B[k])
                    s = _frob(self.UB[k])
                    d = _frob(oldZs[k] - self.ZB[k])
                    drc += d / s if s > 0 else d
                prc /= self.K
                drc /= self.K
            prk = sum(_frob(self.B[k] - self.P[k] @ self.DB)
                      / _frob(self.B[k]) for k in range(self.K)) / self.K
            drk = 0.0
            for k in range(self.K):
                s = _frob(self.mu[k])
                d = _frob(oldP[k] @ oldDB - self.P[k] @ self.DB)
                drk += d / s if s > 0 else d
            drk /= self.K
            it += 1
        self.gramB = [b.T @ b for b in self.B]

    def _update_C(self, opts):
        R = self.A.shape[1]
        w = self.w
        # mode C, row-wise (:219-248)
        for k in range(self.K):
            a = w * np.diag(self.A.T @ self.X[k] @ self.B[k])
            c = self.gramA * self.gramB[k]
            rk = np.trace(c) / R
            b = w * c
            if self.ZC is not None:
                Lc = b + rk / 2 * np.eye(R)
                # ADMM handled jointly below; store
                if k == 0:
                    As, Ls, rs = [], [], []
                As.append(a)
                Ls.append(Lc)
                rs.append(rk)
            else:
                self.C[k] = np.linalg.solve(b, a)
        if self.ZC is not None:
            pr = dr = np.inf
            it = 1
            while it <= opts.MaxInnerIters and (
                    pr > opts.innerRelPrTol_constr
                    or dr > opts.innerRelDualTol_constr):
                for k in range(self.K):
                    Ai = As[k] + rs[k] / 2 * (self.ZC[k] - self.UC[k])
                    self.C[k] = np.linalg.solve(Ls[k], Ai)
                oldZ = self.ZC
                self.ZC = np.maximum(self.C + self.UC, 0.0)
                self.UC = self.UC + self.C - self.ZC
                pr = _frob(self.C - self.ZC) / _frob(self.C)
                s = _frob(self.UC)
                dr = _frob(self.ZC - oldZ) / s if s > 0 else _frob(
                    self.ZC - oldZ)
                it += 1

    def objective(self, znorm):
        # full per-slice residual (last_m == C, cmtf_fun_AOADMM.m:1262-1264)
        f = 0.0
        for k in range(self.K):
            Mk = self.A @ np.diag(self.C[k]) @ self.B[k].T
            f += np.sum((self.X[k] - Mk) ** 2)
        f *= self.w
        if self.bk_tpar2_eta is not None:
            # joint t_smoothness penalty on the PRIMAL Bk's
            # (cmtf_fun_AOADMM.m:1276-1277, t_smoothness_penalty.m:5-9)
            f += self.bk_tpar2_eta * sum(
                np.sum((self.B[k] - self.B[k - 1]) ** 2)
                for k in range(1, self.K))
        fp = sum(_frob(self.B[k] - self.P[k] @ self.DB) / _frob(self.B[k])
                 for k in range(self.K))
        return f, fp / self.K

    def constraint_stream_B(self):
        """f_constraints contribution of the Bk mode: per-slice relative gaps
        averaged over K (cmtf_fun_AOADMM.m:1337-1341)."""
        return sum(_frob(self.B[k] - self.ZB[k]) / _frob(self.B[k])
                   for k in range(self.K)) / self.K


class OracleCoupledH:
    """Coupled CP datasets with a type-1 (H C = Delta, Sylvester factor
    solve) or type-4 (C = Delta H) coupling, unconstrained or nonneg,
    written from cmtf_fun_AOADMM.m:698-769 (case 1) and :904-983 (case 4)."""

    def __init__(self, Xs, modes, weights, ctype, Hs, constrained, state):
        self.base = OracleCMTF(Xs, modes, weights, constrained,
                               coupled_modes=tuple(Hs.keys()), state=state)
        self.ctype = ctype
        self.Hs = {m: np.asarray(H, np.float64) for m, H in Hs.items()}

    def sweep(self, opts):
        b = self.base
        for p, t in enumerate(b.modes):
            for m in t:
                if m in b.coupled:
                    continue
                A, B, rho = b._precompute(m)
                if m in b.constrained:
                    b._admm_constrained(m, A, B, rho, opts)
                else:
                    b.fac[m] = np.linalg.solve(B.T, A.T).T
                b.grams[m] = b.fac[m].T @ b.fac[m]
        pre = {m: b._precompute(m) for m in b.coupled}
        self._admm(pre, opts)
        for m in b.coupled:
            b.grams[m] = b.fac[m].T @ b.fac[m]

    def _admm(self, pre, opts):
        from scipy.linalg import solve_sylvester
        b = self.base
        cm = b.coupled
        prk = prc = drk = drc = np.inf
        it = 1
        setup = {}
        for m in cm:
            A, B, rho = pre[m]
            H = self.Hs[m]
            if self.ctype == 1:
                B2 = rho / 2 * H.T @ H
                if m in b.constrained:
                    B2 = B2 + rho / 2 * np.eye(B2.shape[0])
                setup[m] = ("syl", B2, B)
            elif self.ctype == 2:
                Bc = B + rho / 2 * H @ H.T
                if m in b.constrained:
                    Bc = Bc + rho / 2 * np.eye(B.shape[0])
                setup[m] = ("chol", Bc, None)
            else:  # type 4
                Bc = B + rho / 2 * np.eye(B.shape[0])
                if m in b.constrained:
                    Bc = Bc + rho / 2 * np.eye(B.shape[0])
                setup[m] = ("chol", Bc, None)
        while it <= opts.MaxInnerIters and (
                prk > opts.innerRelPrTol_coupl
                or prc > opts.innerRelPrTol_constr
                or drk > opts.innerRelDualTol_coupl
                or drc > opts.innerRelDualTol_constr):
            for m in cm:
                A, B, rho = pre[m]
                H = self.Hs[m]
                if self.ctype == 1:
                    Ai = A + rho / 2 * H.T @ (b.Delta - b.muD[m])
                    if m in b.constrained:
                        Ai = Ai + rho / 2 * (b.Z[m] - b.U[m])
                    kind, B2, Bb = setup[m]
                    b.fac[m] = solve_sylvester(B2, Bb, Ai)
                elif self.ctype == 2:
                    Ai = A + rho / 2 * (b.Delta - b.muD[m]) @ H.T
                    if m in b.constrained:
                        Ai = Ai + rho / 2 * (b.Z[m] - b.U[m])
                    b.fac[m] = np.linalg.solve(setup[m][1].T, Ai.T).T
                else:
                    Ai = A + rho / 2 * (b.Delta @ H - b.muD[m])
                    if m in b.constrained:
                        Ai = Ai + rho / 2 * (b.Z[m] - b.U[m])
                    b.fac[m] = np.linalg.solve(setup[m][1].T, Ai.T).T
            oldD = b.Delta
            if self.ctype == 1:
                num = 0.0
                den = 0.0
                for m in cm:
                    rho = pre[m][2]
                    num = num + rho * (self.Hs[m] @ b.fac[m] + b.muD[m])
                    den = den + rho
                b.Delta = num / den
            elif self.ctype == 2:
                num = 0.0
                den = 0.0
                for m in cm:
                    rho = pre[m][2]
                    num = num + rho * (b.fac[m] @ self.Hs[m] + b.muD[m])
                    den = den + rho
                b.Delta = num / den
            else:
                AA = 0.0
                BB = 0.0
                for m in cm:
                    rho = pre[m][2]
                    H = self.Hs[m]
                    AA = AA + rho * H @ H.T
                    BB = BB + rho * (b.fac[m] + b.muD[m]) @ H.T
                b.Delta = np.linalg.solve(AA.T, BB.T).T
            oldZ = {}
            for m in cm:
                H = self.Hs[m]
                if self.ctype == 1:
                    b.muD[m] = b.muD[m] + H @ b.fac[m] - b.Delta
                elif self.ctype == 2:
                    b.muD[m] = b.muD[m] + b.fac[m] @ H - b.Delta
                else:
                    b.muD[m] = b.muD[m] + b.fac[m] - b.Delta @ H
                if m in b.constrained:
                    oldZ[m] = b.Z[m]
                    b.Z[m] = np.maximum(b.fac[m] + b.U[m], 0.0)
                    b.U[m] = b.U[m] + b.fac[m] - b.Z[m]
            # residuals
            prk = drk = 0.0
            for m in cm:
                H = self.Hs[m]
                if self.ctype == 1:
                    t_ = H @ b.fac[m]
                    prk += _frob(t_ - b.Delta) / _frob(t_)
                    d = _frob(b.Delta - oldD)
                elif self.ctype == 2:
                    t_ = b.fac[m] @ H
                    prk += _frob(t_ - b.Delta) / _frob(t_)
                    d = _frob(b.Delta - oldD)
                else:
                    prk += _frob(b.fac[m] - b.Delta @ H) / _frob(b.fac[m])
                    d = _frob((b.Delta - oldD) @ H)
                s = _frob(b.muD[m])
                drk += d / s if s > 0 else d
            prk /= len(cm)
            drk /= len(cm)
            cset = [m for m in cm if m in b.constrained]
            if cset:
                prc = sum(_frob(b.fac[m] - b.Z[m]) / _frob(b.fac[m])
                          for m in cset) / len(cset)
                drc = 0.0
                for m in cset:
                    s = _frob(b.U[m])
                    d = _frob(b.Z[m] - oldZ[m])
                    drc += d / s if s > 0 else d
                drc /= len(cset)
            else:
                prc = drc = 0.0
            it += 1

    def objective(self, znorms):
        b = self.base
        f, _, fz = b.objective(znorms, compute_fc=False)
        acc = 0.0
        for m in b.coupled:
            H = self.Hs[m]
            if self.ctype == 1:
                t_ = H @ b.fac[m]
                acc += _frob(t_ - b.Delta) / _frob(t_)
            elif self.ctype == 2:
                t_ = b.fac[m] @ H
                acc += _frob(t_ - b.Delta) / _frob(t_)
            else:
                acc += _frob(b.fac[m] - b.Delta @ H) / _frob(b.fac[m])
        return f, acc, fz


class OracleCoupledH2(OracleCoupledH):
    """Type-3 (C = H Delta) and type-5 (H1 C = Delta H2) coupled ADMM,
    from cmtf_fun_AOADMM.m:838-901 (case 3) and :986-1075 (case 5) —
    including case 5's leftover-loop-variable rho quirk (:1032)."""

    def __init__(self, Xs, modes, weights, ctype, Hs, H2s, constrained,
                 state):
        super().__init__(Xs, modes, weights, ctype, Hs, constrained, state)
        self.H2s = {m: np.asarray(H, np.float64)
                    for m, H in (H2s or {}).items()}

    def _admm(self, pre, opts):
        from scipy.linalg import solve_sylvester
        b = self.base
        cm = b.coupled
        prk = prc = drk = drc = np.inf
        it = 1
        setup = {}
        for m in cm:
            A, B, rho = pre[m]
            H = self.Hs[m]
            if self.ctype == 5:
                B2 = rho / 2 * H.T @ H
                if m in b.constrained:
                    B2 = B2 + rho / 2 * np.eye(B2.shape[0])
                setup[m] = ("syl", B2, B)
            else:  # type 3
                Bc = B + rho / 2 * np.eye(B.shape[0])
                if m in b.constrained:
                    Bc = Bc + rho / 2 * np.eye(B.shape[0])
                setup[m] = ("chol", Bc, None)
        while it <= opts.MaxInnerIters and (
                prk > opts.innerRelPrTol_coupl
                or prc > opts.innerRelPrTol_constr
                or drk > opts.innerRelDualTol_coupl
                or drc > opts.innerRelDualTol_constr):
            for m in cm:
                A, B, rho = pre[m]
                H = self.Hs[m]
                if self.ctype == 5:
                    H2 = self.H2s[m]
                    Ai = A + rho / 2 * H.T @ (b.Delta @ H2 - b.muD[m])
                    if m in b.constrained:
                        Ai = Ai + rho / 2 * (b.Z[m] - b.U[m])
                    b.fac[m] = solve_sylvester(setup[m][1], setup[m][2], Ai)
                else:
                    Ai = A + rho / 2 * (H @ b.Delta - b.muD[m])
                    if m in b.constrained:
                        Ai = Ai + rho / 2 * (b.Z[m] - b.U[m])
                    b.fac[m] = np.linalg.solve(setup[m][1].T, Ai.T).T
            oldD = b.Delta
            if self.ctype == 3:
                AA = 0.0
                BB = 0.0
                for m in cm:
                    rho = pre[m][2]
                    H = self.Hs[m]
                    AA = AA + H.T @ (rho * H)
                    BB = BB + H.T @ (rho * (b.fac[m] + b.muD[m]))
                b.Delta = np.linalg.solve(AA, BB)
            else:
                # case 5: rhoC = mean(rho of the LAST coupled mode) for every
                # term (reference leftover-variable quirk, :1032)
                rhoC = pre[cm[-1]][2]
                AA = 0.0
                BB = 0.0
                for m in cm:
                    H, H2 = self.Hs[m], self.H2s[m]
                    AA = AA + rhoC * H2 @ H2.T
                    BB = BB + rhoC * (H @ b.fac[m] + b.muD[m]) @ H2.T
                b.Delta = np.linalg.solve(AA.T, BB.T).T
            oldZ = {}
            for m in cm:
                H = self.Hs[m]
                if self.ctype == 5:
                    b.muD[m] = (b.muD[m] + H @ b.fac[m]
                                - b.Delta @ self.H2s[m])
                else:
                    b.muD[m] = b.muD[m] + b.fac[m] - H @ b.Delta
                if m in b.constrained:
                    oldZ[m] = b.Z[m]
                    b.Z[m] = np.maximum(b.fac[m] + b.U[m], 0.0)
                    b.U[m] = b.U[m] + b.fac[m] - b.Z[m]
            prk = drk = 0.0
            for m in cm:
                H = self.Hs[m]
                if self.ctype == 5:
                    gap = H @ b.fac[m] - b.Delta @ self.H2s[m]
                    prk += _frob(gap) / _frob(b.fac[m])
                    d = _frob((b.Delta - oldD) @ self.H2s[m])
                else:
                    prk += _frob(b.fac[m] - H @ b.Delta) / _frob(b.fac[m])
                    d = _frob(H @ (b.Delta - oldD))
                s = _frob(b.muD[m])
                drk += d / s if s > 0 else d
            prk /= len(cm)
            drk /= len(cm)
            cset = [m for m in cm if m in b.constrained]
            if cset:
                prc = sum(_frob(b.fac[m] - b.Z[m]) / _frob(b.fac[m])
                          for m in cset) / len(cset)
                drc = 0.0
                for m in cset:
                    s = _frob(b.U[m])
                    d = _frob(b.Z[m] - oldZ[m])
                    drc += d / s if s > 0 else d
                drc /= len(cset)
            else:
                prc = drc = 0.0
            it += 1

    def objective(self, znorms):
        b = self.base
        f, _, fz = b.objective(znorms, compute_fc=False)
        acc = 0.0
        for m in b.coupled:
            H = self.Hs[m]
            if self.ctype == 5:
                t_ = H @ b.fac[m]
                acc += _frob(t_ - b.Delta @ self.H2s[m]) / _frob(t_)
            else:
                acc += _frob(b.fac[m] - H @ b.Delta) / _frob(b.fac[m])
        return f, acc, fz


class OracleMissingEM(OracleCMTF):
    """Single uncoupled CP dataset with missing entries + EM imputation,
    from cmtf_fun_AOADMM.m:408-441 (mask True = observed)."""

    def __init__(self, X, mask, modes, constrained, state):
        super().__init__([X], [tuple(modes)], [1.0], constrained,
                         coupled_modes=(), state=state)
        self.mask = np.asarray(mask, bool)

    def em_step(self):
        t = self.modes[0]
        facs = [self.fac[m] for m in t]
        sub = "abcdef"[:len(t)]
        eq = ",".join(f"{s}r" for s in sub) + "->" + sub
        M = np.einsum(eq, *facs, optimize=True)
        X = self.Xs[0]
        miss = ~self.mask
        old = X[miss]
        new = M[miss]
        num = np.sum((new - old) ** 2)
        den = np.sum(old ** 2)
        X[miss] = new
        return np.sqrt(num / den) if den > 0 else np.sqrt(num)

    def sweep_em(self, opts):
        self.sweep(opts)
        return self.em_step()

    def objective_missing(self, znorm):
        """Masked objective (cmtf_fun_AOADMM.m:1224-1226)."""
        t = self.modes[0]
        facs = [self.fac[m] for m in t]
        sub = "abcdef"[:len(t)]
        eq = ",".join(f"{s}r" for s in sub) + "->" + sub
        M = np.where(self.mask, np.einsum(eq, *facs, optimize=True), 0.0)
        X = self.Xs[0]
        return znorm - 2 * np.sum(X * M) + np.sum(M * M)


class OracleParafac2CoupledC5:
    """PARAFAC2 (global modes 0,1,2) whose C mode is type-5 coupled to the
    row factor of a matrix dataset (global modes 3,4): the kron-vectorized
    PAR2-C factor solve (cmtf_fun_AOADMM.m:998-1010), per-row Delta systems
    with the leftover-loop-variable rho quirk (:1026-1054), mean-rho
    constraint terms (:379-381, :1007) with max-rho prox (:1423-1424), and
    case-5 residuals (:1195-1210).

    Hs[2]=H1 for the C mode ((q,K), q must equal K for the reference's
    per-row Delta indexing), H2s[2]=(s,R); Hs[3]/H2s[3] for the matrix mode.
    c_l1_eta: optional l1 regularization on the C mode (rho-DEPENDENT prox,
    so the max-vs-mean rho quirks are actually exercised)."""

    def __init__(self, slices, Y, state, Hs, H2s, weights=(0.5, 0.5),
                 c_l1_eta=None, sizes=None):
        self.par2 = OracleParafac2(slices, state, weight=weights[0],
                                   sizes=sizes)
        self.Y = np.asarray(Y, np.float64)
        self.wm = weights[1]
        self.F3 = np.array(state.fac[3], np.float64)
        self.F4 = np.array(state.fac[4], np.float64)
        self.gram3 = self.F3.T @ self.F3
        self.gram4 = self.F4.T @ self.F4
        self.H1c = np.asarray(Hs[2], np.float64)
        self.H2c = np.asarray(H2s[2], np.float64)
        self.H1m = np.asarray(Hs[3], np.float64)
        self.H2m = np.asarray(H2s[3], np.float64)
        self.Delta = np.array(state.coupling_fac[0], np.float64)
        self.muC = np.array(state.coupling_dual_fac[2], np.float64)
        self.mu3 = np.array(state.coupling_dual_fac[3], np.float64)
        self.c_l1_eta = c_l1_eta
        if c_l1_eta is not None:
            self.ZC = np.array(state.constraint_fac[2], np.float64)
            self.UC = np.array(state.constraint_dual_fac[2], np.float64)
        else:
            self.ZC = self.UC = None
        self.last_A3 = None
        self.last_had3 = None

    def sweep(self, opts):
        b = self.par2
        # coupl_id 0: PAR2 A and Bk, then the matrix's free column mode
        b._update_A(opts)
        b._update_B(opts)
        A4 = self.wm * self.Y.T @ self.F3
        B4 = self.wm * self.gram3
        self.F4 = np.linalg.solve(B4.T, A4.T).T
        self.gram4 = self.F4.T @ self.F4

        # coupl_id 1 precompute: PAR2-C rows (:219-233) + matrix mode (:96-123)
        K = b.K
        R = b.A.shape[1]
        As, Bs = [], []
        rho2 = np.zeros(K)
        for k in range(K):
            a = b.w * np.diag(b.A.T @ b.X[k] @ b.B[k])
            c = b.gramA * b.gramB[k]
            rho2[k] = np.trace(c) / R
            As.append(a)
            Bs.append(b.w * c)
        A3 = self.wm * self.Y @ self.F4
        C3 = self.gram4
        rho3 = np.trace(C3) / C3.shape[0]
        B3 = self.wm * C3
        self.last_A3, self.last_had3 = A3 / self.wm, C3.copy()

        # case-5 precompute (:367-389): blkdiag + mean(rho)/2 * kron'kron
        HcI = np.kron(self.H1c, np.eye(R))
        B2C = np.zeros((K * R, K * R))
        for k in range(K):
            B2C[k * R:(k + 1) * R, k * R:(k + 1) * R] = Bs[k]
        B2C = B2C + np.mean(rho2) / 2 * HcI.T @ HcI
        if self.ZC is not None:
            B2C = B2C + np.mean(rho2) / 2 * np.eye(K * R)
        B2_3 = rho3 / 2 * self.H1m.T @ self.H1m

        from scipy.linalg import solve_sylvester
        prk = prc = drk = drc = np.inf
        if self.ZC is None:
            prc = drc = 0.0
        it = 1
        while it <= opts.MaxInnerIters and (
                prk > opts.innerRelPrTol_coupl
                or prc > opts.innerRelPrTol_constr
                or drk > opts.innerRelDualTol_coupl
                or drc > opts.innerRelDualTol_constr):
            # factor updates, ascending mode order (2 then 3)
            rhoC2 = np.mean(rho2)
            A_large = np.concatenate(As)                      # rows stacked
            v = (self.Delta @ self.H2c - self.muC).reshape(-1)
            Ai = A_large + rhoC2 / 2 * (HcI.T @ v)
            if self.ZC is not None:
                Ai = Ai + rhoC2 / 2 * (self.ZC - self.UC).reshape(-1)
            b.C = np.linalg.solve(B2C, Ai).reshape(K, R)
            Ai3 = A3 + rho3 / 2 * self.H1m.T @ (self.Delta @ self.H2m
                                                - self.mu3)
            self.F3 = solve_sylvester(B2_3, B3, Ai3)

            # Delta: per-row systems; rhoC = mean(rho of the LAST coupled
            # mode) everywhere (leftover `mm` quirk, :1032-1046)
            oldD = self.Delta.copy()
            rhoCq = rho3
            AA = rhoCq * self.H2m @ self.H2m.T
            AAA = self.H2c @ self.H2c.T
            BB = rhoCq * ((self.H1c @ b.C + self.muC) @ self.H2c.T
                          + (self.H1m @ self.F3 + self.mu3) @ self.H2m.T)
            for kk in range(self.Delta.shape[0]):
                self.Delta[kk] = np.linalg.solve((AA + rho2[kk] * AAA).T,
                                                 BB[kk])

            # duals (:1062), then constraint prox with max(rho) (:1423-1424)
            self.muC = self.muC + self.H1c @ b.C - self.Delta @ self.H2c
            self.mu3 = self.mu3 + self.H1m @ self.F3 - self.Delta @ self.H2m
            if self.ZC is not None:
                oldZ = self.ZC
                thr = self.c_l1_eta / np.max(rho2)
                x = b.C + self.UC
                self.ZC = np.sign(x) * np.maximum(np.abs(x) - thr, 0.0)
                self.UC = self.UC + b.C - self.ZC

            # residuals (:1195-1210)
            prk = (_frob(self.H1c @ b.C - self.Delta @ self.H2c) / _frob(b.C)
                   + _frob(self.H1m @ self.F3 - self.Delta @ self.H2m)
                   / _frob(self.F3)) / 2
            drk = 0.0
            for mu, H2 in ((self.muC, self.H2c), (self.mu3, self.H2m)):
                s = _frob(mu)
                d = _frob((self.Delta - oldD) @ H2)
                drk += d / s if s > 0 else d
            drk /= 2
            if self.ZC is not None:
                prc = _frob(b.C - self.ZC) / _frob(b.C)
                s = _frob(self.UC)
                d = _frob(self.ZC - oldZ)
                drc = d / s if s > 0 else d
            it += 1
        self.gram3 = self.F3.T @ self.F3

    def objective(self, znorm_mat):
        b = self.par2
        f, fp = b.objective(None)        # PAR2 full per-slice residual
        # f_PAR2_couplings divisor quirk (cmtf_fun_AOADMM.m:1361): the /K
        # uses the LAST dataset's 2nd-mode size (leftover loop variable pp).
        # Here the last dataset is the matrix (scalar mode size) -> /1, so
        # undo the base class's /K.
        fp = fp * b.K
        # matrix dataset: cached-MTTKRP form, last updated mode = 3
        f2 = np.sum(self.last_A3 * self.F3)
        f3 = np.sum(self.last_had3 * self.gram3)
        f += self.wm * (znorm_mat - 2 * f2 + f3)
        if self.c_l1_eta is not None:
            f += self.c_l1_eta * np.sum(np.abs(b.C))   # reg_func (l1)
        # f_couplings, case 5 (:1321-1326): gap relative to the TRANSFORM
        t2 = self.H1c @ b.C
        t3 = self.H1m @ self.F3
        fc = (_frob(t2 - self.Delta @ self.H2c) / _frob(t2)
              + _frob(t3 - self.Delta @ self.H2m) / _frob(t3))
        fz = (_frob(b.C - self.ZC) / _frob(b.C)
              if self.ZC is not None else 0.0)
        return f, fc, fz, fp


def nvecs_init(Xs, modes, n, r):
    """Independent numpy cmtf_nvecs (cmtf_nvecs.m:34-56): leading r
    eigenvectors of the summed Gram of the mode-n unfoldings of every
    dataset containing global mode n."""
    G = None
    for X, t in zip(Xs, modes):
        if n in t:
            X = np.asarray(X, np.float64)
            local = t.index(n)
            U = np.moveaxis(X, local, 0).reshape(X.shape[local], -1)
            g = U @ U.T
            G = g if G is None else G + g
    w, V = np.linalg.eigh(G)
    V = V[:, np.argsort(-w)[:r]]
    # sign convention matched to ops/linalg.top_eigvecs (largest-|.| entry
    # of each vector positive) — eigs signs are arbitrary either way
    idx = np.argmax(np.abs(V), axis=0)
    return V * np.sign(V[idx, np.arange(r)])


class OracleKL:
    """Single uncoupled CP dataset, KL / IS / beta loss, nonneg-constrained
    modes; the inner factor solves use SCIPY's L-BFGS-B on the identical
    compute_gen_f_g objective (cmtf_fun_AOADMM.m:1365-1418) — an
    implementation-independent check of the jitted ops/lbfgsb.py path at
    matched (tight) inner-solution tolerance.  Covers the non-Frobenius
    rho heuristic (:129) including the colnorm-OVERWRITE refresh quirk
    (:151-153: the refreshed value is the squared norm of the LAST column
    only), the ridge/2 gradient quirk (:1401) and the bsum anchor (:1403).
    fh/gh per loss from cmtf_AOADMM.m:162-189."""

    def __init__(self, X, modes, constrained, state, weight=1.0,
                 eps_log=1e-10, ridge=None, bsum_weight=None,
                 lbfgsb_m=5, lbfgsb_maxits=200, lbfgsb_pgtol=1e-10,
                 lbfgsb_factr=10.0, loss="KL", beta=None):
        self.loss = loss
        self.beta = beta
        self.X = np.asarray(X, np.float64)
        self.modes = tuple(modes)
        self.constrained = set(constrained)
        self.w = weight
        self.eps = eps_log
        self.ridge = ridge
        self.bsum_weight = bsum_weight
        self.lopt = dict(m=lbfgsb_m, maxiter=lbfgsb_maxits,
                         pgtol=lbfgsb_pgtol, factr=lbfgsb_factr)
        nb = 1 + max(self.modes)
        self.nb = nb
        self.fac = [np.array(state.fac[m], np.float64) for m in range(nb)]
        self.Z = [np.array(state.constraint_fac[m], np.float64)
                  if m in self.constrained else None for m in range(nb)]
        self.U = [np.array(state.constraint_dual_fac[m], np.float64)
                  if m in self.constrained else None for m in range(nb)]
        # sum of squared column norms per mode (cmtf_fun_AOADMM.m:77-80)
        self.colnorms = np.array([np.sum(self.fac[m] ** 2)
                                  for m in range(nb)])

    def _model(self, m=None, x=None):
        facs = [x if (m is not None and j == m) else self.fac[j]
                for j in self.modes]
        sub = "abcdef"[:len(self.modes)]
        eq = ",".join(f"{s}r" for s in sub) + "->" + sub
        return np.einsum(eq, *facs, optimize=True), facs

    def _fh(self, M):
        if self.loss == "KL":
            return M - self.X * np.log(M + self.eps)
        if self.loss == "IS":
            return self.X / (M + self.eps) + np.log(M + self.eps)
        b = self.beta
        return (1.0 / b) * M ** b - (1.0 / (b - 1.0)) * self.X * M ** (b - 1)

    def _gh(self, M):
        if self.loss == "KL":
            return 1.0 - self.X / (M + self.eps)
        if self.loss == "IS":
            return -self.X / (M + self.eps) ** 2 + 1.0 / (M + self.eps)
        b = self.beta
        return M ** (b - 1.0) - self.X * M ** (b - 2.0)

    def _vag(self, xvec, m, rho, constrained):
        x = xvec.reshape(self.fac[m].shape)
        M, facs = self._model(m, x)
        f = self.w * np.sum(self._fh(M))
        Y = self._gh(M)
        local = self.modes.index(m)
        g = self.w * _mttkrp(Y, facs, local).reshape(-1)
        if constrained:
            d = xvec - self.Z[m].reshape(-1) + self.U[m].reshape(-1)
            f += rho / 2.0 * np.sum(d * d)
            g = g + rho * d
        if self.ridge is not None and self.ridge[m]:
            f += self.ridge[m] * np.sum(xvec * xvec)
            g = g + self.ridge[m] / 2.0 * xvec     # the :1401 /2 quirk
        if self.bsum_weight:
            d = xvec - self.fac[m].reshape(-1)
            f += self.bsum_weight / 2.0 * np.sum(d * d)
            g = g + self.bsum_weight * d
        return f, g

    def _lbfgsb(self, m, rho, constrained):
        from scipy.optimize import fmin_l_bfgs_b
        x0 = self.fac[m].reshape(-1)
        x, _, info = fmin_l_bfgs_b(
            lambda v: self._vag(v, m, rho, constrained), x0,
            bounds=[(0.0, None)] * x0.size, **self.lopt)
        self.fac[m] = x.reshape(self.fac[m].shape)
        return info["nit"]

    def sweep(self, opts):
        for m in self.modes:
            rho = float(np.sum(self.colnorms) - self.colnorms[m])
            if m in self.constrained:
                pr = dr = np.inf
                it = 1
                while it <= opts.MaxInnerIters and (
                        pr > opts.innerRelPrTol_constr
                        or dr > opts.innerRelDualTol_constr):
                    self._lbfgsb(m, rho, True)
                    oldZ = self.Z[m]
                    self.Z[m] = np.maximum(self.fac[m] + self.U[m], 0.0)
                    self.U[m] = self.U[m] + self.fac[m] - self.Z[m]
                    pr = _frob(self.fac[m] - self.Z[m]) / _frob(self.fac[m])
                    s = _frob(self.U[m])
                    d = _frob(self.Z[m] - oldZ)
                    dr = d / s if s > 0 else d
                    it += 1
            else:
                self._lbfgsb(m, -1.0, False)
            # colnorm refresh OVERWRITE quirk (:151-153)
            self.colnorms[m] = np.sum(self.fac[m][:, -1] ** 2)

    def objective(self, znorm):
        M, _ = self._model()
        f = self.w * (znorm + np.sum(self._fh(M)))
        if self.ridge is not None:
            for m in range(self.nb):
                if self.ridge[m]:
                    f += self.ridge[m] * np.sum(self.fac[m] ** 2)
        vals = [(_frob(self.fac[m] - self.Z[m]) / _frob(self.fac[m]))
                for m in range(self.nb) if m in self.constrained]
        fz = 0.0
        if vals:
            arr = np.asarray(vals)
            nnz = np.sum(arr != 0)
            fz = arr.sum() / nnz if nnz > 0 else arr.sum()
        return f, fz
