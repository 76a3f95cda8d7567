"""MATLAB-compatible random streams and exact reference-init replay.

MATLAB's default generator ('twister') is the reference mt19937ar: 32-bit
Mersenne-Twister words turned into doubles by genrand_res53 (two words per
double).  `rng("default")` — the seeding every reference example script uses
(example_script1:13, example_script11:10, ...) — resets it to the mt19937ar
default seed 5489; the first draw is the canonical 0.814723686393179.
`MatlabRNG.rand(m, n)` reproduces MATLAB `rand(m,n)` bit-for-bit, including
the column-major fill order.

MATLAB `randn` (ziggurat) and `poissrnd` are NOT reproduced here, so exact
replay covers the reference flows whose draws are all `rand`-family: most
importantly example_script11 (the only script whose DATA ships in this
environment, noisy_dataset.mat), whose entire post-`rng("default")` draw
sequence is the initialization — `matlab_init_coupled` replays
init_coupled_AOADMM_CMTF.m's draw order exactly, yielding the bit-identical
initial state the reference solver started from.
"""
from __future__ import annotations

import numpy as np

_N = 624
_MATAG = np.uint32(0x9908B0DF)
_UPPER = np.uint32(0x80000000)
_LOWER = np.uint32(0x7FFFFFFF)


class MatlabRNG:
    """mt19937ar with MATLAB's rand() semantics.

    seed: "default" (MATLAB rng("default"), mt19937ar seed 5489) or an int
    passed to init_genrand (matches MATLAB rng(seed,'twister') for the
    anchors tested: seed 0 -> 0.548813503927325, default -> 0.814723686393179).
    """

    def __init__(self, seed="default"):
        s = 5489 if seed == "default" else int(seed)
        mt = np.empty(_N, dtype=np.uint64)
        mt[0] = s & 0xFFFFFFFF
        for i in range(1, _N):  # init_genrand (mt19937ar.c)
            mt[i] = (1812433253 * (mt[i - 1] ^ (mt[i - 1] >> 30)) + i) \
                & 0xFFFFFFFF
        self._mt = mt.astype(np.uint32)
        self._pos = _N

    def _twist(self):
        """The mt19937ar generate-block loop.  It is SEQUENTIAL: entries
        kk >= 227 read mt[kk-227] which was already updated this block, and
        the final entry reads the new mt[0]/mt[396] — vectorized here as
        the three dependency-free chunks + the final element."""
        mt = self._mt
        new = np.empty_like(mt)

        def step(y, src):
            mag = np.where(y & np.uint32(1), _MATAG, np.uint32(0))
            return src ^ (y >> np.uint32(1)) ^ mag

        y = (mt[0:227] & _UPPER) | (mt[1:228] & _LOWER)      # kk 0..226
        new[0:227] = step(y, mt[397:624])
        y = (mt[227:454] & _UPPER) | (mt[228:455] & _LOWER)  # kk 227..453
        new[227:454] = step(y, new[0:227])
        y = (mt[454:623] & _UPPER) | (mt[455:624] & _LOWER)  # kk 454..622
        new[454:623] = step(y, new[227:396])
        y = (mt[623] & _UPPER) | (new[0] & _LOWER)           # kk 623
        new[623] = step(y, new[396])
        self._mt = new
        self._pos = 0

    def _words(self, n: int) -> np.ndarray:
        out = np.empty(n, dtype=np.uint32)
        got = 0
        while got < n:
            if self._pos >= _N:
                self._twist()
            take = min(n - got, _N - self._pos)
            out[got:got + take] = self._mt[self._pos:self._pos + take]
            self._pos += take
            got += take
        # tempering
        y = out
        y = y ^ (y >> np.uint32(11))
        y = y ^ ((y << np.uint32(7)) & np.uint32(0x9D2C5680))
        y = y ^ ((y << np.uint32(15)) & np.uint32(0xEFC60000))
        y = y ^ (y >> np.uint32(18))
        return y

    def rand(self, m: int, n: int | None = None):
        """MATLAB rand(m[,n]): genrand_res53 doubles, column-major fill."""
        cnt = m if n is None else m * n
        w = self._words(2 * cnt).astype(np.float64)
        a = np.floor(w[0::2] / 32.0)             # >> 5
        b = np.floor(w[1::2] / 64.0)             # >> 6
        vals = (a * 67108864.0 + b) / 9007199254740992.0
        if n is None:
            return vals
        return vals.reshape((m, n), order="F")


def _draw(rng: MatlabRNG, distr, m, n):
    """Reference distr handles that are rand-family: 'rand' or 'rand+c'
    (e.g. example_script11:66 @(x,y) rand(x,y); script-8 style rand+0.1)."""
    if distr == "rand":
        return rng.rand(m, n)
    if isinstance(distr, str) and distr.startswith("rand+"):
        return rng.rand(m, n) + float(distr[5:])
    raise ValueError(
        f"matlab_init_coupled can only replay rand-family draws, got "
        f"{distr!r} (MATLAB randn is ziggurat-based and not reproduced)")


def matlab_init_coupled(spec, distr, normalize=False, delta_shapes=None,
                        seed="default", dtype=np.float64):
    """Bit-exact replay of init_coupled_AOADMM_CMTF.m's random draws.

    Reproduces the reference's draw ORDER exactly (init:46-96 factor
    matrices with PAR2 DeltaB/mu interleaved, :99-129 constraint aux
    Z = prox(draw, 1) and duals, :132-169 coupling Delta and duals) using
    MATLAB-compatible rand streams, then packages the result as this
    framework's SolverState (PAR2 slices padded+masked).  distr: per-mode
    'rand' / 'rand+c' strings.  nvecs init draws nothing random for the
    factors and is not needed here.
    """
    from matlab_code_tpu.problem import PAR2
    from matlab_code_tpu.state import SolverState
    from matlab_code_tpu.models.solver import build_proxes
    import jax.numpy as jnp

    rng = MatlabRNG(seed)
    nb = spec.nb_modes
    P = len(spec.datasets)
    ncpl = len(spec.coupling.coupling_type)
    fac = [None] * nb
    Pfac = [None] * P
    DeltaB = [None] * P
    mu_DeltaB = [None] * P

    def norm_cols(A):
        return A / np.linalg.norm(A, axis=0, keepdims=True)

    # factor matrices (init:46-96)
    for p, ds in enumerate(spec.datasets):
        R = ds.rank
        for n in ds.modes:
            if ds.model == PAR2 and ds.modes.index(n) == 1:
                K = spec.par2_K(p)
                Jmax = spec.par2_Jmax(p)
                sizes = spec.par2_slice_sizes(p)
                DeltaB[p] = jnp.asarray(rng.rand(R, R))     # init:76
                Bs = np.zeros((K, Jmax, R), dtype=dtype)
                Ps = np.zeros((K, Jmax, R), dtype=dtype)
                mus = np.zeros((K, Jmax, R), dtype=dtype)
                for k, J in enumerate(sizes):               # init:77-87
                    Bk = _draw(rng, distr[n], J, R)
                    mus[k, :J] = rng.rand(J, R)
                    if normalize:
                        Bk = norm_cols(Bk)
                    Bs[k, :J] = Bk
                    Ps[k, :J] = np.eye(J, R)
                fac[n] = jnp.asarray(Bs)
                Pfac[p] = jnp.asarray(Ps)
                mu_DeltaB[p] = jnp.asarray(mus)
            else:
                A = _draw(rng, distr[n], spec.mode_sizes[n], R)
                if normalize:                               # init:89-93
                    A = norm_cols(A)
                fac[n] = jnp.asarray(A)

    # constraint auxiliaries (init:99-129)
    proxes, _ = build_proxes(spec)
    constraint_fac = [None] * nb
    constraint_dual = [None] * nb
    for p, ds in enumerate(spec.datasets):
        R = ds.rank
        for n in ds.modes:
            if not spec.is_constrained(n):
                continue
            if ds.model == PAR2 and ds.modes.index(n) == 1:
                K = spec.par2_K(p)
                Jmax = spec.par2_Jmax(p)
                sizes = spec.par2_slice_sizes(p)
                is_tpar2 = spec.constraints[n].kind == "tPARAFAC2"
                Zs = np.zeros((K, Jmax, R), dtype=dtype)
                duals = np.zeros((K, Jmax, R), dtype=dtype)
                for k, J in enumerate(sizes):               # init:105-114
                    z = _draw(rng, distr[n], J, R)
                    if not is_tpar2:                        # init:111-112
                        z = np.asarray(proxes[n](jnp.asarray(z), 1.0))
                    Zs[k, :J] = z
                    duals[k, :J] = rng.rand(J, R)
                constraint_fac[n] = jnp.asarray(Zs)
                constraint_dual[n] = jnp.asarray(duals)
            else:                                           # init:116-125
                z = _draw(rng, distr[n], *fac[n].shape)
                constraint_fac[n] = proxes[n](jnp.asarray(z), 1.0)
                constraint_dual[n] = jnp.asarray(
                    rng.rand(*fac[n].shape))

    # coupling Delta + duals (init:132-169)
    coupling_fac = [None] * ncpl
    coupling_dual = [None] * nb
    for cid in range(1, ncpl + 1):
        cmodes = spec.coupled_modes_of(cid)
        m1 = cmodes[0]
        ctype = spec.coupling.coupling_type[cid - 1]
        R1 = fac[m1].shape[-1]
        if ctype == 0:
            coupling_fac[cid - 1] = jnp.asarray(
                rng.rand(*fac[m1].shape))
            for m in cmodes:
                coupling_dual[m] = jnp.asarray(rng.rand(*fac[m1].shape))
        elif ctype in (1, 2, 3, 4, 5):
            raise NotImplementedError(
                "matlab_init_coupled replays the rand-only reference flows "
                "(types with trafo matrices are straightforward to add the "
                "same way when a rand-only script needs them)")
    return SolverState(
        fac=tuple(fac), constraint_fac=tuple(constraint_fac),
        constraint_dual_fac=tuple(constraint_dual),
        coupling_fac=tuple(coupling_fac),
        coupling_dual_fac=tuple(coupling_dual),
        P=tuple(Pfac), DeltaB=tuple(DeltaB), mu_DeltaB=tuple(mu_DeltaB))
