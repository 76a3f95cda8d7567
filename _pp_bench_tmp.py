import dataclasses, time
import numpy as np
from bench_large import sparse_problem
from matlab_code_tpu.models.solver import fit

t0 = time.perf_counter()
spec, data, state, opts = sparse_problem(structured=True)
print(f"# built [{time.perf_counter()-t0:.0f}s]", flush=True)
N = 300
o = dataclasses.replace(opts, MaxOuterIters=N, AbsFuncTol=0.0,
                        OuterRelTol=0.0, TimeAtItChunk=50,
                        cp_pairwise_perturbation=True,
                        pp_start_tol=0.05, pp_refresh_tol=0.15)
t1 = time.perf_counter()
s, out = fit(spec, data, state, o, validate=False)
dt = time.perf_counter() - t1
tail = out.time_at_it[-1] - out.time_at_it[-51]
print(f"pp: last-50 {50/tail:.1f} it/s, total {N/dt:.1f} it/s (incl "
      f"compile), f={out.f_tensors:.6e}", flush=True)
per50 = np.diff(out.time_at_it[::50])
print("# 50-iter chunk times:", [f"{x:.1f}s" for x in per50], flush=True)
