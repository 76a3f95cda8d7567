"""Run every example script port in sequence.

    python examples/run_all.py [--small] [--full]

--small (default): reduced sizes/iterations, a few minutes total on CPU.
--full: the reference-scale configurations (see docs/VALIDATION.md).
"""
import importlib
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

SCRIPTS = [
    "script01_cp_par2_nonneg", "script01a_cp_par2_smooth_l2ball",
    "script02_matrix_par2_nonneg", "script03_matrix_cp_partialcoupling",
    "script04_irregular_par2", "script05_cp_cp_doublesampling_simplex",
    "script06_three_datasets", "script07_matrix_cp_kl",
    "script08_regular_par2_nonneg", "script09_par2_unimodality",
    "script10_cp_tv", "script11_tparafac2", "script12_cp_par2_em",
    "script13_cp_cp_type5", "script14_cp_par2_couplC",
]


def main(small=True, plots_dir=None):
    from examples.common import run
    t_all = time.time()
    for name in SCRIPTS:
        print(f"=== {name} {'(small)' if small else '(full)'} ===")
        mod = importlib.import_module(f"examples.{name}")
        t0 = time.time()
        save = f"{plots_dir}/{name}.png" if plots_dir else None
        run(**mod.build(small=small), save_plots=save)
        print(f"    [{time.time() - t0:.1f}s]")
    print(f"=== script15_realdata (multi-start) ===")
    mod = importlib.import_module("examples.script15_realdata")
    mod.main(n_starts=3 if small else 20, small=small)
    print(f"total: {time.time() - t_all:.1f}s")


if __name__ == "__main__":
    # --plots[=DIR]: also render each run's convergence figure
    # (the reference scripts' plotting block, utils/plotting.py)
    pdir = None
    for a in sys.argv[1:]:
        if a == "--plots":
            pdir = "docs/plots"
        elif a.startswith("--plots="):
            pdir = a.split("=", 1)[1]
    main(small="--full" not in sys.argv, plots_dir=pdir)
