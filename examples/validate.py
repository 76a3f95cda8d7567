"""Full-scale release validation runner for a subset of the example ports.

    python examples/validate.py script03 script06 ...
    python examples/validate.py --remaining   # the 8 not yet in VALIDATION.md

Runs each named script at its FULL reference-scale configuration and prints
one VALIDATION.md-style summary row.  script15 runs its multi-start pipeline
via the vmapped fit_multistart.
"""
import importlib
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

REMAINING = ["script01a", "script03", "script06", "script07", "script09",
             "script10", "script12", "script15"]

FULLNAME = {
    "script01": "script01_cp_par2_nonneg",
    "script01a": "script01a_cp_par2_smooth_l2ball",
    "script02": "script02_matrix_par2_nonneg",
    "script03": "script03_matrix_cp_partialcoupling",
    "script04": "script04_irregular_par2",
    "script05": "script05_cp_cp_doublesampling_simplex",
    "script06": "script06_three_datasets",
    "script07": "script07_matrix_cp_kl",
    "script08": "script08_regular_par2_nonneg",
    "script09": "script09_par2_unimodality",
    "script10": "script10_cp_tv",
    "script11": "script11_tparafac2",
    "script12": "script12_cp_par2_em",
    "script13": "script13_cp_cp_type5",
    "script14": "script14_cp_par2_couplC",
    "script15": "script15_realdata",
}


def row(name, res):
    out = res["out"]
    parts = []
    for p, stats in sorted(res["report"].items()):
        parts.append("[" + ", ".join(
            f"{v:.4f}" if i else f"{v:.4f}" for i, v in enumerate(stats))
            + "]")
    print(f"ROW | {name} | iters={out.OuterIterations} "
          f"| f_tensors={out.f_tensors:.2e} | " + "; ".join(parts),
          flush=True)


def main(names):
    from examples.common import run
    for short in names:
        name = FULLNAME[short]
        print(f"=== {name} (full) ===", flush=True)
        t0 = time.time()
        mod = importlib.import_module(f"examples.{name}")
        if short == "script15":
            mod.main(n_starts=20, small=False)
        else:
            res = run(**mod.build(small=False), verbose=True)
            row(name, res)
        print(f"    [{time.time() - t0:.1f}s]", flush=True)


if __name__ == "__main__":
    args = sys.argv[1:]
    main(REMAINING if "--remaining" in args or not args else args)
