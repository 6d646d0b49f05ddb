"""A/B diagnosis of the round-3 Ebola headline drop (VERDICT r3 next-#3).

BENCH_r02 measured 2.401M moves/s on a SIMULATED dataset with 1%-uniform
missingness; BENCH_r03 measured 1.956M moves/s on the frozen Gire-2014-like
dataset with structured missingness.  The dataset changed under the bench in
the same round as code changes (interval-run native kernel, salted reform
hash), so the delta was never attributed.  This script runs BOTH configs on
the CURRENT code in one process (one TPU client):

  A = round-2 simulated config  (simulate_dataset, 1% uniform missingness)
  B = frozen MAPLE dataset      (data/ebola2014_like_81x18959.maple)

If A ~= 2.4M the drop is the dataset (realism upgrade, not a regression);
if A ~= B ~= 1.96M the code regressed between 82e751c..round-3 end.

Usage (TPU): python scripts/ab_ebola.py        [AB_SECONDS=30]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("DELPHY_TPU_F32", "1")

import numpy as np

import delphy_tpu  # noqa: F401


def measure(tag, tree, seconds):
    from delphy_tpu.run import Run
    run = Run(tree, seed=1, num_cells=400)
    n = run.local_moves_per_global_move * run.topology_burst_chunks
    run.do_mcmc_steps(10)
    run.do_mcmc_steps(n)
    t0 = time.time()
    base = run.local_moves_attempted
    while time.time() - t0 < seconds:
        run.do_mcmc_steps(n)
    total = run.local_moves_attempted - base
    dt = time.time() - t0
    run.check_derived_quantities(0.05)
    out = {"config": tag, "moves_per_s": round(total / dt, 1),
           "window_s": round(dt, 1),
           "topo_accept": run.topology_accepted,
           "topo_prop": run.topology_proposed,
           "num_muts": int(run.last_stats["num_muts"])}
    print(json.dumps(out), flush=True)
    return out


def main():
    from delphy_tpu.sim import simulate_dataset
    from delphy_tpu.io.maple import read_maple
    from delphy_tpu.init_tree import build_initial_tree

    seconds = float(os.environ.get("AB_SECONDS", "30"))

    # A: the exact round-2 bench dataset config (bench.py @ 82e751c)
    T, L = 81, 18959
    ref, deltas, miss, dates, names, _ = simulate_dataset(
        T, L, mu=1.2e-3 / 365.0 * 19000 / L, sample_window_days=500.0,
        missing_fraction=0.01, seed=42)
    tree_a = build_initial_tree(ref, deltas, miss, dates, names=names,
                                rng=np.random.default_rng(42))

    # B: the frozen round-3 bench dataset (bench.py @ HEAD)
    mf = read_maple(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data", "ebola2014_like_81x18959.maple"))
    tips = mf.tips
    tree_b = build_initial_tree(mf.ref_seq, [t.deltas for t in tips],
                                [t.miss_intervals for t in tips],
                                [(t.t_min, t.t_max) for t in tips],
                                names=[t.name for t in tips],
                                rng=np.random.default_rng(42))

    a = measure("A_simulated_r2_config", tree_a, seconds)
    b = measure("B_frozen_maple", tree_b, seconds)
    print(json.dumps({"ratio_B_over_A": round(
        b["moves_per_s"] / a["moves_per_s"], 4)}), flush=True)


if __name__ == "__main__":
    main()
    try:
        import jax.extend.backend
        jax.extend.backend.clear_backends()
    except Exception:
        pass
    os._exit(0)
