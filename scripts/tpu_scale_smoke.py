import os, sys, time
os.environ.setdefault("DELPHY_TPU_F32", "1")
sys.path.insert(0, "/root/repo")
t0 = time.time()
def log(m): print(f"[{time.time()-t0:7.1f}s] {m}", flush=True)
import numpy as np
from delphy_tpu.sim import simulate_dataset
from delphy_tpu.init_tree import build_initial_tree
from delphy_tpu.run import Run

def main():
    import sys
    T, L = (757, 29903) if '--sars' in sys.argv else (500, 5000)
    ref, deltas, miss, dates, names, _ = simulate_dataset(
        T, L, mu=1e-3/365, sample_window_days=700.0, coalescent_n0=300.0,
        missing_fraction=0.03, seed=7)
    log(f"dataset built: {sum(len(d) for d in deltas)} deltas")
    tree = build_initial_tree(ref, deltas, miss, dates, names=names,
                             rng=np.random.default_rng(7))
    log(f"greedy init: {tree.num_mutations()} muts")
    run = Run(tree, seed=7, num_cells=400)
    log(f"run built; lmpgm={run.local_moves_per_global_move} parts={run._topology_num_parts()}")
    run.do_mcmc_steps(100)
    log("first steps + compile done")
    tA = time.time()
    base = run.local_moves_attempted
    run.do_mcmc_steps(100_000)
    dt = time.time() - tA
    att = run.local_moves_attempted - base
    log(f"100k nominal ({att} attempted) in {dt:.1f}s = {att/dt:,.0f} moves/s")
    log(run.stats_line())
    run.check_derived_quantities(1.0)
    log("ledger OK; DONE")
    os._exit(0)


if __name__ == "__main__":
    main()
