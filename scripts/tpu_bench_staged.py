"""Staged TPU bench: small -> large, verbose, single process."""
import sys; sys.path.insert(0, "/root/repo")
import time, sys, os
os.environ.setdefault("DELPHY_TPU_F32", "1")
t0 = time.time()
def log(m): print(f"[{time.time()-t0:7.1f}s] {m}", flush=True)

import numpy as np
from delphy_tpu.sim import simulate_dataset
from delphy_tpu.phylo import build_greedy_tree
from delphy_tpu.run import Run
import jax
log(f"devices: {jax.devices()}")

for (T, L, steps) in [(20, 2000, 4000), (81, 18959, 20000)]:
    log(f"=== dataset T={T} L={L} ===")
    ref, deltas, miss, dates, names, _ = simulate_dataset(
        T, L, mu=1.2e-3/365, sample_window_days=500.0, missing_fraction=0.01, seed=42)
    tree = build_greedy_tree(ref, deltas, miss, dates, names=names,
                             rng=np.random.default_rng(42))
    run = Run(tree, seed=1, num_cells=400)
    log(f"run built: muts={tree.num_mutations()} mut_cap={run.mut_capacity}")
    tA = time.time()
    run.do_mcmc_steps(10)
    log(f"first super_step (compile): {time.time()-tA:.1f}s")
    tA = time.time()
    base = run.local_moves_attempted
    run.do_mcmc_steps(steps)
    dt = time.time() - tA
    att = run.local_moves_attempted - base
    log(f"{steps} nominal ({att} attempted) in {dt:.2f}s = {att/dt:,.0f} attempted moves/s  | {run.stats_line()}")
    run.check_derived_quantities(1e-2)
    log("ledger invariant OK")
log("DONE")
os._exit(0)
