import os, time, sys
os.environ.setdefault("DELPHY_TPU_F32", "1")
sys.path.insert(0, "/root/repo")
t0 = time.time()
def log(m): print(f"[{time.time()-t0:7.1f}s] {m}", flush=True)

import numpy as np, jax
from delphy_tpu.sim import simulate_dataset
from delphy_tpu.phylo import build_greedy_tree
from delphy_tpu.run import Run
from delphy_tpu.mcmc.kernel import super_step

ref, deltas, miss, dates, names, _ = simulate_dataset(20, 2000, mu=1.2e-3/365,
    sample_window_days=500.0, missing_fraction=0.01, seed=42)
tree = build_greedy_tree(ref, deltas, miss, dates, names=names, rng=np.random.default_rng(42))
run = Run(tree, seed=1, num_cells=400, topology_moves_enabled=False)
log("built")

out = super_step(run.ts, run.evo, run.pop, run.key, run.tin, run.tout,
                 1950, run.t_max_tip, run.hyp, run.num_cells)
jax.block_until_ready(out)
log("compile done")
for trial in range(3):
    tA = time.time()
    out = super_step(run.ts, run.evo, run.pop, run.key, run.tin, run.tout,
                     1950, run.t_max_tip, run.hyp, run.num_cells)
    jax.block_until_ready(out)
    log(f"super_step(1950) dispatch: {time.time()-tA:.3f}s")
# sweep-only vs globals-only timing
from delphy_tpu.mcmc.kernel import run_global_moves, run_local_sweep
import jax.numpy as jnp
gm_j = jax.jit(lambda *a: run_global_moves(*a, run.t_max_tip, run.hyp, run.num_cells))
out2 = gm_j(run.ts, run.evo, run.pop, run.key, run.tin, run.tout)
jax.block_until_ready(out2)
tA = time.time()
out2 = gm_j(run.ts, run.evo, run.pop, run.key, run.tin, run.tout)
jax.block_until_ready(out2)
log(f"global_moves dispatch: {time.time()-tA:.3f}s")
ts2, evo2, pop2, grid2, caches2, ledger2, key2, stats2 = out2
sw_j = jax.jit(lambda ts, caches, grid, ledger, evo, pop, key, n: run_local_sweep(
    ts, caches, grid, ledger, evo, pop, key, n, run.t_max_tip))
out3 = sw_j(ts2, caches2, grid2, ledger2, evo2, pop2, key2, 1950)
jax.block_until_ready(out3)
tA = time.time()
out3 = sw_j(ts2, caches2, grid2, ledger2, evo2, pop2, key2, 1950)
jax.block_until_ready(out3)
log(f"local_sweep(1950) dispatch: {time.time()-tA:.3f}s")
log("DONE")
os._exit(0)
