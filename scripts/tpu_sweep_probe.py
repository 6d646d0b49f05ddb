#!/usr/bin/env python
"""Per-segment cost of the partitioned sweep block: time part_sweep variants
with segments knocked out (monkeypatched no-ops).  TPU-serial: run alone."""
import os, sys, time
os.environ.setdefault("DELPHY_TPU_F32", "1")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax

def log(m):
    print(f"[{time.time()-T0:7.1f}s] {m}", flush=True)

T0 = time.time()
from delphy_tpu.sim import simulate_dataset
from delphy_tpu.init_tree import build_initial_tree
from delphy_tpu.run import Run
from delphy_tpu.parallel import sweep as sw

T, L = 81, 18959
ref, deltas, miss, dates, names, _ = simulate_dataset(
    T, L, mu=1.2e-3 / 365.0, sample_window_days=500.0,
    missing_fraction=0.01, seed=42)
tree = build_initial_tree(ref, deltas, miss, dates, names=names,
                          rng=np.random.default_rng(42))
run = Run(tree, seed=1, num_cells=400)
log(f"built (P={run.device_partitions}, n_cap={run._n_cap_sticky}, "
    f"m_cap={run._m_cap_sticky})")

orig_single = sw._single_displace
orig_batched = sw._batched_displace
orig_reform = sw._batched_reform

def nop_single(ctx, sh, pop_params, carry, keys):
    return carry

def nop_batched(ctx, sh, pop_params, carry, keys, k_max, cells_per_block=16):
    return carry

def nop_reform(ctx, carry, keys):
    return carry

def timeit(label, nb=33, reps=10):
    f = jax.jit(sw.parts_multi_super_step.__wrapped__,
                static_argnames=("hyp", "num_cells", "n_boundaries",
                                 "k_max", "reform_batch"))
    args = (run.ts, run.evo, run.pop, run.key, run.tin, run.tout, run.pm,
            nb, run.t_max_tip, run.hyp, run.num_cells, 1,
            run._sweep_k_max, run._sweep_reform_batch)
    out = f(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    log(f"{label}: {dt*1e3:.2f} ms  (nb={nb})")
    return dt

base1 = timeit("full nb=1", nb=1)
base = timeit("full", nb=33)
sw._single_displace = nop_single
t = timeit("no single", nb=33)
sw._single_displace = orig_single
sw._batched_displace = nop_batched
t = timeit("no batched", nb=33)
sw._batched_displace = orig_batched
sw._batched_reform = nop_reform
t = timeit("no reform", nb=33)
sw._batched_reform = orig_reform
sw._single_displace = nop_single
sw._batched_displace = nop_batched
sw._batched_reform = nop_reform
t = timeit("empty blocks", nb=33)
log("DONE")
os._exit(0)
