#!/usr/bin/env python
"""Dissect the per-boundary fixed cost: time run_global_moves variants with
individual move families disabled (static PriorConfig toggles => separate
compiles), plus the sweep slope at several n_blocks.  TPU-serial: run alone."""
import os, sys, time, dataclasses
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
from delphy_tpu.mcmc.kernel import run_global_moves
from delphy_tpu.parallel.sweep import parts_multi_super_step

T, L = 81, 18959
ref, deltas, miss, dates, names, _ = simulate_dataset(
    T, L, mu=1.2e-3 / 365.0, sample_window_days=500.0,
    missing_fraction=0.01, seed=42)
tree = build_initial_tree(ref, deltas, miss, dates, names=names,
                          rng=np.random.default_rng(42))
run = Run(tree, seed=1, num_cells=400)
log(f"built (P={run.device_partitions})")

def time_jit(fn, *args, reps=20):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps

# --- global-move variants --------------------------------------------------
variants = {
    "full": {},
    "no_hky": dict(hky_moves_enabled=False),
    "no_mu": dict(mu_move_enabled=False),
    "no_pop": dict(pop_size_move_enabled=False,
                   pop_growth_rate_move_enabled=False),
    "no_hky_mu_pop": dict(hky_moves_enabled=False, mu_move_enabled=False,
                          pop_size_move_enabled=False,
                          pop_growth_rate_move_enabled=False),
}
for name, kw in variants.items():
    hyp = dataclasses.replace(run.hyp, **kw)
    f = jax.jit(lambda ts, evo, pop, key, hyp=hyp: run_global_moves(
        ts, evo, pop, key, run.tin, run.tout, run.t_max_tip, hyp,
        run.num_cells))
    dt = time_jit(f, run.ts, run.evo, run.pop, run.key)
    log(f"global_moves[{name}]: {dt*1e3:.2f} ms")

# --- sweep slope -----------------------------------------------------------
for nb in (1, 8, 32, 64):
    dt = time_jit(parts_multi_super_step, run.ts, run.evo, run.pop, run.key,
                  run.tin, run.tout, run.pm, nb, run.t_max_tip, run.hyp,
                  run.num_cells, 1, run._sweep_k_max, run._sweep_reform_batch,
                  reps=10)
    log(f"boundary+sweep[n_blocks={nb}]: {dt*1e3:.2f} ms")

log("DONE")
os._exit(0)
