#!/usr/bin/env python
"""Decompose the Ebola-scale bench cycle: device sweep compute vs tunnel
transfer vs host topology burst, and the effect of topology_burst_chunks (K).

Usage: python scripts/profile_cycle.py [K ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("DELPHY_TPU_F32", "1")

import numpy as np


def main():
    from delphy_tpu.sim import simulate_dataset
    from delphy_tpu.init_tree import build_initial_tree
    from delphy_tpu.run import Run

    T, L = 81, 18959
    ref, deltas, miss, dates, names, _ = simulate_dataset(
        T, L, mu=1.2e-3 / 365.0 * 19000 / L, sample_window_days=500.0,
        missing_fraction=0.01, seed=42)
    tree = build_initial_tree(ref, deltas, miss, dates, names=names,
                              rng=np.random.default_rng(42))

    ks = [int(a) for a in sys.argv[1:]] or [32]
    for K in ks:
        run = Run(tree, seed=1, num_cells=400)
        run.topology_burst_chunks = K
        n = run.local_moves_per_global_move * K
        run.do_mcmc_steps(10)
        run.do_mcmc_steps(n)  # warm multi-boundary
        # pure sweep throughput (no topology)
        run2 = Run(tree, seed=1, num_cells=400, topology_moves_enabled=False)
        run2.topology_burst_chunks = K
        run2.do_mcmc_steps(10)
        run2.do_mcmc_steps(n)
        t0 = time.time()
        base = run2.local_moves_attempted
        for _ in range(4):
            run2.do_mcmc_steps(n)
        sweep_only = (run2.local_moves_attempted - base) / (time.time() - t0)

        t0 = time.time()
        base = run.local_moves_attempted
        for _ in range(4):
            run.do_mcmc_steps(n)
        full = (run.local_moves_attempted - base) / (time.time() - t0)
        print(f"K={K:3d}  sweep-only {sweep_only/1e6:.3f} M/s   "
              f"full {full/1e6:.3f} M/s", flush=True)


if __name__ == "__main__":
    main()
    try:
        import jax.extend.backend
        jax.extend.backend.clear_backends()
    except Exception:
        pass
    os._exit(0)
