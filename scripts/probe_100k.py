"""Decompose the 100k-tip boundary cost on the TPU: sweep vs globals vs
topology burst vs Pallas-vs-XLA.  Needs /tmp/tree100k_run.pkl (cached init).
"""

import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("DELPHY_TPU_F32", "1")

import numpy as np  # noqa: E402

import delphy_tpu  # noqa: F401

t0 = time.time()


def log(m):
    print(f"[{time.time()-t0:7.1f}s] {m}", flush=True)


def boundary_time(run, n_boundaries=3):
    n = run.local_moves_per_global_move
    run.do_mcmc_steps(n)          # warm/compile
    tA = time.time()
    run.do_mcmc_steps(n * n_boundaries)
    return (time.time() - tA) / n_boundaries


def main():
    from delphy_tpu.run import Run

    tree = pickle.load(open("/tmp/tree100k_run.pkl", "rb"))
    log(f"tree loaded: {tree.num_tips} tips, {tree.num_mutations()} muts")

    # full config (topology on) — steady boundary time
    run = Run(tree, seed=7, num_cells=400)
    log(f"P={run.pm.node_map.shape[0]} n_cap={run._n_cap_sticky} "
        f"m_cap={run._m_cap_sticky} lmpgm={run.local_moves_per_global_move}")
    bt = boundary_time(run)
    log(f"boundary (topology on, pallas={run._allow_pallas}): {bt:.2f}s "
        f"= {run.local_moves_per_global_move/bt:,.0f} moves/s")
    del run

    # globals-only cost: tiny lmpgm makes the sweep negligible
    rg = Run(tree, seed=7, num_cells=400, topology_moves_enabled=False,
             local_moves_per_global_move=2000)
    gt = boundary_time(rg, n_boundaries=5)
    log(f"boundary (lmpgm=2000 ~= globals only): {gt:.2f}s")
    del rg

    # XLA sweep path at the same shapes
    os.environ["DELPHY_TPU_PALLAS"] = "0"
    rx = Run(tree, seed=7, num_cells=400, topology_moves_enabled=False)
    xt = boundary_time(rx)
    log(f"boundary (XLA sweep, topology off): {xt:.2f}s "
        f"= {rx.local_moves_per_global_move/xt:,.0f} moves/s")
    os._exit(0)


if __name__ == "__main__":
    main()
