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
    """Steady-state wall per boundary.  The warm call must use the SAME
    n_boundaries: the dispatcher's `boundaries` arg is a static Python int,
    so a different value compiles a fresh ~20s XLA program at 100k shapes —
    warming with 1 boundary and timing 3 measures the compiler, not the
    sweep (the round-3 cap-sweep numbers in doc/BENCH_LOG_r03.md §probe
    were dominated by exactly that)."""
    n = run.local_moves_per_global_move
    run.do_mcmc_steps(n * n_boundaries)   # warm/compile the same program
    tA = time.time()
    run.do_mcmc_steps(n * n_boundaries)
    _ = run.local_moves_attempted         # blocks on the in-flight queue
    return (time.time() - tA) / n_boundaries


def main():
    from delphy_tpu.run import Run

    tree = pickle.load(open("/tmp/tree100k_run.pkl", "rb"))
    log(f"tree loaded: {tree.num_tips} tips, {tree.num_mutations()} muts")

    # part-size-cap sweep (topology off: pure sweep+globals boundary time);
    # compute per block is O(P * NC^2) while attempted moves are O(P * mean
    # part fill) — a tighter cap trades grid steps for mask area
    for cap in [int(c) for c in
                os.environ.get("PROBE_CAPS", "768,504,376,248").split(",")]:
        os.environ["DELPHY_TPU_PART_CAP"] = str(cap)
        r = Run(tree, seed=7, num_cells=400, topology_moves_enabled=False)
        sizes = np.asarray(r.pm.n_nodes)
        bt = boundary_time(r)
        log(f"cap={cap}: P={r.pm.node_map.shape[0]} n_cap={r._n_cap_sticky} "
            f"mean_fill={sizes[sizes>0].mean():.0f} "
            f"boundary {bt:.2f}s = "
            f"{r.local_moves_per_global_move/bt:,.0f} moves/s "
            f"(pallas={r._allow_pallas})")
        del r

    os.environ.pop("DELPHY_TPU_PART_CAP", None)
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
