"""Build + cache the 100k benchmark tree (same dataset as scale_bench.py)."""

import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("DELPHY_TPU_F32", "1")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402

t0 = time.time()


def log(m):
    print(f"[{time.time()-t0:7.1f}s] {m}", flush=True)


def main():
    from delphy_tpu.sim import simulate_dataset
    from delphy_tpu.init_tree import build_initial_tree

    T = int(os.environ.get("SCALE_T", "100000"))
    L = int(os.environ.get("SCALE_L", "29903"))
    out = os.environ.get("TREE_OUT", f"/tmp/tree{T//1000}k_run.pkl")

    ref, deltas, miss, dates, names, _ = simulate_dataset(
        T, L, mu=1.0e-3 / 365, sample_window_days=1200.0,
        missing_fraction=0.02, seed=77)
    log(f"dataset: {sum(len(d) for d in deltas)} deltas")
    tree = build_initial_tree(ref, deltas, miss, dates, names=names,
                              rng=np.random.default_rng(77))
    log(f"init tree: {tree.num_mutations()} muts")
    pickle.dump(tree, open(out, "wb"))
    log(f"cached -> {out}")


if __name__ == "__main__":
    main()
