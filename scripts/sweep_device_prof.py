"""Device-sweep profile at 100k shapes (VERDICT r4 next-#6).

Isolates the Pallas sweep chain from the driver: loads the cached 100k
tree, builds the Run (topology off), then
  (a) times dispatches at several n_blocks to split per-dispatch fixed cost
      from per-block marginal cost (time = a + b * n_blocks),
  (b) computes an HBM roofline for the chain: per-part HBM traffic is the
      packed ctx arrays + uniforms + outputs (one load/store per dispatch —
      the chain runs all blocks from VMEM), so
      achieved_GB/s = total_bytes / (dispatch_time - fixed)
      and the compute-side number is attempted moves/s per block.

Env: TREE_PKL (default /tmp/tree100k_run.pkl), PROF_BOUNDARIES (default 1),
PROF_NB list (default "32,128,256,512"), DELPHY_TPU_F32=1 assumed.
"""

import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("DELPHY_TPU_F32", "1")

import numpy as np  # noqa: E402

t0 = time.time()


def log(m):
    print(f"[{time.time()-t0:7.1f}s] {m}", flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from delphy_tpu.run import Run
    from delphy_tpu.parallel.sweep import parts_multi_super_step

    pkl = os.environ.get("TREE_PKL", "/tmp/tree100k_run.pkl")
    tree = pickle.load(open(pkl, "rb"))
    log(f"tree loaded: {tree.num_tips} tips")
    run = Run(tree, seed=7, num_cells=400, topology_moves_enabled=False)
    log(f"Run: P={run.pm.node_map.shape[0]} n_cap={run._n_cap_sticky} "
        f"m_cap={run._m_cap_sticky}")

    boundaries = int(os.environ.get("PROF_BOUNDARIES", "1"))
    nbs = [int(x) for x in os.environ.get(
        "PROF_NB", "32,128,256,512").split(",")]

    # bytes that cross HBM per dispatch: every traced array operand + output
    # (upper bound: XLA may fuse/skip; the packed chain reads each once)
    def nbytes(tree_):
        return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(tree_)
                   if hasattr(x, "dtype"))

    in_bytes = nbytes((run.ts, run.evo, run.pop, run.pm, run.tin, run.tout))
    log(f"state+maps bytes: {in_bytes/1e9:.3f} GB")

    res = []
    for nb in nbs:
        args = (run.ts, run.evo, run.pop, run.key, run.tin, run.tout,
                run.pm, nb, run.t_max_tip, run.hyp, run.num_cells,
                boundaries, run._sweep_k_max, run._sweep_reform_batch)
        out = parts_multi_super_step(*args, allow_pallas=True, mesh=None)
        jax.block_until_ready(out)  # compile + warm
        reps = 3
        tA = time.time()
        att = 0
        for _ in range(reps):
            out = parts_multi_super_step(*args, allow_pallas=True, mesh=None)
            jax.block_until_ready(out)
            att += int(out[5]["local_moves_attempted"])
        dt = (time.time() - tA) / reps
        att //= reps
        res.append((nb, dt, att))
        log(f"nb={nb:4d}: {dt:7.3f} s/dispatch  {att:,} moves "
            f"({att/dt/1e6:.2f} M moves/s)")

    # linear fit: t = a + b*nb (per boundary)
    nbv = np.array([r[0] for r in res], float)
    tv = np.array([r[1] for r in res], float) / boundaries
    A = np.vstack([np.ones_like(nbv), nbv]).T
    (a, b), *_ = np.linalg.lstsq(A, tv, rcond=None)
    mv = np.array([r[2] for r in res], float) / boundaries
    moves_per_block = np.mean(mv / nbv)
    log(f"fit per boundary: fixed a={a*1e3:.1f} ms + b={b*1e3:.3f} ms/block; "
        f"{moves_per_block:,.0f} attempted moves/block "
        f"=> marginal {moves_per_block/b/1e6:.2f} M moves/s")
    log(f"HBM roofline: {in_bytes/1e9:.3f} GB state read/dispatch; at the "
        f"fixed cost a={a:.3f}s that is {in_bytes/1e9/a:.0f} GB/s achieved "
        f"(v5e HBM ~819 GB/s)")
    os._exit(0)


if __name__ == "__main__":
    main()
