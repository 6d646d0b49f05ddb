import os, time, sys
os.environ.setdefault("DELPHY_TPU_F32", "1")
sys.path.insert(0, "/root/repo")
t0 = time.time()
def log(m): print(f"[{time.time()-t0:7.1f}s] {m}", flush=True)

import numpy as np, jax
from delphy_tpu.sim import simulate_dataset
from delphy_tpu.phylo import build_greedy_tree
from delphy_tpu.run import Run
from delphy_tpu.state import unpack_state, pack_state

ref, deltas, miss, dates, names, _ = simulate_dataset(20, 2000, mu=1.2e-3/365,
    sample_window_days=500.0, missing_fraction=0.01, seed=42)
tree = build_greedy_tree(ref, deltas, miss, dates, names=names, rng=np.random.default_rng(42))
run = Run(tree, seed=1, num_cells=400)
log("built")
# measure single-array pull
import jax.numpy as jnp
x = run.ts.t
tA = time.time(); _ = np.asarray(x); log(f"pull 1 small array: {time.time()-tA:.3f}s")
tA = time.time(); _ = np.asarray(run.ts.mut_t); log(f"pull pool array: {time.time()-tA:.3f}s")
tA = time.time(); _ = jax.device_get(run.ts); log(f"device_get(all TreeState): {time.time()-tA:.3f}s")
tA = time.time(); tr = unpack_state(run.ts, names=run.names); log(f"unpack_state: {time.time()-tA:.3f}s")
tA = time.time(); ts2 = pack_state(tr, run.mut_capacity, run.miss_capacity, run.fs_capacity); jax.block_until_ready(ts2.t); log(f"pack_state: {time.time()-tA:.3f}s")
tA = time.time(); run._topology_burst(130); log(f"topology_burst(130): {time.time()-tA:.3f}s")
log("DONE")
os._exit(0)
