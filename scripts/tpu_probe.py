"""Sequential TPU capability probe — run as the ONLY TPU process; never kill
mid-flight (the relay holds the chip grant server-side)."""
import sys
import time

t_start = time.time()


def log(msg):
    print(f"[{time.time() - t_start:8.1f}s] {msg}", flush=True)


import jax
import jax.numpy as jnp

log(f"devices: {jax.devices()}")

# 1. f32 baseline
t0 = time.time()
y = jax.jit(lambda a: (a * a).sum())(jnp.arange(1024, dtype=jnp.float32))
y.block_until_ready()
log(f"f32 jit sum: {y}  ({time.time() - t0:.1f}s)")

# 2. f64 elementwise
jax.config.update("jax_enable_x64", True)
t0 = time.time()
y = jax.jit(lambda a: (a * a + 1.0).sum())(jnp.arange(1024, dtype=jnp.float64))
y.block_until_ready()
log(f"f64 jit sum: {y}  ({time.time() - t0:.1f}s)")

# 3. f64 cumsum (scan-heavy)
t0 = time.time()
y = jax.jit(lambda a: jnp.cumsum(a).sum())(jnp.arange(1024, dtype=jnp.float64))
y.block_until_ready()
log(f"f64 cumsum: {y}  ({time.time() - t0:.1f}s)")

# 4. f64 gamma sampling
t0 = time.time()
g = jax.jit(lambda k: jax.random.gamma(k, 2.5, dtype=jnp.float64))(jax.random.PRNGKey(0))
g.block_until_ready()
log(f"f64 gamma: {g}  ({time.time() - t0:.1f}s)")

# 5. f64 lexsort
t0 = time.time()
x = jnp.arange(4096, dtype=jnp.float64)
s = jax.jit(lambda a: jnp.lexsort((a, a))[0])(x)
s.block_until_ready()
log(f"f64 lexsort: {s}  ({time.time() - t0:.1f}s)")

# 6. f64 fori_loop with small body
t0 = time.time()


def body(i, c):
    return c + jnp.log1p(jnp.exp(-c * 1e-3))


z = jax.jit(lambda a: jax.lax.fori_loop(0, 1000, body, a))(jnp.float64(1.0))
z.block_until_ready()
log(f"f64 fori: {z}  ({time.time() - t0:.1f}s)")

log("ALL PRIMITIVE PROBES PASSED")

# 7. tiny super_step
sys.path.insert(0, "/root/repo")
import numpy as np
from delphy_tpu.sim import simulate_dataset
from delphy_tpu.phylo import build_random_tree
from delphy_tpu.run import Run

ref, deltas, miss, dates, names, _ = simulate_dataset(8, 64, mu=2e-3, seed=0)
tree = build_random_tree(ref, deltas, miss, dates, names=names,
                         rng=np.random.default_rng(0))
run = Run(tree, seed=1, num_cells=64, local_moves_per_global_move=64)
t0 = time.time()
run.do_mcmc_steps(64)
log(f"tiny super_step compile+run: ({time.time() - t0:.1f}s)")
t0 = time.time()
run.do_mcmc_steps(640)
log(f"tiny 640 more steps: ({time.time() - t0:.1f}s)")
run.check_derived_quantities(1e-5)
log("tiny ledger invariant OK on TPU")

import os

log("DONE")
os._exit(0)
