import os, time, sys
os.environ.setdefault("DELPHY_TPU_F32", "1")
sys.path.insert(0, "/root/repo")
t0 = time.time()
def log(m): print(f"[{time.time()-t0:7.1f}s] {m}", flush=True)

import jax, jax.numpy as jnp
import delphy_tpu  # config
log(f"devices {jax.devices()}")

# (a) trivial fori_loop body, 10k iterations
def body_triv(i, c): return c * 1.000001 + 1e-9
f = jax.jit(lambda x: jax.lax.fori_loop(0, 10000, body_triv, x))
x = f(jnp.float32(1.0)); x.block_until_ready()
tA = time.time(); x = f(jnp.float32(2.0)); x.block_until_ready()
log(f"(a) trivial fori 10k iters: {time.time()-tA:.3f}s")

# (b) vector body with scatter+gather, C=400 M=640, 2000 iterations
C, M = 400, 640
def body_vec(i, carry):
    k, t, key = carry
    key, k1 = jax.random.split(key)
    idx = jax.random.randint(k1, (), 0, M)
    v = t[idx]
    dk = jnp.clip((v - jnp.arange(C, dtype=jnp.float32)) , 0., 1.)
    s = jnp.sum(k * dk)
    t = t.at[idx].set(v + 1e-6 * s)
    k = k + 1e-9 * dk
    return (k, t, key)
g = jax.jit(lambda k0: jax.lax.fori_loop(0, 2000, body_vec,
        (jnp.zeros(C), jnp.zeros(M), k0)))
r = g(jax.random.PRNGKey(0)); jax.block_until_ready(r)
tA = time.time(); r = g(jax.random.PRNGKey(1)); jax.block_until_ready(r)
log(f"(b) vec body fori 2000 iters: {time.time()-tA:.3f}s")

# (c) same body but with random.split/uniform heavy usage like our moves
def body_rng(i, carry):
    t, key = carry
    key, k1, k2, k3, k4, k5 = jax.random.split(key, 6)
    u1 = jax.random.uniform(k1, (), jnp.float32)
    u2 = jax.random.uniform(k2, (M,), jnp.float32)
    u3 = jax.random.normal(k3, (), jnp.float32)
    t = t + 1e-9 * (u1 + jnp.sum(u2) + u3)
    return (t, key)
h = jax.jit(lambda k0: jax.lax.fori_loop(0, 2000, body_rng, (jnp.float32(0), k0)))
r = h(jax.random.PRNGKey(0)); jax.block_until_ready(r)
tA = time.time(); r = h(jax.random.PRNGKey(1)); jax.block_until_ready(r)
log(f"(c) rng-heavy fori 2000 iters: {time.time()-tA:.3f}s")

# (d) lexsort in a loop, 200 iterations
def body_sort(i, carry):
    a, key = carry
    key, k1 = jax.random.split(key)
    u = jax.random.uniform(k1, (M,), jnp.float32)
    p = jnp.lexsort((u, a))
    a = a + 1e-9 * p[0]
    return (a, key)
s_ = jax.jit(lambda k0: jax.lax.fori_loop(0, 200, body_sort, (jnp.zeros(M), k0)))
r = s_(jax.random.PRNGKey(0)); jax.block_until_ready(r)
tA = time.time(); r = s_(jax.random.PRNGKey(2)); jax.block_until_ready(r)
log(f"(d) lexsort fori 200 iters: {time.time()-tA:.3f}s")
log("DONE")
os._exit(0)
