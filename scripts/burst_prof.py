import sys, time, os
os.environ.setdefault("DELPHY_TPU_FORCE_CPU", "1")
sys.path.insert(0, "/root/repo")
import numpy as np

def main():
    from delphy_tpu.sim import simulate_dataset
    from delphy_tpu.phylo import build_greedy_tree, rereference_to_root_sequence
    from delphy_tpu.topo.mixer import HostExpPop
    from delphy_tpu.topo.partition import (generate_random_partition_stencil,
                                           partition_tree, reassemble)
    from delphy_tpu.topo.vsc import make_vsc_parts
    from delphy_tpu.topo.parallel import run_partitioned_bursts, _get_pool, run_part_burst
    from delphy_tpu.evo import make_evo_params
    import pickle

    T, L = 81, 18959
    ref, deltas, miss, dates, names, _ = simulate_dataset(
        T, L, mu=1.2e-3/365, sample_window_days=500.0, missing_fraction=0.01, seed=42)
    evo = make_evo_params(L, mu=1.2e-3/365, kappa=2.0)
    pop = HostExpPop(500.0, 1000.0, 0.0, 1.0)
    mu, nu, q, pi = float(evo.mu), np.asarray(evo.nu), np.asarray(evo.q), np.asarray(evo.pi)
    tree = build_greedy_tree(ref, deltas, miss, dates, names=names,
                             rng=np.random.default_rng(42))
    rng = np.random.default_rng(1)
    # warm pool
    run_partitioned_bursts(tree, 200, 8, pop, mu, nu, q, pi, rng, parallel=True)

    rereference_to_root_sequence(tree)
    t0 = time.time(); stencil = generate_random_partition_stencil(tree, 8, rng); t_sten = time.time()-t0
    t0 = time.time(); parts = partition_tree(tree, stencil); t_part = time.time()-t0
    rngs = [np.random.default_rng(i) for i in range(len(parts))]
    t0 = time.time(); vscs = make_vsc_parts(parts, pop, rngs, 2.0); t_vsc = time.time()-t0
    t0 = time.time()
    blobs = [pickle.dumps((p.tree, v, 100, p.includes_root, mu, nu, q, pi, 1))
             for p, v in zip(parts, vscs)]
    t_pickle = time.time()-t0
    sz = sum(len(b) for b in blobs)
    t0 = time.time(); reassemble(tree, parts); t_re = time.time()-t0
    print(f"stencil {t_sten*1e3:.1f}ms partition {t_part*1e3:.1f}ms vsc {t_vsc*1e3:.1f}ms "
          f"pickle {t_pickle*1e3:.1f}ms ({sz/1e6:.2f}MB) reassemble {t_re*1e3:.1f}ms", flush=True)

    # whole burst timing, warm
    for n in (500, 2000):
        t0 = time.time()
        dlg, acc, prop = run_partitioned_bursts(tree, n, 8, pop, mu, nu, q, pi, rng, parallel=True)
        dt = time.time()-t0
        print(f"warm burst n={n}: {dt:.2f}s = {n/dt:,.0f} moves/s", flush=True)

if __name__ == "__main__":
    main()
