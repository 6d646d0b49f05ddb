import sys, time, os
os.environ.setdefault("DELPHY_TPU_FORCE_CPU", "1")
sys.path.insert(0, "/root/repo")
import numpy as np

def main():
    from delphy_tpu.sim import simulate_dataset
    from delphy_tpu.phylo import build_greedy_tree, rereference_to_root_sequence
    from delphy_tpu.topo.mixer import HostExpPop, TopologyMixer
    from delphy_tpu.topo.parallel import run_partitioned_bursts
    from delphy_tpu.evo import make_evo_params

    T, L = 81, 18959
    ref, deltas, miss, dates, names, _ = simulate_dataset(
        T, L, mu=1.2e-3/365, sample_window_days=500.0, missing_fraction=0.01, seed=42)
    evo = make_evo_params(L, mu=1.2e-3/365, kappa=2.0)
    pop = HostExpPop(500.0, 1000.0, 0.0, 1.0)
    mu, nu, q, pi = float(evo.mu), np.asarray(evo.nu), np.asarray(evo.q), np.asarray(evo.pi)
    for P in (1, 2, 4, 6):
        tree = build_greedy_tree(ref, deltas, miss, dates, names=names,
                                 rng=np.random.default_rng(42))
        rng = np.random.default_rng(1)
        n = 1500
        t0 = time.time()
        if P == 1:
            rereference_to_root_sequence(tree)
            mixer = TopologyMixer(tree, rng)
            mixer.run_burst(n, mu, nu, q, pi, pop, 500.0)
            acc = mixer.n_accepted
        else:
            dlg, acc, prop = run_partitioned_bursts(
                tree, n, P, pop, mu, nu, q, pi, rng, parallel=True)
        dt = time.time() - t0
        print(f"P={P}: {n} moves in {dt:.2f}s = {n/dt:,.0f} moves/s (acc {acc})", flush=True)

if __name__ == "__main__":
    main()
