"""Single-threaded native topology-kernel micro-benchmark (SARS scale).

Times delphy_run_topo_burst per move on one partition's tree so kernel
optimizations can be measured without the pool/pickle machinery.  Run with
DELPHY_TPU_NATIVE_PROF_HOLD=1 to loop forever for external stack sampling.
"""
import sys, time, os
os.environ.setdefault("DELPHY_TPU_FORCE_CPU", "1")
sys.path.insert(0, "/root/repo")
import numpy as np


def main():
    from delphy_tpu.sim import simulate_dataset
    from delphy_tpu.phylo import build_greedy_tree, rereference_to_root_sequence
    from delphy_tpu.topo.mixer import HostExpPop
    from delphy_tpu.native import native_available, run_burst_native
    from delphy_tpu.evo import make_evo_params
    assert native_available()

    T, L = 757, 29903
    ref, deltas, miss, dates, names, _ = simulate_dataset(
        T, L, mu=1.0e-3 / 365, sample_window_days=700.0,
        missing_fraction=0.02, seed=42)
    evo = make_evo_params(L, mu=1.0e-3 / 365, kappa=2.0)
    pop = HostExpPop(700.0, 1000.0, 0.0, 1.0)
    mu, nu, q, pi = (float(evo.mu), np.asarray(evo.nu), np.asarray(evo.q),
                     np.asarray(evo.pi))
    t0 = time.time()
    tree = build_greedy_tree(ref, deltas, miss, dates, names=names,
                             rng=np.random.default_rng(42))
    rereference_to_root_sequence(tree)
    print(f"tree built: {time.time()-t0:.1f}s, muts={tree.num_mutations()}",
          flush=True)
    t_max_tip = float(np.max(tree.t_max[:tree.num_tips]))
    # warm
    run_burst_native(tree, 2000, mu, nu, q, pi, pop, 7, True,
                     t_max_tip=t_max_tip)
    hold = os.environ.get("DELPHY_TPU_NATIVE_PROF_HOLD") == "1"
    n = int(os.environ.get("DELPHY_TPU_NATIVE_PROF_N", "200000"))
    print(f"pid={os.getpid()}", flush=True)
    seed = 8
    while True:
        t0 = time.time()
        res = run_burst_native(tree, n, mu, nu, q, pi, pop, seed, True,
                               t_max_tip=t_max_tip)
        dt = time.time() - t0
        seed += 1
        print(f"{n} moves in {dt:.2f}s = {dt/n*1e6:.1f} us/move "
              f"(acc {res[2]})", flush=True)
        if not hold:
            break


if __name__ == "__main__":
    main()
