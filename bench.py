#!/usr/bin/env python
"""Benchmark: MCMC local-move throughput on an Ebola-scale synthetic dataset.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline: reference delphy sustains ~0.5 M steps/s on the Ebola dataset
(81 seqs x 18,959 sites) on an AWS c5a.2xlarge (delphywp.pdf §5; BASELINE.md).
"""

import json
import os
import sys
import time

# single precision on the hot path (f64 is software-emulated on TPU); the
# ledger is re-derived in full at every global boundary
os.environ.setdefault("DELPHY_TPU_F32", "1")


def _tpu_tunnel_preflight():
    """Fail fast (instead of hanging in backend init) when the axon tunnel
    relay is down: jax.devices() retries a dead endpoint forever.  Observed
    2026-08-18 after a remote compile-server crash killed the relay; see
    doc/BENCH_LOG_r02.md for the measured results from before the outage."""
    import socket
    ports = [8082, 8083, 8087, 8092, 8093, 8097, 8102, 8103, 8107,
             8112, 8113, 8117]
    for p in ports:
        s = socket.socket()
        s.settimeout(0.5)
        try:
            s.connect(("127.0.0.1", p))
            return True
        except OSError:
            continue
        finally:
            s.close()
    return False


def main():
    if (os.environ.get("JAX_PLATFORMS", "") in ("", "axon")
            and not _tpu_tunnel_preflight()):
        print("bench.py: TPU tunnel relay is not listening on any axon port; "
              "refusing to hang in backend init. Last measured results: "
              "doc/BENCH_LOG_r02.md (Ebola 1.05-1.07M moves/s, 2.11-2.14x).",
              file=sys.stderr, flush=True)
        sys.exit(3)
    import numpy as np
    from delphy_tpu.io.maple import read_maple
    from delphy_tpu.init_tree import build_initial_tree
    from delphy_tpu.run import Run

    def note(msg):
        print(f"[bench +{time.time() - t_start:.1f}s] {msg}",
              file=sys.stderr, flush=True)

    t_start = time.time()
    # FROZEN Ebola-scale dataset (81 tips x 18,959 sites, Gire-2014-like
    # structured missingness; scripts/make_frozen_benchmark.py) parsed
    # through the production MAPLE input path — the same bytes every round.
    mf = read_maple(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "data", "ebola2014_like_81x18959.maple"))
    tips = mf.tips
    note(f"frozen dataset parsed ({len(tips)} tips x {len(mf.ref_seq)} sites)")
    tree = build_initial_tree(mf.ref_seq, [t.deltas for t in tips],
                              [t.miss_intervals for t in tips],
                              [(t.t_min, t.t_max) for t in tips],
                              names=[t.name for t in tips],
                              rng=np.random.default_rng(42))
    note("tree built")
    run = Run(tree, seed=1, num_cells=400)
    note(f"Run constructed (P={run.device_partitions})")

    target_seconds = float(os.environ.get("BENCH_SECONDS", "20"))
    # a whole multi-boundary dispatch per iteration (one host sync each)
    n = run.local_moves_per_global_move * run.topology_burst_chunks
    run.do_mcmc_steps(10)  # compile + warm the single-boundary path
    note("1-boundary warmup done")
    run.do_mcmc_steps(n)   # compile + warm the multi-boundary path
    note("multi-boundary warmup done")
    t0 = time.time()
    base = run.local_moves_attempted
    while time.time() - t0 < target_seconds:
        run.do_mcmc_steps(n)
        note("dispatch done")
    # drain in-flight dispatches INSIDE the timed window for exact accounting
    total = run.local_moves_attempted - base
    dt = time.time() - t0
    moves_per_s = total / dt

    # f32 within-window drift bound: measured ~2e-3 at |log_G|~1e4 per
    # boundary window (scripts/f32_study.py), scaled to Ebola |log_G|~4.5e4
    # with 5x headroom.  The ledger is fully re-derived each global boundary,
    # so this bounds ALL incremental error the invariant can legitimately see.
    run.check_derived_quantities(0.05)

    baseline = 0.5e6  # reference Ebola steps/s on 8-vCPU c5a.2xlarge
    print(json.dumps({
        "metric": "mcmc_local_moves_per_second_ebola_scale",
        "value": round(moves_per_s, 1),
        "unit": "moves/s",
        "vs_baseline": round(moves_per_s / baseline, 4),
    }))


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    # destroy the PJRT client FIRST so the axon terminal sees a clean
    # disconnect and releases the chip (otherwise the next client blocks
    # until the server's claim timeout, ~5-10 min); then hard-exit because
    # the tunnel keeps non-daemon threads alive
    try:
        import jax.extend.backend
        jax.extend.backend.clear_backends()
    except Exception:
        pass
    os._exit(0)
