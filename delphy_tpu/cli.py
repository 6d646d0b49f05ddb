"""Command-line interface mirroring the reference's unstable --v0-* flag set
(core/cmdline.cpp:164-381; the subset implemented so far).

Main loop structure follows tools/delphy.cpp:128-219: interleave
do_mcmc_steps with a stats line, BEAST-format .log/.trees output at their
cadences.
"""

from __future__ import annotations

import argparse
import math
import sys
import time
from collections import deque

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="delphy-tpu",
        description="TPU-native Bayesian phylogenetics via Explicit Mutation-Annotated Trees")
    p.add_argument("--version", action="store_true")
    a = p.add_argument
    a("--v0-in-fasta", metavar="FILE")
    a("--v0-in-maple", metavar="FILE")
    a("--v0-steps", type=int, default=-1, help="default: 100,000 per tip")
    a("--v0-seed", type=int, default=0)
    a("--v0-threads", type=int, default=1, help="accepted for compatibility (device mesh governs parallelism)")
    a("--v0-paranoid", action="store_true")
    a("--v0-out-log-file", metavar="FILE")
    a("--v0-log-every", type=int, default=-1)
    a("--v0-out-trees-file", metavar="FILE")
    a("--v0-tree-every", type=int, default=-1)
    a("--v0-site-rate-heterogeneity", action="store_true")
    a("--v0-mpox-hack", action="store_true")
    a("--v0-init-mutation-rate", type=float, default=None)
    a("--v0-fix-mutation-rate", action="store_true")
    a("--v0-mu-prior-mean", type=float, default=None)
    a("--v0-mu-prior-stddev", type=float, default=None)
    a("--v0-mu-prior-alpha", type=float, default=None)
    a("--v0-mu-prior-beta", type=float, default=None)
    a("--v0-pop-model", choices=["exp", "skygrid"], default="exp")
    a("--v0-init-final-pop-size", type=float, default=None)
    a("--v0-fix-final-pop-size", action="store_true")
    a("--v0-init-pop-growth-rate", type=float, default=None)
    a("--v0-fix-pop-growth-rate", action="store_true")
    a("--v0-pop-growth-rate-min", type=float, default=-math.inf)
    a("--v0-pop-growth-rate-max", type=float, default=math.inf)
    a("--v0-pop-min-pop", type=float, default=None)
    a("--v0-pop-g-prior-mu", type=float, default=None)
    a("--v0-pop-g-prior-scale", type=float, default=None)
    a("--v0-target-coal-prior-cells", type=int, default=400)
    a("--v0-init", choices=["random", "greedy", "mp-plus-timing"],
      default="mp-plus-timing",
      help="'greedy'/'mp-plus-timing': nearest-neighbour parsimony guide tree; 'random': random coalescent topology")
    a("--v0-skygrid-type", choices=["staircase", "log-linear"], default="staircase")
    a("--v0-skygrid-num-parameters", type=int, default=50)
    a("--v0-skygrid-cutoff", type=float, default=0.0,
      help="years before last tip for the final transition (0 = auto)")
    a("--v0-skygrid-tau", type=float, default=1.0)
    a("--v0-skygrid-tau-prior-alpha", type=float, default=0.001)
    a("--v0-skygrid-tau-prior-beta", type=float, default=0.001)
    a("--v0-skygrid-disable-low-pop-barrier", action="store_true")
    a("--v0-out-delphy-file", metavar="FILE",
      help="run snapshot (npz save/resume; functional .dphy counterpart)")
    a("--v0-delphy-snapshot-every", type=int, default=-1)
    a("--v0-out-beast-version", default="2.6.2",
      choices=["2.6.2", "X-10.5.0"])
    a("--v0-out-beast-xml", metavar="FILE",
      help="export an equivalent BEAST2 XML config and exit")
    a("--v0-out-mcc-file", metavar="FILE",
      help="MCC tree (NEXUS) derived from sampled trees at --v0-tree-every")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    if args.version:
        from .version import __version__
        print(f"delphy-tpu {__version__}")
        return 0

    from .io.maple import read_maple
    from .io.fasta import read_fasta, deduce_consensus, fasta_to_tips
    from .io.beast_out import BeastLogOutput, BeastTreesOutput
    from .phylo import build_random_tree
    from .run import Run
    from .mcmc.global_moves import PriorConfig

    warn = lambda msg: print(f"WARNING: {msg}", file=sys.stderr)

    if args.v0_in_maple:
        mf = read_maple(args.v0_in_maple, warn=warn)
        ref_seq, tips = mf.ref_seq, mf.tips
    elif args.v0_in_fasta:
        records = read_fasta(args.v0_in_fasta)
        if not records:
            print("ERROR: empty FASTA", file=sys.stderr)
            return 1
        length = max(len(r.bits) for r in records)
        ref_seq = deduce_consensus(records, length)
        tips = fasta_to_tips(records, ref_seq, warn=warn)
    else:
        print("ERROR: provide --v0-in-fasta or --v0-in-maple", file=sys.stderr)
        return 1

    if len(tips) < 2:
        print("ERROR: need at least 2 usable tips", file=sys.stderr)
        return 1
    print(f"Read {len(tips)} tips, {len(ref_seq)} sites", file=sys.stderr)

    rng = np.random.default_rng(args.v0_seed)
    if args.v0_init == "random":
        builder = build_random_tree
    elif args.v0_init == "greedy":
        from .phylo import build_greedy_tree as builder
    else:  # mp-plus-timing: guide tree + Fitch factoring + OLS rooting
        from .init_tree import build_initial_tree as builder
    tree = builder(
        ref_seq,
        [t.deltas for t in tips],
        [t.miss_intervals for t in tips],
        [(t.t_min, t.t_max) for t in tips],
        names=[t.name for t in tips],
        rng=rng)

    # prior conveniences (cmdline.cpp:125-157): mean/stddev -> Gamma alpha/beta
    hyp_kwargs = {}
    if args.v0_mu_prior_mean is not None and args.v0_mu_prior_stddev is not None:
        m, s = args.v0_mu_prior_mean / 365.0, args.v0_mu_prior_stddev / 365.0
        hyp_kwargs["mu_prior_alpha"] = (m / s) ** 2
        hyp_kwargs["mu_prior_beta"] = m / (s * s)
    if args.v0_mu_prior_alpha is not None:
        hyp_kwargs["mu_prior_alpha"] = args.v0_mu_prior_alpha
    if args.v0_mu_prior_beta is not None:
        hyp_kwargs["mu_prior_beta"] = args.v0_mu_prior_beta
    if args.v0_pop_g_prior_mu is not None:
        hyp_kwargs["pop_g_prior_mu"] = args.v0_pop_g_prior_mu / 365.0
    if args.v0_pop_g_prior_scale is not None:
        hyp_kwargs["pop_g_prior_scale"] = args.v0_pop_g_prior_scale / 365.0
    hyp = PriorConfig(
        alpha_move_enabled=args.v0_site_rate_heterogeneity,
        mu_fixed=args.v0_fix_mutation_rate,
        pop_size_move_enabled=not args.v0_fix_final_pop_size,
        pop_growth_rate_move_enabled=not args.v0_fix_pop_growth_rate,
        pop_g_min=args.v0_pop_growth_rate_min / 365.0 if math.isfinite(args.v0_pop_growth_rate_min) else -math.inf,
        pop_g_max=args.v0_pop_growth_rate_max / 365.0 if math.isfinite(args.v0_pop_growth_rate_max) else math.inf,
        skygrid_tau_prior_alpha=args.v0_skygrid_tau_prior_alpha,
        skygrid_tau_prior_beta=args.v0_skygrid_tau_prior_beta,
        skygrid_low_gamma_barrier_enabled=not args.v0_skygrid_disable_low_pop_barrier,
        **hyp_kwargs)

    from delphy_tpu import pop as popm
    run = Run(tree, seed=args.v0_seed, hyp=hyp,
              mpox_hack=args.v0_mpox_hack,
              num_cells=max(64, args.v0_target_coal_prior_cells),
              pop_model=args.v0_pop_model,
              skygrid_num_parameters=args.v0_skygrid_num_parameters,
              skygrid_cutoff_days=(args.v0_skygrid_cutoff * 365.0
                                   if args.v0_skygrid_cutoff > 0 else None),
              skygrid_type=(popm.STAIRCASE if args.v0_skygrid_type == "staircase"
                            else popm.LOG_LINEAR))
    if args.v0_init_mutation_rate is not None:
        run.set_mu(args.v0_init_mutation_rate / 365.0)
    if args.v0_init_final_pop_size is not None:
        run.set_pop(n0=args.v0_init_final_pop_size * 365.0)
    if args.v0_init_pop_growth_rate is not None:
        run.set_pop(g=args.v0_init_pop_growth_rate / 365.0)

    if args.v0_out_beast_xml:
        from .io.beast_xml import export_beast2_xml, export_beast_x_xml
        with open(args.v0_out_beast_xml, "w") as f:
            if args.v0_out_beast_version == "X-10.5.0":
                export_beast_x_xml(f, run.tree(), run)
            else:
                export_beast2_xml(f, run.tree(), run)
        print(f"Wrote BEAST {args.v0_out_beast_version} XML to "
              f"{args.v0_out_beast_xml}", file=sys.stderr)
        return 0

    steps = args.v0_steps if args.v0_steps > 0 else 100_000 * len(tips)
    log_every = args.v0_log_every if args.v0_log_every > 0 else max(steps // 100, 1)
    tree_every = args.v0_tree_every if args.v0_tree_every > 0 else max(steps // 100, 1)
    snap_every = (args.v0_delphy_snapshot_every if args.v0_delphy_snapshot_every > 0
                  else max(steps // 10, 1))

    log_out = trees_out = dphy_out = None
    if args.v0_out_log_file:
        log_out = BeastLogOutput(open(args.v0_out_log_file, "w"),
                                 mu_move_enabled=not args.v0_fix_mutation_rate,
                                 alpha_move_enabled=args.v0_site_rate_heterogeneity)
        log_out.write_headers(tree)
    if args.v0_out_delphy_file and args.v0_out_delphy_file.endswith(".dphy"):
        # reference-compatible binary stream (tools/delphy.cpp:188-194);
        # any other extension keeps the engine's own npz save/resume format
        from .io.dphy import DphyOutput
        dphy_out = DphyOutput(open(args.v0_out_delphy_file, "wb"))
        dphy_out.output_preamble(run, steps_per_sample=snap_every)
    if args.v0_out_trees_file:
        trees_out = BeastTreesOutput(open(args.v0_out_trees_file, "w"))
        trees_out.write_preamble(tree)

    granularity = math.gcd(math.gcd(log_every, tree_every), snap_every)
    stamps = deque(maxlen=10)
    done = 0
    sampled_trees = []
    while done < steps:
        chunk = min(granularity, steps - done)
        run.do_mcmc_steps(chunk)
        done += chunk
        stamps.append((run.local_moves_attempted, time.time()))
        if len(stamps) >= 2:
            (s0, w0), (s1, w1) = stamps[0], stamps[-1]
            rate = (s1 - s0) / max(w1 - w0, 1e-9)
        else:
            rate = 0.0
        print(f"{run.stats_line()}  [{rate / 1e6:.3f} Mmoves/s]", file=sys.stderr)
        if log_out and done % log_every == 0:
            log_out.write_line(run)
        if done % tree_every == 0:
            t = run.tree()
            if trees_out:
                trees_out.write_tree(t, done)
            if args.v0_out_mcc_file and done > steps // 2:  # post-burn-in
                sampled_trees.append(t)
        if args.v0_out_delphy_file and done % snap_every == 0:
            if dphy_out is not None:
                dphy_out.output_state(run)
            else:
                from .io.snapshot import save_run
                save_run(run, args.v0_out_delphy_file)
        if args.v0_paranoid:
            run.check_derived_quantities(1e-4)
    if trees_out:
        trees_out.write_epilog()
    if dphy_out is not None:
        dphy_out.output_epilog()
        dphy_out.f.close()
    if args.v0_out_mcc_file and len(sampled_trees) >= 2:
        from .mcc import derive_mcc_tree, mcc_to_nexus
        mcc = derive_mcc_tree(sampled_trees, seed=args.v0_seed)
        with open(args.v0_out_mcc_file, "w") as f:
            mcc_to_nexus(mcc, f)
        print(f"Wrote MCC tree ({len(sampled_trees)} samples) to "
              f"{args.v0_out_mcc_file}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
