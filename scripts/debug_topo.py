import sys
sys.path.insert(0, 'tests')
import numpy as np
from test_topo import make_tree, make_ctx, oracle_log_G
from delphy_tpu.phylo import NO_NODE


def run_case(seed, missing_fraction, n_trials=200, allow_root_attach=True,
             allow_rooty=True):
    tree, evo, rng = make_tree(seed=seed, T=12, L=80,
                               missing_fraction=missing_fraction)
    ctx = make_ctx(tree, evo)
    N = tree.num_nodes
    worst = 0.0
    nc = 0
    nbad = 0
    for trial in range(n_trials):
        lg_before = oracle_log_G(tree, evo)
        X = int(rng.integers(0, N))
        if X == tree.root:
            continue
        P = int(tree.parent[X])
        if not allow_rooty and P == tree.root:
            continue
        in_subtree = set()
        stack = [X]
        while stack:
            n = stack.pop()
            in_subtree.add(n)
            for c in tree.children[n]:
                if c != NO_NODE:
                    stack.append(int(c))
        cands = [n for n in range(N) if n not in in_subtree and n != P]
        SS = int(rng.choice(cands))
        if not allow_root_attach and SS == tree.root:
            continue
        GG = int(tree.parent[SS]) if SS != tree.root else NO_NODE
        hi = min(float(tree.t[X]), float(tree.t[SS]))
        lo = float(tree.t[GG]) if GG != NO_NODE else hi - 30.0
        if lo >= hi:
            continue
        new_t_P = float(rng.uniform(lo, hi))
        was_rooty = (P == tree.root)
        attaches_root = (SS == tree.root)
        ctx.begin_move()
        old_g = ctx.analyze_graft(X)
        ctx.peel_graft(old_g)
        ctx.move(X, SS, new_t_P)
        new_g = ctx.propose_new_graft(X, rng)
        ctx.apply_graft(new_g)
        tree.check_integrity()
        lg_after = oracle_log_G(tree, evo)
        err = (lg_after - lg_before) - (new_g.delta_log_G - old_g.delta_log_G)
        nc += 1
        if abs(err) > 1e-7:
            nbad += 1
            nl_o = len(old_g.branch_infos)
            nl_n = len(new_g.branch_infos)
            open_o = (not old_g.rooty) and old_g.branch_infos[-1].is_open
            open_n = (not new_g.rooty) and new_g.branch_infos[-1].is_open
            print(f"mf={missing_fraction} trial={trial}: err={err:.5f} X={X} "
                  f"SS={SS} rooty_old={old_g.rooty} rooty_new={new_g.rooty} "
                  f"att_root={attaches_root} was_rooty={was_rooty} "
                  f"levels={nl_o}/{nl_n} open={open_o}/{open_n}")
            worst = max(worst, abs(err))
            if nbad > 8:
                break
    print(f"==> seed={seed} mf={missing_fraction}: {nc} cases, "
          f"{nbad} bad, worst {worst:.2e}")


if __name__ == "__main__":
    run_case(0, 0.0)
    run_case(0, 0.15)
    run_case(1, 0.15)
