import sys
sys.path.insert(0, 'tests')
import numpy as np
from test_topo import make_tree, make_ctx, oracle_log_G
from delphy_tpu.phylo import NO_NODE


def missing_sets(tree):
    return {n: frozenset(tree.missing_sites_at(n)) for n in range(tree.num_nodes)
            if tree.is_tip(n)}


def main():
    tree, evo, rng = make_tree(seed=0, T=12, L=80, missing_fraction=0.15)
    ctx = make_ctx(tree, evo)
    N = tree.num_nodes

    for trial in range(60):
        X = int(rng.integers(0, N))
        if X == tree.root:
            continue
        P = int(tree.parent[X])
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
        GG = int(tree.parent[SS]) if SS != tree.root else NO_NODE
        hi = min(float(tree.t[X]), float(tree.t[SS]))
        lo = float(tree.t[GG]) if GG != NO_NODE else hi - 30.0
        if lo >= hi:
            continue
        new_t_P = float(rng.uniform(lo, hi))

        tips_before = missing_sets(tree)
        was_rooty = P == tree.root
        att_root = SS == tree.root

        ctx.begin_move()
        old_g = ctx.analyze_graft(X)
        ctx.peel_graft(old_g)
        lg1 = oracle_log_G(tree, evo)
        g1 = ctx.analyze_graft(X)
        rest1 = lg1 - g1.delta_log_G
        try:
            ctx.move(X, SS, new_t_P)
        except AssertionError as e:
            print(f"trial {trial}: X={X} SS={SS} rooty={was_rooty} "
                  f"att_root={att_root}: move raised {e}")
            return
        tips_after = missing_sets(tree)
        for n in tips_before:
            if tips_before[n] != tips_after[n]:
                print(f"trial {trial}: X={X} SS={SS} rooty={was_rooty} "
                      f"att_root={att_root}: tip {n} missing set changed! "
                      f"only_before={sorted(tips_before[n]-tips_after[n])[:6]} "
                      f"only_after={sorted(tips_after[n]-tips_before[n])[:6]} "
                      f"in_subtree={n in in_subtree}")
        try:
            tree.check_integrity()
        except AssertionError as e:
            print(f"trial {trial}: integrity after move: {e}")
            return
        lg2 = oracle_log_G(tree, evo)
        g2 = ctx.analyze_graft(X)
        rest2 = lg2 - g2.delta_log_G
        if abs(rest2 - rest1) > 1e-7:
            print(f"trial {trial}: X={X} SS={SS} t={new_t_P:.1f} rooty={was_rooty} "
                  f"att_root={att_root} move_err={rest2 - rest1:.5f} "
                  f"levels_peeled={len(g1.branch_infos)} levels_after={len(g2.branch_infos)}")
        new_g = ctx.propose_new_graft(X, rng)
        ctx.apply_graft(new_g)


main()
