import sys
sys.path.insert(0, 'tests')
import numpy as np
from test_topo import make_tree, make_ctx, oracle_log_G
from delphy_tpu.phylo import NO_NODE


def main():
    tree, evo, rng = make_tree(seed=0, T=12, L=80, missing_fraction=0.15)
    ctx = make_ctx(tree, evo)
    N = tree.num_nodes

    for trial in range(40):
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

        ctx.begin_move()
        lg0 = oracle_log_G(tree, evo)
        old_g = ctx.analyze_graft(X)
        rest0 = lg0 - old_g.delta_log_G

        ctx.peel_graft(old_g)
        lg1 = oracle_log_G(tree, evo)
        g1 = ctx.analyze_graft(X)
        rest1 = lg1 - g1.delta_log_G

        ctx.move(X, SS, new_t_P)
        lg2 = oracle_log_G(tree, evo)
        g2 = ctx.analyze_graft(X)
        rest2 = lg2 - g2.delta_log_G

        new_g = ctx.propose_new_graft(X, rng)
        ctx.apply_graft(new_g)
        lg3 = oracle_log_G(tree, evo)
        rest3 = lg3 - new_g.delta_log_G

        e1, e2, e3 = rest1 - rest0, rest2 - rest1, rest3 - rest2
        if max(abs(e1), abs(e2), abs(e3)) > 1e-7:
            print(f"trial {trial}: X={X} SS={SS} t={new_t_P:.2f} "
                  f"levels {len(old_g.branch_infos)}->{len(new_g.branch_infos)} "
                  f"peel_err={e1:.5f} move_err={e2:.5f} apply_err={e3:.5f}")
        # keep state for next trial (tree mutated in place)


main()
