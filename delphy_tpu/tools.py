"""Standalone tool entry points beyond the main CLI.

mcc_from_trees mirrors tools/delphy_mcc.cpp: read a BEAST-style .trees file,
derive the MCC tree, write annotated NEXUS."""

from __future__ import annotations

import sys

import numpy as np

from .io.newick import read_beast_trees
from .mcc import derive_mcc_tree, mcc_to_nexus
from .phylo import FlatTree, NO_NODE


def _reindex_tips_by_name(trees: list) -> list:
    """Permute tip indices so every tree shares the first tree's name order
    (clade fingerprints must align across base trees)."""
    ref_names = trees[0].name
    order = {n: i for i, n in enumerate(ref_names)}
    out = []
    for tr in trees:
        T = tr.num_tips
        perm = np.empty(T, dtype=np.int64)  # old tip index -> new tip index
        for i in range(T):
            perm[i] = order[tr.name[i]]
        full = np.concatenate([perm, np.arange(T, tr.num_nodes)])
        # rebuild arrays with explicit relabeling
        N = tr.num_nodes
        parent = np.full(N, NO_NODE, dtype=np.int32)
        children = np.full((N, 2), NO_NODE, dtype=np.int32)
        t = np.zeros(N)
        names = [""] * T
        for old in range(N):
            new_i = int(full[old])
            t[new_i] = tr.t[old]
            if old < T:
                names[new_i] = tr.name[old]
            p = int(tr.parent[old])
            if p != NO_NODE:
                parent[new_i] = full[p]
            c0, c1 = tr.children[old]
            if c0 != NO_NODE:
                a, b = int(full[c0]), int(full[c1])
                children[new_i] = (min(a, b), max(a, b))
        out.append(FlatTree(
            parent=parent, children=children, t=t,
            t_min=np.where(np.arange(N) < T, t, -np.inf),
            t_max=np.where(np.arange(N) < T, t, np.inf),
            root=int(full[tr.root]), ref_seq=tr.ref_seq,
            mutations=[[] for _ in range(N)],
            miss_intervals=[[] for _ in range(N)],
            miss_from_states=[{} for _ in range(N)],
            name=names))
    return out


def mcc_from_trees(trees_path, out_path, ref_len: int = 1, burn_in: float = 0.3,
                   seed: int = 0, warn=lambda m: print(m, file=sys.stderr)):
    ref = np.zeros(ref_len, dtype=np.int8)
    labeled = read_beast_trees(trees_path, ref, warn=warn)
    if len(labeled) < 2:
        raise ValueError(f"need >= 2 trees, got {len(labeled)}")
    skip = int(len(labeled) * burn_in)
    trees = [t for (_, t) in labeled[skip:]]
    trees = _reindex_tips_by_name(trees)
    mcc = derive_mcc_tree(trees, seed=seed)
    with open(out_path, "w") as f:
        mcc_to_nexus(mcc, f)
    return mcc


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser(prog="delphy-tpu-mcc",
                                description="Derive an MCC tree from a .trees file")
    p.add_argument("trees")
    p.add_argument("out")
    p.add_argument("--burn-in", type=float, default=0.3)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    mcc = mcc_from_trees(args.trees, args.out, burn_in=args.burn_in,
                         seed=args.seed)
    print(f"MCC from master tree {mcc.master_index}; wrote {args.out}",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
