"""Topology moves (SPR family) — host-side implementation.

This subpackage implements the reference's subtree-prune-regraft machinery
(core/spr_move.{h,cpp}, core/tree_editing.{h,cpp}, core/subrun.cpp topology
moves) against the host FlatTree.  The device kernels handle the
time/parameter moves; topology resampling runs in host bursts between jitted
sweeps (same stationary distribution — the move kernels compose in any fixed
order).  A jit-native SPR is the planned follow-up once semantics are locked
in by these tests.
"""

from .mixer import TopologyMixer  # noqa: F401
