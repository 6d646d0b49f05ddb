"""SPR study: enumeration and weighting of candidate regraft regions.

Host port of core/spr_study.{h,cpp}: a restricted DFS outward from the detach
point, one candidate region per inter-mutation segment of each branch,
tracking site deltas to X and minimum mutation counts; regions weighted by a
JC-like insertion likelihood softened by an annealing factor (SURVEY.md §A.5).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np
from scipy.special import gammaincc, gammainccinv, gammaln

from ..phylo import FlatTree, NO_NODE
from . import site_deltas as sd

NEG_BIG = -1.7976931348623157e308  # reference uses -DBL_MAX for "above root"


@dataclass
class CandidateRegion:
    branch: int
    mut_idx: int
    t_min: float
    t_max: float
    min_muts: int
    log_W_over_Wmax: float = 0.0
    W_over_Wmax: float = 0.0

    def is_above_root(self) -> bool:
        return self.t_min == NEG_BIG


class SprStudyBuilder:
    """Work-stack DFS over inter-mutation regions (spr_study.h:71-205)."""

    def __init__(self, tree: FlatTree, X: int, t_X: float, missing_at_X: set,
                 max_muts_from_start: int = 2 ** 31):
        self.tree = tree
        self.X = X
        self.t_X = t_X
        self.missing_at_X = missing_at_X
        self.max_muts_from_start = max_muts_from_start
        self.cur_branch = NO_NODE
        self.cur_mut_idx = -1
        self.cur_muts_from_start = 0
        self.cur_to_X_deltas: dict = {}
        self.work_stack: list = []
        self.result: list = []

    def region_t_min(self, branch, mut_idx):
        t = self.tree
        if branch == t.root:
            return NEG_BIG
        muts = t.mutations[branch]
        if mut_idx == 0:
            return float(t.t[int(t.parent[branch])])
        return muts[mut_idx - 1].t

    def region_t_max(self, branch, mut_idx):
        t = self.tree
        if branch == t.root:
            return float(t.t[branch])
        muts = t.mutations[branch]
        if mut_idx == len(muts):
            return float(t.t[branch])
        return muts[mut_idx].t

    def add_forward_movement(self, target_branch, target_mut_idx):
        self.work_stack.append((self.cur_branch, self.cur_mut_idx, True))
        self.work_stack.append((target_branch, target_mut_idx, False))

    def move_to_neighbor(self, target_branch, target_mut_idx, is_backtracking):
        t = self.tree
        if self.cur_branch != NO_NODE and target_branch == self.cur_branch:
            muts = t.mutations[self.cur_branch]
            if target_mut_idx == self.cur_mut_idx + 1:   # moving down past cur
                m = muts[self.cur_mut_idx]
                if m.site not in self.missing_at_X:
                    self._pop_front(m)
                    self.cur_muts_from_start += (1 if not is_backtracking else -1)
            elif target_mut_idx == self.cur_mut_idx - 1:  # moving up past target
                m = muts[target_mut_idx]
                if m.site not in self.missing_at_X:
                    sd.push_front(self.cur_to_X_deltas, m.site, m.from_, m.to)
                    self.cur_muts_from_start += (1 if not is_backtracking else -1)
            else:
                raise AssertionError("inconsistent work item")
        self.cur_branch = target_branch
        self.cur_mut_idx = target_mut_idx

    def _pop_front(self, m):
        """pop_front_site_deltas: path previously started just above m; now it
        starts just below m (site_deltas.h:100-128)."""
        d = self.cur_to_X_deltas
        if m.site in d:
            f0, t0 = d[m.site]
            assert f0 == m.from_
            if m.to == t0:
                del d[m.site]
            else:
                d[m.site] = (m.to, t0)
        else:
            d[m.site] = (m.to, m.from_)

    def visit_cur_region(self):
        # plain tuples during the DFS; CandidateRegion objects materialize
        # once in seed_fill_from (object churn dominates the hot loop)
        b, mi = self.cur_branch, self.cur_mut_idx
        t = self.tree
        muts = t.mutations[b]
        if b == t.root:
            t_min = NEG_BIG
        elif mi == 0:
            t_min = float(t.t[t.parent[b]])
        else:
            t_min = muts[mi - 1].t
        if b == t.root:
            t_max = float(t.t[b])
        elif mi == len(muts):
            t_max = float(t.t[b])
        else:
            t_max = muts[mi].t
        self.result.append((b, mi, t_min, t_max, len(self.cur_to_X_deltas)))

    def seed_neighbors_except(self, old_branch, old_mut_idx):
        t = self.tree
        cb, ci = self.cur_branch, self.cur_mut_idx
        stack = self.work_stack

        if cb != t.root:
            if ci > 0:
                if not (cb == old_branch and ci - 1 == old_mut_idx):
                    stack.append((cb, ci, True))
                    stack.append((cb, ci - 1, False))
            else:
                pb = int(t.parent[cb])
                ni = len(t.mutations[pb])
                if not (pb == old_branch and ni == old_mut_idx):
                    stack.append((cb, ci, True))
                    stack.append((pb, ni, False))
        if ci < len(t.mutations[cb]):
            if not (cb == old_branch and ci + 1 == old_mut_idx):
                stack.append((cb, ci, True))
                stack.append((cb, ci + 1, False))
        else:
            for child in t.children[cb]:
                if child != NO_NODE:
                    child = int(child)
                    if not (child == old_branch and 0 == old_mut_idx):
                        stack.append((cb, ci, True))
                        stack.append((child, 0, False))

    def do_pending_work(self):
        while self.work_stack:
            tb, ti, back = self.work_stack.pop()
            old_branch, old_idx = self.cur_branch, self.cur_mut_idx
            self.move_to_neighbor(tb, ti, back)
            if not back and self._cur_region_in_scope():
                self.visit_cur_region()
                self.seed_neighbors_except(old_branch, old_idx)

    def _cur_region_in_scope(self):
        return (self.cur_branch != self.X
                and self.cur_muts_from_start <= self.max_muts_from_start)

    def seed_fill_from(self, init_branch, init_mut_idx, init_to_X_deltas,
                       can_change_root):
        self.cur_to_X_deltas = dict(init_to_X_deltas)
        self.add_forward_movement(init_branch, init_mut_idx)
        self.do_pending_work()
        self.result = [CandidateRegion(branch=b, mut_idx=mi, t_min=tmin,
                                       t_max=tmax, min_muts=mm)
                       for (b, mi, tmin, tmax, mm) in self.result]
        self._account_for_Xs_detachment(can_change_root)
        self._remove_regions_in_Xs_future()

    def _account_for_Xs_detachment(self, can_change_root):
        """spr_study.cpp:130-208."""
        t = self.tree
        X = self.X
        if X == NO_NODE:
            if not can_change_root:
                self.result = [r for r in self.result if r.branch != t.root]
            return
        P = int(t.parent[X])
        a, b = t.children[P]
        S = int(b) if int(a) == X else int(a)
        num_muts_G_to_P = len(t.mutations[P])

        for region in self.result:
            if not can_change_root and region.branch == t.root:
                region.branch = -1
                continue
            if region.branch != S and region.branch != P:
                continue
            if P != t.root:
                if region.branch == S:
                    if region.mut_idx == 0:
                        region.t_min = self.region_t_min(P, num_muts_G_to_P)
                    region.mut_idx += num_muts_G_to_P
                else:  # region.branch == P
                    if region.mut_idx == num_muts_G_to_P:
                        region.branch = -1
                    else:
                        region.branch = S
            else:
                if not can_change_root:
                    if region.branch == P:
                        region.branch = -1
                else:
                    if (region.branch == S
                            and region.mut_idx == len(t.mutations[S])):
                        region.mut_idx += num_muts_G_to_P
                        region.t_min = NEG_BIG
                    else:
                        region.branch = -1
        self.result = [r for r in self.result if r.branch != -1]

    def _remove_regions_in_Xs_future(self):
        out = []
        for r in self.result:
            if r.t_min >= self.t_X:
                continue
            if r.t_max > self.t_X:
                r.t_max = self.t_X
            out.append(r)
        self.result = out


class SprStudy:
    """Weights + sampling over candidate regions (spr_study.cpp:226-547)."""

    def __init__(self, builder: SprStudyBuilder, lambda_X: float,
                 annealing_factor: float, t_X: float, t_max_tip: float):
        self.tree = builder.tree
        self.lambda_X = lambda_X
        self.f = annealing_factor
        self.t_X = t_X
        self.t_max_tip = t_max_tip
        self.regions = builder.result
        self.mu = lambda_X / (self.tree.num_sites - len(builder.missing_at_X))
        assert self.regions, "SPR study found no candidate regions"

        f, mu, lamX = self.f, self.mu, self.lambda_X
        for r in self.regions:
            m = r.min_muts
            if not r.is_above_root():
                t_prime = 0.5 * (r.t_min + r.t_max)
                arg1 = f * lamX * (r.t_max - r.t_min)
                arg2 = mu * (t_X - t_prime) / 3.0
                if arg1 <= 0.0 or (m > 0 and arg2 <= 0.0):
                    r.log_W_over_Wmax = -math.inf
                else:
                    r.log_W_over_Wmax = (math.log(arg1)
                                         + f * (-lamX * (t_X - t_prime)
                                                + m * math.log(arg2)))
            else:
                t_S = float(self.tree.t[r.branch])
                s_min = abs(t_X - t_S)
                t_early = min(t_X, t_S)
                s_max = s_min + 20.0 * max(self.t_max_tip - t_early, 0.0)
                x_min = lamX * f * s_min
                x_max = lamX * f * s_max
                if x_max < 0.01:
                    alpha = f * m + 1
                    r.log_W_over_Wmax = (
                        -math.log(2.0) + math.log(f * lamX)
                        + f * m * math.log(mu / 3.0)
                        + alpha * math.log(s_max)
                        + math.log1p(-((s_min / s_max) ** alpha))
                        - math.log(alpha))
                else:
                    r.log_W_over_Wmax = (
                        -math.log(2.0)
                        + f * m * math.log(mu / (3.0 * lamX * f))
                        + float(gammaln(f * m + 1))
                        + _safe_log_gamma_integral(f * m + 1, x_min, x_max))

        self.log_Wmax = max(r.log_W_over_Wmax for r in self.regions)
        if not math.isfinite(self.log_Wmax):
            self.log_Wmax = 0.0
        self.sum_W = 0.0
        for r in self.regions:
            r.log_W_over_Wmax -= self.log_Wmax
            r.W_over_Wmax = math.exp(r.log_W_over_Wmax)
            self.sum_W += r.W_over_Wmax

    def pick_nexus_region(self, rng: np.random.Generator) -> int:
        u = rng.uniform(0.0, self.sum_W)
        for i, r in enumerate(self.regions):
            if r.W_over_Wmax >= u:
                return i
            u -= r.W_over_Wmax
        return 0

    def _root_s_bounds(self, region):
        t_S = float(self.tree.t[region.branch])
        s_min = abs(self.t_X - t_S)
        s_max = s_min + 20.0 * max(self.t_max_tip - min(self.t_X, t_S), 0.0)
        return t_S, s_min, s_max

    def pick_time_in_region(self, idx: int, rng: np.random.Generator) -> float:
        r = self.regions[idx]
        if not r.is_above_root():
            u = rng.uniform(0.0, 1.0)
            return r.t_max - u * (r.t_max - r.t_min)  # in (t_min, t_max]
        f, m, lamX = self.f, r.min_muts, self.lambda_X
        t_S, s_min, s_max = self._root_s_bounds(r)
        x_max = lamX * f * s_max
        if x_max < 0.01:
            alpha = f * m + 1
            U = rng.uniform(1e-16, 1.0)
            s = (s_min ** alpha + U * (s_max ** alpha - s_min ** alpha)) ** (1.0 / alpha)
        else:
            alpha = f * m + 1
            Q_hi = float(gammaincc(alpha, lamX * f * s_min))
            Q_lo = float(gammaincc(alpha, lamX * f * s_max))
            Q = Q_lo + rng.uniform(1e-16, 1.0) * (Q_hi - Q_lo)
            y = float(gammainccinv(alpha, Q))
            s = min(max(y / (lamX * f), s_min), s_max)
        t = 0.5 * (self.t_X + t_S - s)
        return min(max(t, r.t_min), r.t_max)

    def find_region(self, branch: int, t: float) -> int:
        for i, r in enumerate(self.regions):
            if r.branch == branch and r.t_min < t <= r.t_max:
                return i
        return -1

    def log_alpha_in_region(self, idx: int, t: float) -> float:
        r = self.regions[idx]
        log_p_region = r.log_W_over_Wmax - math.log(self.sum_W)
        if not r.is_above_root():
            return log_p_region - math.log(r.t_max - r.t_min)
        f, m, lamX = self.f, r.min_muts, self.lambda_X
        t_S, s_min, s_max = self._root_s_bounds(r)
        x_min, x_max = lamX * f * s_min, lamX * f * s_max
        s = (self.t_X - t) + (t_S - t)
        if s > s_max + 1e-6:
            return -math.inf
        if x_max < 0.01:
            alpha = f * m + 1
            return (log_p_region + math.log(2.0) + math.log(alpha)
                    + (alpha - 1) * math.log(s) - alpha * math.log(s_max)
                    - math.log1p(-((s_min / s_max) ** alpha)))
        return (log_p_region + math.log(2.0) + math.log(lamX * f)
                + f * m * math.log(lamX * f * s) - lamX * f * s
                - float(gammaln(f * m + 1))
                - _safe_log_gamma_integral(f * m + 1, x_min, x_max))


def _safe_log_gamma_integral(a: float, x_min: float, x_max: float) -> float:
    """log(Q(a, x_min) - Q(a, x_max)) (safe_gamma_math.h:82-90)."""
    Q_hi = float(gammaincc(a, x_min))
    Q_lo = float(gammaincc(a, x_max))
    diff = max(Q_hi - Q_lo, 0.0)
    return math.log(diff) if diff > 0 else -math.inf
