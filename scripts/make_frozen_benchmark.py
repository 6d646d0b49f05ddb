"""Generate the FROZEN benchmark dataset checked in at data/ (run once).

The container has no network egress, so the reference's benchmark inputs
(Gire 2014 Ebola, 81 genomes x 18,959 sites, fetched from NCBI by the delphy
tutorial) cannot be downloaded.  This script freezes a realistic stand-in
generated ONCE with Gire-2014-like summary statistics, so bench.py and tests
parse a fixed on-disk MAPLE file through the production input path instead
of re-simulating a synthetic dataset per run:

- 81 tips x 18,959 sites, HKY, mu ~ 1.2e-3 subs/site/year (delphywp.pdf §5);
- sampling spread over ~3 months of 2014 with real ISO dates in the names;
- STRUCTURED missingness matching published Ebola assembly coverage: most
  genomes complete, a subset with leading/trailing assembly-gap runs and
  occasional internal amplicon dropouts, per-tip totals 0-2.7% of the genome
  (Gire 2014 reports 0-2.7%; mean here ~0.8%).

Regenerating requires intentionally bumping SEED/OUT — the point is that the
bytes never change between rounds.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("DELPHY_TPU_FORCE_CPU", "1")

import numpy as np

SEED = 20260819
T, L = 81, 18959
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "data", "ebola2014_like_81x18959.maple")


def structured_missingness(rng, num_sites):
    """One tip's missing intervals: ends-biased assembly gaps + rare internal
    amplicon dropouts, totalling 0-2.7% of the genome."""
    intervals = []
    u = rng.random()
    if u < 0.45:
        return intervals  # complete genome
    # leading/trailing gaps (assembly ends have lowest coverage)
    if rng.random() < 0.75:
        span = int(rng.gamma(2.0, 60.0)) + 1          # ~120 bp typical
        intervals.append((0, min(span, num_sites)))
    if rng.random() < 0.75:
        span = int(rng.gamma(2.0, 60.0)) + 1
        intervals.append((max(0, num_sites - span), num_sites))
    # internal amplicon dropouts
    n_drop = rng.poisson(0.6)
    for _ in range(n_drop):
        span = int(rng.gamma(2.0, 110.0)) + 20        # ~240 bp typical
        s = int(rng.integers(200, num_sites - span - 200))
        intervals.append((s, s + span))
    # cap at 2.7% total (Gire 2014 max)
    intervals.sort()
    merged = []
    for s, e in intervals:
        if merged and s <= merged[-1][1]:
            merged[-1] = (merged[-1][0], max(e, merged[-1][1]))
        else:
            merged.append((s, e))
    total, cap = 0, int(0.027 * num_sites)
    out = []
    for s, e in merged:
        if total + (e - s) > cap:
            e = s + max(0, cap - total)
        if e > s:
            out.append((s, e))
            total += e - s
    return out


def main():
    from delphy_tpu.sim import simulate_dataset
    from delphy_tpu.io.fasta import TipData
    from delphy_tpu.io.maple import write_maple
    from delphy_tpu.dates import to_iso_date

    rng = np.random.default_rng(SEED)
    mu_per_day = 1.2e-3 / 365.0
    ref, deltas, _miss, dates, _names, truth = simulate_dataset(
        T, L, mu=mu_per_day, kappa=6.0, pi=(0.32, 0.21, 0.19, 0.28),
        sample_window_days=90.0, coalescent_n0=120.0,
        missing_fraction=0.0, seed=SEED)

    tips = []
    base_day = 0.0  # to_iso_date anchors the engine's day axis
    for i in range(T):
        miss = structured_missingness(rng, L)
        missing = set()
        for (s, e) in miss:
            missing.update(range(s, e))
        d = [(l, to) for (l, to) in deltas[i] if l not in missing]
        day = dates[i][0] + base_day
        name = f"EBOV|G{5000 + i}|SLE|{to_iso_date(day)}"
        tips.append(TipData(name=name, t_min=day, t_max=day, deltas=d,
                            miss_intervals=miss))

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    write_maple(OUT, "EBOV_ref", ref, tips)
    n_miss = sum(sum(e - s for s, e in t.miss_intervals) for t in tips)
    n_del = sum(len(t.deltas) for t in tips)
    print(f"wrote {OUT}: {T} tips x {L} sites, {n_del} deltas, "
          f"{n_miss} missing sites ({100.0 * n_miss / (T * L):.2f}%), "
          f"true root day {truth['root_time']:.1f}")


if __name__ == "__main__":
    main()
