#!/usr/bin/env python
"""Bisect the residual f32-vs-f64 t_root bias by move-type knockout.

Runs scripts/f32_study.py across seeds x configurations (move kernels
disabled via the sweep debug env knobs) with a small process pool, then
reports, per configuration, the per-seed (t_root_f32 - t_root_f64) gaps and
a sign test.  The config whose knockout destroys the sign-consistency
contains the biased kernel.

Usage: python scripts/f32_bisect.py [--steps 250000] [--seeds 8] [--jobs 4]
"""

from __future__ import annotations

import argparse
import concurrent.futures as cf
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

CONFIGS = {
    "base": {},
    "no-batched": {"DELPHY_TPU_DISPLACE_ROUNDS": "0"},
    "no-single": {"DELPHY_TPU_NO_SINGLE": "1"},
    "no-reform": {"DELPHY_TPU_NO_REFORM": "1"},
    "no-topo": {"F32_STUDY_NO_TOPO": "1"},
}


def run_one(cfg_name, env_extra, seed, steps):
    env = dict(os.environ, **env_extra)
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "f32_study.py"),
         "--steps", str(steps), "--seed", str(seed)],
        env=env, capture_output=True, text=True, timeout=7200)
    if not out.stdout.strip():
        return cfg_name, seed, None, out.stderr[-500:]
    rep = json.loads(out.stdout)
    s = rep["summaries"]
    gap = {k: s[k]["f32_mean"] - s[k]["f64_mean"] for k in s}
    return cfg_name, seed, gap, None


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=250_000)
    p.add_argument("--seeds", type=int, default=8)
    p.add_argument("--jobs", type=int, default=4)
    p.add_argument("--configs", type=str, default=",".join(CONFIGS))
    args = p.parse_args()

    jobs = []
    with cf.ThreadPoolExecutor(args.jobs) as ex:
        for name in args.configs.split(","):
            for seed in range(30, 30 + args.seeds):
                jobs.append(ex.submit(run_one, name, CONFIGS[name], seed,
                                      args.steps))
        results = {}
        for fut in cf.as_completed(jobs):
            cfg, seed, gap, err = fut.result()
            if gap is None:
                print(f"[{cfg} seed={seed}] FAILED: {err}", file=sys.stderr,
                      flush=True)
                continue
            results.setdefault(cfg, []).append((seed, gap))
            print(f"[{cfg} seed={seed}] t_root gap {gap['t_root']:+8.2f}  "
                  f"muts {gap['muts']:+7.1f}  mu {gap['mu']:+.5f}",
                  flush=True)

    print()
    summary = {}
    for cfg, rows in sorted(results.items()):
        gaps = [g["t_root"] for _, g in rows]
        neg = sum(1 for g in gaps if g < 0)
        mean = sum(gaps) / len(gaps)
        summary[cfg] = {"n": len(gaps), "neg": neg, "mean_t_root_gap": mean,
                        "gaps": gaps}
        print(f"{cfg:12s} n={len(gaps)} t_root gap mean {mean:+7.2f} "
              f"negative {neg}/{len(gaps)}")
    with open("/tmp/f32_bisect.json", "w") as fh:
        json.dump(summary, fh, indent=1)


if __name__ == "__main__":
    main()
