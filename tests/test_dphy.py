""".dphy v3 stream tests: write/read roundtrip, validation of the emitted
flatbuffers against the OFFICIAL flatbuffers runtime (not just our own
reader), and the exact-state replay check (load a sample, recompute log_G,
compare to the stored ledger — the harness SURVEY §7 calls for)."""

import struct

import numpy as np
import pytest

from delphy_tpu.sim import simulate_dataset
from delphy_tpu.phylo import build_random_tree
from delphy_tpu.run import Run
from delphy_tpu.io.dphy import (DphyOutput, read_dphy, build_tree_fb,
                                parse_tree_fb)


def make_run(seed=5, T=10, L=120, **kw):
    ref, deltas, miss, dates, names, _ = simulate_dataset(T, L, mu=3e-3,
                                                          seed=seed)
    tree = build_random_tree(ref, deltas, miss, dates, names=names,
                             rng=np.random.default_rng(seed))
    return Run(tree, seed=seed, num_cells=64,
               local_moves_per_global_move=200, **kw)


def write_dphy(path, run, n_samples=2, steps=200):
    with open(path, "wb") as f:
        out = DphyOutput(f)
        out.output_preamble(run, steps_per_sample=steps)
        for _ in range(n_samples):
            run.do_mcmc_steps(steps)
            out.output_state(run)
        out.output_epilog()


def test_dphy_roundtrip_exp(tmp_path):
    run = make_run()
    path = tmp_path / "run.dphy"
    write_dphy(path, run)
    df = read_dphy(path)
    assert df.preamble["steps_per_sample"] == 200
    assert len(df.samples) == 2
    cur = run.tree()
    t2, p2 = df.samples[-1]
    t2.check_integrity()
    assert t2.root == cur.root
    assert np.array_equal(t2.parent, cur.parent)
    assert np.array_equal(t2.children, cur.children)
    np.testing.assert_array_equal(np.asarray(t2.t, np.float32),
                                  np.asarray(cur.t, np.float32))
    assert t2.num_mutations() == cur.num_mutations()
    # TreeInfo carries 2N-1 node_infos (inner names empty); tips must match
    assert df.names[:len(cur.name)] == cur.name
    assert all(nm == "" for nm in df.names[len(cur.name):])
    # tip-date uncertainty preserved through TreeInfo
    for n in range(t2.num_tips):
        if cur.t_min[n] < cur.t_max[n]:
            assert np.float32(t2.t_min[n]) == np.float32(cur.t_min[n])
    # params
    assert p2["mu"] == pytest.approx(float(run.evo.mu))
    assert p2["hky_kappa"] == pytest.approx(float(run.evo.kappa))
    assert p2["pop_model"]["kind"] == "exp"
    assert p2["pop_model"]["n0"] == pytest.approx(float(run.pop.n0))
    assert p2["log_G"] == pytest.approx(float(run.ledger.log_G))
    assert p2["step"] == run.step


def test_dphy_roundtrip_skygrid(tmp_path):
    run = make_run(seed=9, pop_model="skygrid", skygrid_num_parameters=6)
    path = tmp_path / "run.dphy"
    write_dphy(path, run, n_samples=1)
    df = read_dphy(path)
    _t, p = df.samples[0]
    pm = p["pop_model"]
    assert pm["kind"] == "skygrid"
    np.testing.assert_allclose(pm["x"], np.asarray(run.pop.x))
    np.testing.assert_allclose(pm["gamma"], np.asarray(run.pop.gamma))
    assert p["skygrid_tau"] == pytest.approx(float(run.pop.tau))


def test_tree_fb_parses_with_official_runtime():
    """Walk the emitted api.Tree buffer with the official flatbuffers python
    runtime (flatbuffers.table.Table), independently of our reader, using the
    vtable offsets of the reference's generated code (api_generated.h:270-274:
    nodes=4, mutations=6, missation_intervals=8, ref_seq=10, root_node=12)."""
    import flatbuffers.table
    import flatbuffers.number_types as N

    ref, deltas, miss, dates, names, _ = simulate_dataset(8, 60, mu=3e-3,
                                                          seed=3)
    tree = build_random_tree(ref, deltas, miss, dates, names=names,
                             rng=np.random.default_rng(3))
    buf = build_tree_fb(tree)

    # size prefix == len(buf) - 4 (delphy_output.cpp:76-80 adds it back)
    assert struct.unpack_from("<I", buf, 0)[0] == len(buf) - 4

    root_off = struct.unpack_from("<I", buf, 4)[0]
    tab = flatbuffers.table.Table(bytearray(buf), 4 + root_off)

    o = tab.Offset(4)       # VT_NODES
    assert o != 0
    assert tab.VectorLen(o) == tree.num_nodes
    # first node struct: parent i32 at vector elem start
    vec = tab.Vector(o)
    parent0 = tab.Get(N.Int32Flags, vec)
    expect0 = -1 if tree.root == 0 else int(tree.parent[0])
    assert parent0 == expect0

    o = tab.Offset(12)      # VT_ROOT_NODE
    assert tab.Get(N.Int32Flags, tab.Pos + o) == tree.root

    o = tab.Offset(10)      # VT_REF_SEQ
    assert tab.VectorLen(o) == tree.num_sites
    np.testing.assert_array_equal(
        np.frombuffer(bytes(tab.Bytes), np.uint8, tree.num_sites,
                      offset=tab.Vector(o)),
        np.asarray(tree.ref_seq, np.uint8))

    o = tab.Offset(6)       # VT_MUTATIONS
    n_muts = tab.VectorLen(o)
    assert n_muts == sum(len(m) for m in tree.mutations)

    # our parser agrees with the official walker
    t2 = parse_tree_fb(buf, names=tree.name)
    assert t2.root == tree.root
    assert np.array_equal(t2.parent, tree.parent)


def test_dphy_replay_log_G(tmp_path):
    """Exact-state replay: load each sample from the stream, rebuild a Run
    from the stored tree+params, and check the recomputed log_G matches the
    stored ledger value (tolerance reflects the f32 times in the format)."""
    from delphy_tpu.evo import make_evo_params

    run = make_run(seed=11, T=12, L=150)
    path = tmp_path / "run.dphy"
    write_dphy(path, run, n_samples=2, steps=300)
    df = read_dphy(path)
    for tree, params in df.samples:
        run2 = Run(tree, seed=0, num_cells=64,
                   local_moves_per_global_move=100)
        run2.evo = make_evo_params(
            tree.num_sites, mu=params["mu"], kappa=params["hky_kappa"],
            pi=[params["hky_pi_A"], params["hky_pi_C"], params["hky_pi_G"],
                params["hky_pi_T"]],
            alpha=max(params["alpha"], 1e-6),
            nu=params["nu"] if len(params["nu"]) else None)
        led = run2.calc_cur_ledger()
        # t is stored f32: log_G error ~ |branch sums| * f32 eps
        assert abs(float(led.log_G) - params["log_G"]) < \
            1e-4 * abs(params["log_G"]), (float(led.log_G), params["log_G"])


def test_cli_writes_dphy(tmp_path):
    """End-to-end: the CLI emits a parseable .dphy when the output file has
    the .dphy extension (reference tools/delphy.cpp:188-194)."""
    import os
    import subprocess
    import sys
    from delphy_tpu.io.fasta import TipData
    from delphy_tpu.io.maple import write_maple
    from delphy_tpu.dates import to_iso_date

    ref, deltas, miss, dates, names, _ = simulate_dataset(8, 100, mu=2e-3,
                                                          seed=6)
    tips = [TipData(name=f"s{i}|{to_iso_date(dates[i][0])}",
                    t_min=dates[i][0], t_max=dates[i][1], deltas=deltas[i],
                    miss_intervals=miss[i]) for i in range(8)]
    mp = tmp_path / "in.maple"
    write_maple(mp, "ref", ref, tips)
    dphy = tmp_path / "out.dphy"
    env = dict(os.environ)
    env["DELPHY_TPU_FORCE_CPU"] = "1"
    r = subprocess.run(
        [sys.executable, "-m", "delphy_tpu.cli",
         "--v0-in-maple", str(mp), "--v0-steps", "2000",
         "--v0-out-delphy-file", str(dphy),
         "--v0-delphy-snapshot-every", "1000", "--v0-seed", "4"],
        capture_output=True, text=True, timeout=600, env=env,
        cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    df = read_dphy(dphy)
    assert len(df.samples) == 2
    tree, params = df.samples[-1]
    tree.check_integrity()
    assert params["step"] == 2000
