"""The JSON-RPC engine server (delphy_tpu/server.py) — the functional
equivalent of the reference's delphy-web WASM surface
(/root/reference/tools/delphy_wasm.cpp:69-1934; contract: doc/API.md):
async input parse + run construction, async stepping, parameter get/set,
tree/params flatbuffers pulls, probers, MCC export, snapshot save/load and
.dphy export — all over a long-running socket server."""

import os

import numpy as np
import pytest

from delphy_tpu.server import serve_in_thread, Client


@pytest.fixture(scope="module")
def server():
    srv, engine, th = serve_in_thread()
    host, port = srv.server_address
    yield host, port
    srv.shutdown()


@pytest.fixture(scope="module")
def maple_path(tmp_path_factory):
    from delphy_tpu.sim import simulate_dataset
    from delphy_tpu.io.fasta import TipData
    from delphy_tpu.io.maple import write_maple
    from delphy_tpu.dates import to_iso_date

    ref, deltas, miss, dates, names, _ = simulate_dataset(
        24, 300, mu=2e-3, missing_fraction=0.02, seed=13)
    tips = [TipData(name=f"s{i}|{to_iso_date(dates[i][0])}",
                    t_min=dates[i][0], t_max=dates[i][1],
                    deltas=deltas[i], miss_intervals=miss[i])
            for i in range(24)]
    p = tmp_path_factory.mktemp("srv") / "in.maple"
    write_maple(str(p), "ref", ref, tips)
    return str(p)


def test_server_full_surface(server, maple_path, tmp_path):
    host, port = server
    c = Client(host, port)
    try:
        # group 1+2: async create (parse + init tree + Run construction)
        job = c.call("create_run", maple=maple_path, seed=5, num_cells=64,
                     local_moves_per_global_move=200)
        res = c.wait_job(job["job_id"])
        rid = res["run_id"]
        assert res["num_tips"] == 24 and res["num_sites"] == 300

        # async stepping + poll (delphy_run_steps_async)
        job = c.call("run_steps", run_id=rid, n=2000)
        res = c.wait_job(job["job_id"])
        assert res["step"] >= 2000
        lp1 = res["log_posterior"]
        assert np.isfinite(lp1)

        # getters interleave with a running step job
        job = c.call("run_steps", run_id=rid, n=2000)
        st = c.call("get_state", run_id=rid)
        assert st["num_nodes"] == 47
        assert "mu" in st and st["kappa"] > 0
        c.wait_job(job["job_id"])

        # setters (delphy_run_set_*)
        c.call("set_params", run_id=rid, mu=2.5e-3 / 365.0)
        st = c.call("get_state", run_id=rid)
        assert abs(st["mu"] - 2.5e-3 / 365.0) < 1e-12

        # group 3: state out — newick, flatbuffers, probers, MCC
        nwk = c.call("get_tree_newick", run_id=rid)["newick"]
        assert nwk.count("(") == 23 and nwk.endswith(";")

        import base64
        fb = c.call("get_tree_fb", run_id=rid)
        from delphy_tpu.io.dphy import parse_tree_fb
        t2 = parse_tree_fb(base64.b64decode(fb["tree_fb"]))
        assert t2.num_tips == 24
        pfb = c.call("get_params_fb", run_id=rid)
        from delphy_tpu.io.dphy import parse_params_fb
        pd = parse_params_fb(base64.b64decode(pfb["params_fb"]))
        assert abs(pd["mu"] - st["mu"]) < 1e-12

        t_lo, t_hi = st["t_root"], st["t_root"] + 300.0
        pa = c.call("probe_ancestors", run_id=rid, marked_ancestors=[24],
                    t_start=t_lo, t_end=t_hi, num_t_cells=16)["p"]
        pa = np.asarray(pa)
        assert pa.shape == (2, 16)
        assert np.all(pa >= -1e-9) and np.all(pa <= 1 + 1e-9)
        ps = np.asarray(c.call("probe_site_states", run_id=rid, site=3,
                               t_start=t_lo, t_end=t_hi,
                               num_t_cells=8)["p"])
        assert ps.shape == (4, 8)

        mcc = c.call("get_mcc_nexus", run_id=rid)
        assert "begin trees;" in mcc["nexus"].lower()
        assert mcc["num_base_trees"] >= 1

        # group 4: save/load — snapshot resume continues exactly
        snap = str(tmp_path / "run.npz")
        c.call("save_snapshot", run_id=rid, path=snap)
        rid2 = c.call("load_snapshot", path=snap)["run_id"]
        j1 = c.call("run_steps", run_id=rid, n=1000)
        j2 = c.call("run_steps", run_id=rid2, n=1000)
        r1, r2 = c.wait_job(j1["job_id"]), c.wait_job(j2["job_id"])
        assert r1["log_posterior"] == r2["log_posterior"]

        dphy = str(tmp_path / "run.dphy")
        out = c.call("export_dphy", run_id=rid, path=dphy)
        assert out["bytes"] > 100
        from delphy_tpu.io.dphy import read_dphy
        df = read_dphy(dphy)
        assert len(df.samples) >= 1

        runs = c.call("list_runs")["runs"]
        assert {r["run_id"] for r in runs} >= {rid, rid2}
        c.call("close_run", run_id=rid2)

        # errors surface as RPC errors, not dead connections
        with pytest.raises(RuntimeError):
            c.call("get_state", run_id=99999)
        assert c.call("list_runs") is not None
    finally:
        c.close()
