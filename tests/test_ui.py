"""Terminal dashboard (delphy_tpu/ui.py) — the delphy_ui live-view role
(/root/reference/tools/delphy_ui.cpp:1-1241) as a client of the engine
server: pure-renderer unit tests + an e2e watch of a real stepping run."""

import io

import numpy as np
import pytest

from delphy_tpu.server import serve_in_thread, Client
from delphy_tpu.ui import render, sparkline, watch


def test_sparkline_shapes():
    assert sparkline([]) == ""
    assert sparkline([1.0]) == ""
    s = sparkline([0, 1, 2, 3, 4, 5, 6, 7])
    assert len(s) == 8 and s[0] == "▁" and s[-1] == "█"
    assert sparkline([2.0, 2.0, 2.0]) == "▁▁▁"
    assert len(sparkline(list(range(500)), width=48)) == 48


def test_render_pure():
    import time
    state = {
        "step": 123456, "log_posterior": -1234.5678, "log_G": -1000.0,
        "log_coal": -200.0, "log_other_priors": -34.5678,
        "mu": 1e-3 / 365.0, "kappa": 2.5, "pi": [0.3, 0.2, 0.2, 0.3],
        "pop": {"model": "exp", "n0": 1000.0, "g": 0.0},
        "t_root": -700.25, "local_moves_attempted": 200000,
        "topology_accepted": 40, "topology_proposed": 100,
    }
    trace = [(1000 * i, -1234.0 - np.sin(i)) for i in range(20)]
    out = render(state, trace, t_start=time.time() - 10.0, moves0=0)
    assert "step 123,456" in out
    assert "-1234.5678" in out
    assert "kappa   2.500" in out
    assert "40/100 accepted (40.0%)" in out
    assert "ESS" in out and "log_post trace" in out
    # skygrid variant
    state["pop"] = {"model": "skygrid", "gamma": [6.0, 6.5, 7.0],
                    "tau": 2.0, "type": 0}
    out2 = render(state, [], t_start=time.time() - 1.0, moves0=0)
    assert "skygrid" in out2 and "M 2" in out2
    # warming-up state (no ledger yet)
    out3 = render({"step": 0, "log_posterior": None, "pop": {}}, [],
                  t_start=time.time(), moves0=0)
    assert "warming up" in out3


@pytest.fixture(scope="module")
def server():
    srv, engine, th = serve_in_thread()
    yield srv.server_address
    srv.shutdown()


def test_watch_live_run(server, tmp_path):
    """e2e: create a run through the server, start an async step job, and
    let the dashboard watch it for a few ticks (append-only mode)."""
    from delphy_tpu.sim import simulate_dataset
    from delphy_tpu.io.fasta import TipData
    from delphy_tpu.io.maple import write_maple
    from delphy_tpu.dates import to_iso_date

    ref, deltas, miss, dates, names, _ = simulate_dataset(
        16, 200, mu=2e-3, missing_fraction=0.02, seed=31)
    tips = [TipData(name=f"s{i}|{to_iso_date(dates[i][0])}",
                    t_min=dates[i][0], t_max=dates[i][1],
                    deltas=deltas[i], miss_intervals=miss[i])
            for i in range(16)]
    p = tmp_path / "ui.maple"
    write_maple(str(p), "ref", ref, tips)

    c = Client(*server)
    try:
        job = c.call("create_run", maple=str(p), seed=3,
                     num_cells=64, local_moves_per_global_move=150)
        rid = c.wait_job(job["job_id"], timeout=300)["run_id"]
        c.call("run_steps", run_id=rid, n=3000)
        buf = io.StringIO()
        state = watch(c, rid, interval=0.3, ansi=False, out=buf,
                      max_ticks=4, newick_every=2)
        text = buf.getvalue()
        assert "delphy_tpu live" in text
        assert "[newick]" in text
        assert state is not None and state["step"] >= 0
    finally:
        c.close()
