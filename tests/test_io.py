"""IO round-trip tests: MAPLE, FASTA, date parsing, BEAST outputs, CLI."""

import io
import subprocess
import sys
import os

import numpy as np

from delphy_tpu import seq as seqm
from delphy_tpu.dates import (parse_iso_date, parse_iso_month, parse_iso_year,
                              extract_date_range_from_id, to_linear_year)
from delphy_tpu.io.fasta import read_fasta, deduce_consensus, fasta_to_tips
from delphy_tpu.io.maple import read_maple, write_maple
from delphy_tpu.io.beast_out import newick_string
from delphy_tpu.sim import simulate_dataset
from delphy_tpu.phylo import build_random_tree


def test_dates():
    assert parse_iso_date("2020-01-01") == 0.0
    assert parse_iso_date("2020-01-03") == 2.0
    assert parse_iso_date("2019-12-31") == -1.0
    assert parse_iso_month("2020-02") == (31.0, 60.0)
    lo, hi = parse_iso_year("2021")
    assert lo == 366.0 and hi == 731.0
    assert abs(to_linear_year(parse_iso_date("2024-02-01")) - (2024 + 31 / 366)) < 1e-9


def test_extract_date_range():
    assert extract_date_range_from_id("seq|EPI_ISL_123|2022-10-01") == (
        parse_iso_date("2022-10-01"),) * 2
    assert extract_date_range_from_id("a-b-2016-01-19") == (parse_iso_date("2016-01-19"),) * 2
    r = extract_date_range_from_id("x|2021-03")
    assert r == parse_iso_month("2021-03")
    r = extract_date_range_from_id("x|2021")
    assert r == parse_iso_year("2021")
    r = extract_date_range_from_id("x|2024-11-05/2024-12-26")
    assert r == (parse_iso_date("2024-11-05"), parse_iso_date("2024-12-26"))
    assert extract_date_range_from_id("no_date_here") is None


def test_maple_roundtrip(tmp_path):
    p = tmp_path / "test.maple"
    p.write_text(
        ">ref\n"
        "ACGTACGTAC\n"
        ">tip1|2021-05-01\n"
        "t\t3\n"
        "n\t5\t2\n"
        ">tip2|2021-06\n"
        "a\t2\n"
        ">nodate_tip\n"
        "c\t1\n"
        ">tip3|2021-07-01\n")
    warns = []
    mf = read_maple(p, warn=warns.append)
    assert seqm.real_to_str(mf.ref_seq) == "ACGTACGTAC"
    assert len(mf.tips) == 3  # nodate_tip dropped
    assert any("nodate_tip" in w for w in warns)
    t1 = mf.tips[0]
    assert t1.deltas == [(2, 3)]
    assert t1.miss_intervals == [(4, 6)]
    t2 = mf.tips[1]
    assert t2.deltas == [(1, 0)]
    assert t2.t_min < t2.t_max  # whole-month uncertainty
    assert mf.tips[2].deltas == []

    # round-trip
    p2 = tmp_path / "out.maple"
    write_maple(p2, "ref", mf.ref_seq, mf.tips)
    mf2 = read_maple(p2)
    assert [t.deltas for t in mf2.tips] == [t.deltas for t in mf.tips]
    assert [t.miss_intervals for t in mf2.tips] == [t.miss_intervals for t in mf.tips]


def test_maple_ambiguous_ref_blacklist(tmp_path):
    p = tmp_path / "amb.maple"
    p.write_text(
        ">ref\nACNTA\n"
        ">tip1|2021-05-01\n"
        "g\t3\n"     # delta at blacklisted site 3 (1-based) -> tip dropped
        ">tip2|2021-05-02\n"
        "g\t4\n")
    warns = []
    mf = read_maple(p, warn=warns.append)
    assert seqm.real_to_str(mf.ref_seq) == "ACATA"  # N -> A
    assert len(mf.tips) == 1
    assert mf.tips[0].name.startswith("tip2")


def test_fasta_pipeline(tmp_path):
    p = tmp_path / "test.fasta"
    p.write_text(
        ">a|2021-01-01\nACGTACGTNN\n"
        ">b|2021-01-02\nACCTACGTAC\n"
        ">c|2021-01-03\nACGTACGTAC\n")
    records = read_fasta(p)
    assert len(records) == 3
    ref = deduce_consensus(records, 10)
    assert seqm.real_to_str(ref) == "ACGTACGTAC"
    tips = fasta_to_tips(records, ref)
    assert len(tips) == 3
    assert tips[0].miss_intervals == [(8, 10)]
    assert tips[1].deltas == [(2, 1)]


def test_newick_roundtrip_structure():
    ref, deltas, miss, dates, names, _ = simulate_dataset(6, 50, mu=1e-3, seed=2)
    tree = build_random_tree(ref, deltas, miss, dates, names=names)
    s = newick_string(tree)
    assert s.endswith(";")
    assert s.count("(") == tree.num_tips - 1
    assert s.count(",") == tree.num_tips - 1


def test_cli_end_to_end(tmp_path):
    ref, deltas, miss, dates, names, _ = simulate_dataset(8, 100, mu=2e-3, seed=4)
    from delphy_tpu.io.fasta import TipData
    from delphy_tpu.io.maple import write_maple
    from delphy_tpu.dates import to_iso_date
    tips = [TipData(name=f"s{i}|{to_iso_date(dates[i][0])}", t_min=dates[i][0],
                    t_max=dates[i][1], deltas=deltas[i], miss_intervals=miss[i])
            for i in range(8)]
    mp = tmp_path / "in.maple"
    write_maple(mp, "ref", ref, tips)

    log_f = tmp_path / "out.log"
    trees_f = tmp_path / "out.trees"
    env = dict(os.environ)
    env["DELPHY_TPU_FORCE_CPU"] = "1"
    r = subprocess.run(
        [sys.executable, "-m", "delphy_tpu.cli",
         "--v0-in-maple", str(mp), "--v0-steps", "2000",
         "--v0-out-log-file", str(log_f), "--v0-out-trees-file", str(trees_f),
         "--v0-seed", "3"],
        capture_output=True, text=True, timeout=600, env=env,
        cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    log_lines = log_f.read_text().strip().split("\n")
    assert log_lines[0].startswith("Sample\tposterior")
    assert len(log_lines) >= 2
    trees_text = trees_f.read_text()
    assert trees_text.startswith("#NEXUS")
    assert "tree STATE_" in trees_text
    assert trees_text.rstrip().endswith("End;")


def test_beast_xml_export(tmp_path):
    import xml.etree.ElementTree as ET
    from delphy_tpu.phylo import build_random_tree
    from delphy_tpu.run import Run
    from delphy_tpu.io.beast_xml import export_beast2_xml

    ref, deltas, miss, dates, names, _ = simulate_dataset(6, 60, mu=2e-4, seed=9)
    tree = build_random_tree(ref, deltas, miss, dates, names=names,
                             rng=np.random.default_rng(9))
    run = Run(tree, seed=9, num_cells=64, local_moves_per_global_move=100)
    run.do_mcmc_steps(100)
    out = tmp_path / "beast.xml"
    with open(out, "w") as f:
        export_beast2_xml(f, run.tree(), run, chain_length=1000)
    root = ET.parse(out).getroot()
    assert root.tag == "beast"
    seqs = root.find("data").findall("sequence")
    assert len(seqs) == 6
    assert len(seqs[0].get("value")) == 60
    ops = root.find("run").findall("operator")
    assert len(ops) >= 10


def test_beast2_7_xml_export(tmp_path):
    """BEAST2 2.7.7 dialect (reference export_beast_2_7_7_input,
    beasty_input.cpp:563-1001): beast.base namespaces, name-alias maps, ISO
    tip dates, Dirichlet frequency prior, tip-date sampling for uncertain
    tips, 2.7.7 operator kernels."""
    import io as _io
    import xml.etree.ElementTree as ET
    from delphy_tpu.phylo import build_random_tree
    from delphy_tpu.run import Run
    from delphy_tpu.io.beast_xml import export_beast2_7_xml

    ref, deltas, miss, dates, names, _ = simulate_dataset(6, 60, mu=2e-4,
                                                          seed=9)
    # give one tip an uncertain date to exercise the MRCAPrior path
    dates = list(dates)
    dates[2] = (dates[2][0], dates[2][0] + 30.0)
    tree = build_random_tree(ref, deltas, miss, dates, names=names,
                             rng=np.random.default_rng(9))
    run = Run(tree, seed=9, num_cells=64, local_moves_per_global_move=100)
    run.do_mcmc_steps(100)
    buf = _io.StringIO()
    export_beast2_7_xml(buf, run.tree(), run, chain_length=1000)
    text = buf.getvalue()
    root = ET.fromstring(text)
    assert root.tag == "beast"
    assert root.get("required") == "BEAST.base v2.7.7"
    assert root.get("version") == "2.7"
    assert len(root.findall("map")) == 10
    seqs = root.find("data").findall("sequence")
    assert len(seqs) == 6 and len(seqs[0].get("value")) == 60
    # ISO-formatted dates in the trait set
    trait = root.find("run").find("state").find("tree").find("trait")
    assert trait.get("dateFormat") == "yyyy-M-dd"
    assert "=2" in trait.get("value")  # year digits present
    ids = {e.get("id") for e in root.iter() if e.get("id")}
    assert "Dirichlet.0" in ids
    assert "AVMNOperator.input_alignment" in ids
    # the uncertain tip got a sampling prior + operator
    tip = run.tree().name[2]
    assert f"tip-dist.{tip}" in ids and f"tip-operator.{tip}" in ids
    assert "BactrianSubtreeSlide" in text and "EpochFlexOperator" in text


def test_cli_skygrid_snapshot(tmp_path):
    ref, deltas, miss, dates, names, _ = simulate_dataset(8, 100, mu=2e-3, seed=6)
    from delphy_tpu.io.fasta import TipData
    from delphy_tpu.io.maple import write_maple
    from delphy_tpu.dates import to_iso_date
    tips = [TipData(name=f"s{i}|{to_iso_date(dates[i][0])}", t_min=dates[i][0],
                    t_max=dates[i][1], deltas=deltas[i], miss_intervals=miss[i])
            for i in range(8)]
    mp = tmp_path / "in.maple"
    write_maple(mp, "ref", ref, tips)
    snap = tmp_path / "snap.npz"
    mcc = tmp_path / "mcc.nexus"
    env = dict(os.environ)
    env["DELPHY_TPU_FORCE_CPU"] = "1"
    r = subprocess.run(
        [sys.executable, "-m", "delphy_tpu.cli",
         "--v0-in-maple", str(mp), "--v0-steps", "3000",
         "--v0-pop-model", "skygrid", "--v0-skygrid-num-parameters", "6",
         "--v0-out-delphy-file", str(snap), "--v0-out-mcc-file", str(mcc),
         "--v0-tree-every", "300", "--v0-seed", "5"],
        capture_output=True, text=True, timeout=600, env=env, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    assert snap.exists()
    assert mcc.exists() and "tree MCC =" in mcc.read_text()
    # resume from snapshot
    from delphy_tpu.io.snapshot import load_run
    run2 = load_run(snap)
    assert run2.step > 0
    run2.do_mcmc_steps(300)


def test_beast_x_xml_export(tmp_path):
    """BEAST X 10.5 XML variant: well-formed, carries the core model blocks
    (reference export_beast_X_10_5_0_input, beasty_input.cpp:1075-1713)."""
    import io as _io
    import xml.etree.ElementTree as ET
    from delphy_tpu.sim import simulate_dataset
    from delphy_tpu.phylo import build_random_tree
    from delphy_tpu.run import Run
    from delphy_tpu.io.beast_xml import export_beast_x_xml

    ref, deltas, miss, dates, names, _ = simulate_dataset(
        6, 80, mu=3e-3, missing_fraction=0.05, seed=2)
    tree = build_random_tree(ref, deltas, miss, dates, names=names,
                             rng=np.random.default_rng(3))
    for pm in ("exp", "skygrid"):
        run = Run(tree, seed=1, pop_model=pm, num_cells=64)
        buf = _io.StringIO()
        export_beast_x_xml(buf, run.tree(), run)
        root = ET.fromstring(buf.getvalue())
        assert root.tag == "beast"
        ids = {e.get("id") for e in root.iter() if e.get("id")}
        assert {"taxa", "alignment", "patterns", "treeModel", "hky",
                "siteModel", "operators", "mcmc"} <= ids
        if pm == "skygrid":
            assert "skygrid" in ids
        else:
            assert "exponential" in ids

def test_write_resolved_fasta(tmp_path):
    from delphy_tpu.sim import simulate_dataset
    from delphy_tpu.phylo import build_greedy_tree
    from delphy_tpu.io.fasta import write_resolved_fasta, read_fasta
    ref, deltas, miss, dates, names, _ = simulate_dataset(
        6, 80, mu=4e-3, missing_fraction=0.1, seed=3)
    tree = build_greedy_tree(ref, deltas, miss, dates, names=names,
                             rng=np.random.default_rng(3))
    out = tmp_path / "resolved.fasta"
    write_resolved_fasta(tree, str(out))
    recs = read_fasta(str(out))
    assert len(recs) == tree.num_tips
    for i, r in enumerate(recs):
        assert r.id.startswith(tree.name[i])
        # resolved output is unambiguous ACGT: 4-bit mask = 1 << real_letter
        seq = "".join("ACGT"[int(np.log2(b))] for b in r.bits)
        assert len(seq) == 80
        # non-missing sites must match the tip's real data
        missing = set()
        for (s, e) in tree.miss_intervals[i]:
            missing.update(range(s, e))
        want = dict(deltas[i])
        for l in range(80):
            if l in missing:
                continue
            expect = "ACGT"[want.get(l, int(ref[l]))]
            assert seq[l] == expect, (i, l)

def test_newick_attributes_and_quoted_labels():
    """NEXUS-style [&key=value] annotations and quoted labels parse as the
    reference's Newick attribute maps (newick.h:25-86)."""
    from delphy_tpu.io.newick import parse_newick
    s = ("('tip one':1.5[&rate=0.5,set={1,2}],tipB[&mut=A1G]:2.0)"
         "root[&posterior=0.97]:0.0;")
    root = parse_newick(s)
    assert len(root.children) == 2
    a, b = root.children
    assert a.name == "tip one"
    assert a.attributes.get("rate") == "0.5"
    assert a.attributes.get("set") == "{1,2}"
    assert b.attributes.get("mut") == "A1G"
    assert root.attributes.get("posterior") == "0.97"
    assert abs(a.length - 1.5) < 1e-12 and abs(b.length - 2.0) < 1e-12


def test_frozen_benchmark_dataset_cli(tmp_path):
    """The frozen Ebola-like benchmark dataset (data/, generated once by
    scripts/make_frozen_benchmark.py) parses through the FULL CLI path and
    runs; its summary statistics stay in the published Gire-2014 envelope
    (81 genomes x 18,959 sites, per-tip missingness 0-2.7%)."""
    from delphy_tpu.io.maple import read_maple

    path = "/root/repo/data/ebola2014_like_81x18959.maple"
    mf = read_maple(path)
    assert len(mf.tips) == 81
    assert len(mf.ref_seq) == 18959
    for t in mf.tips:
        n_miss = sum(e - s for s, e in t.miss_intervals)
        assert 0 <= n_miss <= 0.027 * 18959
        assert "|" in t.name  # ISO-dated names, reference format

    log_f = tmp_path / "out.log"
    env = dict(os.environ)
    env["DELPHY_TPU_FORCE_CPU"] = "1"
    r = subprocess.run(
        [sys.executable, "-m", "delphy_tpu.cli",
         "--v0-in-maple", path, "--v0-steps", "3000",
         "--v0-out-log-file", str(log_f), "--v0-seed", "2"],
        capture_output=True, text=True, timeout=900, env=env,
        cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    log_lines = log_f.read_text().strip().split("\n")
    assert log_lines[0].startswith("Sample\tposterior")
    assert len(log_lines) >= 2
