"""BEAST2 input-XML export for cross-validation runs.

Reference: core/beasty_input.cpp export_beast_2_6_2_input (lines 200-560) —
the engine emits an equivalent BEAST2 configuration (same alignment, tip
dates, HKY model, strict clock, exponential-growth coalescent, matching
priors) so posteriors can be compared run-for-run (whitepaper §5).  This
writer targets BEAST 2.6; tip times use linear years measured like BEAST's.
"""

from __future__ import annotations

import numpy as np

from .. import seq as seqm
from ..dates import to_linear_year
from ..phylo import FlatTree


def _xml_escape(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
            .replace('"', "&quot;"))


def export_beast2_xml(fh, tree: FlatTree, run, chain_length: int = 10_000_000,
                      log_every: int = 10_000):
    """Write a BEAST2 2.6-style XML for the dataset held by `run`."""
    T = tree.num_tips
    L = tree.num_sites
    hyp = run.hyp

    fh.write('<?xml version="1.0" encoding="UTF-8" standalone="no"?>\n')
    fh.write("<beast beautitemplate='Standard' beautistatus='' "
             'namespace="beast.core:beast.evolution.alignment:'
             'beast.evolution.tree.coalescent:beast.core.util:'
             'beast.evolution.nuc:beast.evolution.operators:'
             'beast.evolution.sitemodel:beast.evolution.substitutionmodel:'
             'beast.evolution.likelihood" required="" version="2.6">\n\n')

    # alignment (sequences reconstructed from the EMAT; missing sites as N)
    fh.write('  <data id="input_alignment" spec="Alignment" name="alignment">\n')
    for i in range(T):
        s = tree.sequence_at(i)
        chars = np.array(list(seqm.real_to_str(s)))
        for l in sorted(tree.missing_sites_at(i)):
            chars[l] = "N"
        fh.write(f'    <sequence id="seq_{_xml_escape(tree.name[i])}" '
                 f'spec="Sequence" taxon="{_xml_escape(tree.name[i])}" '
                 f'totalcount="4" value="{"".join(chars)}"/>\n')
    fh.write("  </data>\n\n")

    fh.write(f'  <run id="mcmc" spec="MCMC" chainLength="{chain_length}">\n')
    fh.write('    <state id="state" spec="State" storeEvery="5000">\n')
    fh.write('      <tree id="Tree.t:input_alignment" spec="beast.evolution.tree.Tree" name="stateNode">\n')
    fh.write('        <trait id="dateTrait.t:input_alignment" spec="beast.evolution.tree.TraitSet" traitname="date" value="')
    fh.write(",".join(f"{_xml_escape(tree.name[i])}={to_linear_year(float(tree.t[i])):.8f}"
                      for i in range(T)))
    fh.write('">\n')
    fh.write('          <taxa id="TaxonSet.input_alignment" spec="TaxonSet" alignment="@input_alignment"/>\n')
    fh.write("        </trait>\n")
    fh.write('        <taxonset idref="TaxonSet.input_alignment"/>\n')
    fh.write("      </tree>\n")
    mu_per_year = float(run.evo.mu) * 365.0
    fh.write(f'      <parameter id="clockRate.c:input_alignment" spec="parameter.RealParameter" name="stateNode">{mu_per_year:.8g}</parameter>\n')
    fh.write(f'      <parameter id="kappa.s:input_alignment" spec="parameter.RealParameter" lower="0.0" name="stateNode">{float(run.evo.kappa):.8g}</parameter>\n')
    if hyp.alpha_move_enabled:
        fh.write(f'      <parameter id="gammaShape.s:input_alignment" spec="parameter.RealParameter" name="stateNode">{float(run.evo.alpha):.8g}</parameter>\n')
    n0_years = float(run.pop.n0) / 365.0
    g_years = float(run.pop.g) * 365.0
    fh.write(f'      <parameter id="ePopSize.t:input_alignment" spec="parameter.RealParameter" name="stateNode">{n0_years:.8g}</parameter>\n')
    fh.write(f'      <parameter id="growthRate.t:input_alignment" spec="parameter.RealParameter" name="stateNode">{g_years:.8g}</parameter>\n')
    pi = np.asarray(run.evo.pi)
    fh.write(f'      <parameter id="freqParameter.s:input_alignment" spec="parameter.RealParameter" dimension="4" lower="0.0" upper="1.0" name="stateNode">{pi[0]:.6g} {pi[1]:.6g} {pi[2]:.6g} {pi[3]:.6g}</parameter>\n')
    fh.write("    </state>\n\n")

    fh.write('    <init id="RandomTree.t:input_alignment" spec="beast.evolution.tree.RandomTree" estimate="false" initial="@Tree.t:input_alignment" taxa="@input_alignment">\n')
    fh.write('      <populationModel id="ConstantPopulation0.t:input_alignment" spec="ConstantPopulation">\n')
    fh.write('        <parameter id="randomPopSize.t:input_alignment" spec="parameter.RealParameter" name="popSize">1.0</parameter>\n')
    fh.write("      </populationModel>\n    </init>\n\n")

    fh.write('    <distribution id="posterior" spec="util.CompoundDistribution">\n')
    fh.write('      <distribution id="prior" spec="util.CompoundDistribution">\n')
    fh.write('        <distribution id="CoalescentExponential.t:input_alignment" spec="Coalescent">\n')
    fh.write('          <populationModel id="ExponentialGrowth.t:input_alignment" spec="ExponentialGrowth" growthRate="@growthRate.t:input_alignment" popSize="@ePopSize.t:input_alignment"/>\n')
    fh.write('          <treeIntervals id="TreeIntervals.t:input_alignment" spec="TreeIntervals" tree="@Tree.t:input_alignment"/>\n')
    fh.write("        </distribution>\n")
    fh.write('        <prior id="ClockPrior.c:input_alignment" name="distribution" x="@clockRate.c:input_alignment">\n')
    fh.write('          <Uniform id="Uniform.0" name="distr" upper="Infinity"/>\n')
    fh.write("        </prior>\n")
    fh.write('        <prior id="KappaPrior.s:input_alignment" name="distribution" x="@kappa.s:input_alignment">\n')
    fh.write(f'          <LogNormal id="LogNormalDistributionModel.0" name="distr" M="{hyp.kappa_prior_mean_log}" S="{hyp.kappa_prior_sigma_log}"/>\n')
    fh.write("        </prior>\n")
    if hyp.alpha_move_enabled:
        fh.write('        <prior id="GammaShapePrior.s:input_alignment" name="distribution" x="@gammaShape.s:input_alignment">\n')
        fh.write('          <Exponential id="Exponential.0" name="distr"/>\n')
        fh.write("        </prior>\n")
    fh.write('        <prior id="ePopSizePrior.t:input_alignment" name="distribution" x="@ePopSize.t:input_alignment">\n')
    fh.write('          <OneOnX id="OneOnX.1" name="distr"/>\n')
    fh.write("        </prior>\n")
    fh.write('        <prior id="GrowthRatePrior.t:input_alignment" name="distribution" x="@growthRate.t:input_alignment">\n')
    fh.write(f'          <LaplaceDistribution id="Laplace.0" name="distr" mu="{hyp.pop_g_prior_mu * 365.0}" scale="{hyp.pop_g_prior_scale * 365.0}"/>\n')
    fh.write("        </prior>\n")
    fh.write("      </distribution>\n")
    fh.write('      <distribution id="likelihood" spec="util.CompoundDistribution" useThreads="true">\n')
    fh.write('        <distribution id="treeLikelihood.input_alignment" spec="ThreadedTreeLikelihood" data="@input_alignment" tree="@Tree.t:input_alignment">\n')
    fh.write('          <siteModel id="SiteModel.s:input_alignment" spec="SiteModel"')
    if hyp.alpha_move_enabled:
        fh.write(' gammaCategoryCount="4" shape="@gammaShape.s:input_alignment"')
    fh.write(">\n")
    fh.write('            <parameter id="mutationRate.s:input_alignment" spec="parameter.RealParameter" estimate="false" name="mutationRate">1.0</parameter>\n')
    fh.write('            <parameter id="proportionInvariant.s:input_alignment" spec="parameter.RealParameter" estimate="false" lower="0.0" name="proportionInvariant" upper="1.0">0.0</parameter>\n')
    fh.write('            <substModel id="hky.s:input_alignment" spec="HKY" kappa="@kappa.s:input_alignment">\n')
    fh.write('              <frequencies id="estimatedFreqs.s:input_alignment" spec="Frequencies" frequencies="@freqParameter.s:input_alignment"/>\n')
    fh.write("            </substModel>\n          </siteModel>\n")
    fh.write('          <branchRateModel id="StrictClock.c:input_alignment" spec="beast.evolution.branchratemodel.StrictClockModel" clock.rate="@clockRate.c:input_alignment"/>\n')
    fh.write("        </distribution>\n      </distribution>\n    </distribution>\n\n")

    # operators (beasty_input.cpp:449-500)
    W = [
        '<operator id="StrictClockRateScaler.c:input_alignment" spec="ScaleOperator" parameter="@clockRate.c:input_alignment" scaleFactor="0.75" weight="3.0"/>',
        '<operator id="KappaScaler.s:input_alignment" spec="ScaleOperator" parameter="@kappa.s:input_alignment" scaleFactor="0.5" weight="0.1"/>',
        '<operator id="CoalescentExponentialTreeScaler.t:input_alignment" spec="ScaleOperator" scaleFactor="0.5" tree="@Tree.t:input_alignment" weight="3.0"/>',
        '<operator id="CoalescentExponentialTreeRootScaler.t:input_alignment" spec="ScaleOperator" rootOnly="true" scaleFactor="0.5" tree="@Tree.t:input_alignment" weight="3.0"/>',
        '<operator id="CoalescentExponentialUniformOperator.t:input_alignment" spec="Uniform" tree="@Tree.t:input_alignment" weight="30.0"/>',
        '<operator id="CoalescentExponentialSubtreeSlide.t:input_alignment" spec="SubtreeSlide" tree="@Tree.t:input_alignment" weight="15.0"/>',
        '<operator id="CoalescentExponentialNarrow.t:input_alignment" spec="Exchange" tree="@Tree.t:input_alignment" weight="15.0"/>',
        '<operator id="CoalescentExponentialWide.t:input_alignment" spec="Exchange" isNarrow="false" tree="@Tree.t:input_alignment" weight="3.0"/>',
        '<operator id="CoalescentExponentialWilsonBalding.t:input_alignment" spec="WilsonBalding" tree="@Tree.t:input_alignment" weight="3.0"/>',
        '<operator id="ePopSizeScaler.t:input_alignment" spec="ScaleOperator" parameter="@ePopSize.t:input_alignment" scaleFactor="0.75" weight="3.0"/>',
        '<operator id="GrowthRateRandomWalk.t:input_alignment" spec="RealRandomWalkOperator" parameter="@growthRate.t:input_alignment" weight="3.0" windowSize="1.0"/>',
    ]
    if hyp.alpha_move_enabled:
        W.append('<operator id="gammaShapeScaler.s:input_alignment" spec="ScaleOperator" parameter="@gammaShape.s:input_alignment" scaleFactor="0.5" weight="0.1"/>')
    for w in W:
        fh.write(f"    {w}\n")
    fh.write('    <operator id="FrequenciesExchanger.s:input_alignment" spec="DeltaExchangeOperator" delta="0.01" weight="0.1">\n')
    fh.write('      <parameter idref="freqParameter.s:input_alignment"/>\n    </operator>\n\n')

    fh.write(f'    <logger id="tracelog" spec="Logger" fileName="beast_run.log" logEvery="{log_every}" model="@posterior" sanitiseHeaders="true" sort="smart">\n')
    for ref in ("posterior", "likelihood", "prior", "treeLikelihood.input_alignment"):
        fh.write(f'      <log idref="{ref}"/>\n')
    fh.write('      <log id="TreeHeight.t:input_alignment" spec="beast.evolution.tree.TreeHeightLogger" tree="@Tree.t:input_alignment"/>\n')
    for ref in ("clockRate.c:input_alignment", "kappa.s:input_alignment",
                "CoalescentExponential.t:input_alignment",
                "ePopSize.t:input_alignment", "growthRate.t:input_alignment",
                "freqParameter.s:input_alignment"):
        fh.write(f'      <log idref="{ref}"/>\n')
    if hyp.alpha_move_enabled:
        fh.write('      <log idref="gammaShape.s:input_alignment"/>\n')
    fh.write("    </logger>\n")
    fh.write('    <logger id="screenlog" spec="Logger" logEvery="50000">\n'
             '      <log idref="posterior"/>\n      <log idref="likelihood"/>\n'
             '      <log idref="prior"/>\n    </logger>\n')
    fh.write(f'    <logger id="treelog.t:input_alignment" spec="Logger" fileName="beast_run.trees" logEvery="{log_every}" mode="tree">\n')
    fh.write('      <log id="TreeWithMetaDataLogger.t:input_alignment" spec="beast.evolution.tree.TreeWithMetaDataLogger" tree="@Tree.t:input_alignment"/>\n')
    fh.write("    </logger>\n")
    fh.write('    <operatorschedule id="OperatorSchedule" spec="OperatorSchedule"/>\n')
    fh.write("  </run>\n</beast>\n")
