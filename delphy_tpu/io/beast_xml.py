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


def export_beast_x_xml(fh, tree: FlatTree, run, chain_length: int = 10_000_000,
                       log_every: int = 10_000, tree_every: int = 10_000):
    """Write a BEAST X 10.5-style classic-format XML for the dataset held by
    `run` (reference export_beast_X_10_5_0_input, core/beasty_input.cpp:1075-
    1713): taxa with forward-dates (+uncertainty), alignment with missing
    sites as N, HKY + optional Gamma site model, strict clock, exponential /
    skygrid coalescent, standard operators and file/tree logs."""
    from .. import pop as popm

    if getattr(run, "mpox_hack", False):
        raise ValueError("BEAST XML export not supported with the mpox hack "
                         "(matches the reference's limitation)")

    T = tree.num_tips
    L = tree.num_sites
    hyp = run.hyp
    skygrid = isinstance(run.pop, popm.SkygridPopParams)

    fh.write('<?xml version="1.0" standalone="yes"?>\n\n')
    fh.write('<!-- BEAST X 10.5 input generated by delphy-tpu for '
             'cross-validation -->\n')
    fh.write('<beast version="10.5.0-beta5">\n\n')

    # taxa with dates (forward years; uncertainty = upper - lower bound)
    fh.write(f'  <!-- ntax={T} -->\n  <taxa id="taxa">\n')
    for i in range(T):
        name = _xml_escape(tree.name[i])
        lo = to_linear_year(float(tree.t_min[i]))
        hi = to_linear_year(float(tree.t_max[i]))
        unc = (f' uncertainty="{hi - lo:.5f}"' if hi > lo else "")
        fh.write(f'    <taxon id="{name}">\n'
                 f'      <date value="{lo:.5f}" direction="forwards" '
                 f'units="years"{unc}/>\n    </taxon>\n')
    fh.write('  </taxa>\n\n')

    fh.write(f'  <!-- ntax={T} nchar={L} -->\n')
    fh.write('  <alignment id="alignment" dataType="nucleotide">\n')
    for i in range(T):
        s = tree.sequence_at(i)
        chars = np.array(list(seqm.real_to_str(s)))
        for l in sorted(tree.missing_sites_at(i)):
            chars[l] = "N"
        fh.write(f'    <sequence>\n      <taxon idref="{_xml_escape(tree.name[i])}"/>\n'
                 f'      {"".join(chars)}\n    </sequence>\n')
    fh.write('  </alignment>\n\n')

    fh.write('  <patterns id="patterns" from="1" strip="false">\n'
             '    <alignment idref="alignment"/>\n  </patterns>\n\n')

    # coalescent model + starting tree
    if not skygrid:
        n0y = float(run.pop.n0) / 365.0
        gy = float(run.pop.g) * 365.0
        fh.write('  <exponentialGrowth id="exponential" units="years">\n'
                 '    <populationSize>\n'
                 f'      <parameter id="exponential.popSize" value="{max(n0y, 1e-12):g}" lower="0.0"/>\n'
                 '    </populationSize>\n'
                 '    <growthRate>\n'
                 f'      <parameter id="exponential.growthRate" value="{gy:g}"/>\n'
                 '    </growthRate>\n  </exponentialGrowth>\n\n')
        fh.write('  <coalescentSimulator id="startingTree">\n'
                 '    <taxa idref="taxa"/>\n'
                 '    <exponentialGrowth idref="exponential"/>\n'
                 '  </coalescentSimulator>\n\n')
        tree_prior_block = (
            '    <coalescentLikelihood id="coalescent">\n'
            '      <model>\n        <exponentialGrowth idref="exponential"/>\n'
            '      </model>\n'
            '      <populationTree>\n        <treeModel idref="treeModel"/>\n'
            '      </populationTree>\n    </coalescentLikelihood>\n')
    else:
        M = int(np.asarray(run.pop.gamma).shape[0])
        x = np.asarray(run.pop.x)
        cutoff_years = (to_linear_year(float(run.t_max_tip))
                        - to_linear_year(float(x[0])))
        fh.write('  <constantSize id="initialDemo" units="years">\n'
                 '    <populationSize>\n'
                 '      <parameter id="initialDemo.popSize" value="100.0"/>\n'
                 '    </populationSize>\n  </constantSize>\n\n')
        fh.write('  <coalescentSimulator id="startingTree">\n'
                 '    <taxa idref="taxa"/>\n'
                 '    <constantSize idref="initialDemo"/>\n'
                 '  </coalescentSimulator>\n\n')
        tree_prior_block = (
            '    <gmrfSkyGridLikelihood id="skygrid">\n'
            '      <populationSizes>\n'
            f'        <parameter id="skygrid.logPopSize" dimension="{M}" value="1.0"/>\n'
            '      </populationSizes>\n'
            '      <precisionParameter>\n'
            '        <parameter id="skygrid.precision" value="0.1" lower="0.0"/>\n'
            '      </precisionParameter>\n'
            '      <numGridPoints>\n'
            f'        <parameter id="skygrid.numGridPoints" value="{M - 1}.0"/>\n'
            '      </numGridPoints>\n'
            '      <cutOff>\n'
            f'        <parameter id="skygrid.cutOff" value="{cutoff_years:g}"/>\n'
            '      </cutOff>\n'
            '      <populationTree>\n        <treeModel idref="treeModel"/>\n'
            '      </populationTree>\n    </gmrfSkyGridLikelihood>\n')

    fh.write('  <treeModel id="treeModel">\n'
             '    <coalescentTree idref="startingTree"/>\n'
             '    <rootHeight>\n'
             '      <parameter id="treeModel.rootHeight"/>\n'
             '    </rootHeight>\n'
             '    <nodeHeights internalNodes="true">\n'
             '      <parameter id="treeModel.internalNodeHeights"/>\n'
             '    </nodeHeights>\n'
             '    <nodeHeights internalNodes="true" rootNode="true">\n'
             '      <parameter id="treeModel.allInternalNodeHeights"/>\n'
             '    </nodeHeights>\n  </treeModel>\n\n')

    mu_per_year = float(run.evo.mu) * 365.0
    fh.write('  <strictClockBranchRates id="branchRates">\n'
             '    <rate>\n'
             f'      <parameter id="clock.rate" value="{mu_per_year:g}" lower="0.0"/>\n'
             '    </rate>\n  </strictClockBranchRates>\n\n')

    pi = np.asarray(run.evo.pi)
    fh.write('  <HKYModel id="hky">\n'
             '    <frequencies>\n      <frequencyModel dataType="nucleotide">\n'
             '        <frequencies>\n'
             f'          <parameter id="frequencies" value="{pi[0]:.6g} {pi[1]:.6g} {pi[2]:.6g} {pi[3]:.6g}"/>\n'
             '        </frequencies>\n      </frequencyModel>\n    </frequencies>\n'
             '    <kappa>\n'
             f'      <parameter id="kappa" value="{float(run.evo.kappa):g}" lower="0.0"/>\n'
             '    </kappa>\n  </HKYModel>\n\n')

    gamma = hyp.alpha_move_enabled
    fh.write('  <siteModel id="siteModel">\n'
             '    <substitutionModel>\n      <HKYModel idref="hky"/>\n'
             '    </substitutionModel>\n')
    if gamma:
        fh.write('    <gammaShape gammaCategories="4">\n'
                 f'      <parameter id="alpha" value="{float(run.evo.alpha):g}" lower="0.0"/>\n'
                 '    </gammaShape>\n')
    fh.write('  </siteModel>\n\n')

    fh.write('  <treeDataLikelihood id="treeLikelihood" useAmbiguities="false">\n'
             '    <partition>\n      <patterns idref="patterns"/>\n'
             '      <siteModel idref="siteModel"/>\n    </partition>\n'
             '    <treeModel idref="treeModel"/>\n'
             '    <strictClockBranchRates idref="branchRates"/>\n'
             '  </treeDataLikelihood>\n\n')

    # operators
    fh.write('  <operators id="operators" optimizationSchedule="log">\n')
    fh.write('    <scaleOperator scaleFactor="0.75" weight="3">\n'
             '      <parameter idref="clock.rate"/>\n    </scaleOperator>\n')
    fh.write('    <scaleOperator scaleFactor="0.75" weight="1">\n'
             '      <parameter idref="kappa"/>\n    </scaleOperator>\n')
    fh.write('    <deltaExchange delta="0.01" weight="1">\n'
             '      <parameter idref="frequencies"/>\n    </deltaExchange>\n')
    if gamma:
        fh.write('    <scaleOperator scaleFactor="0.75" weight="1">\n'
                 '      <parameter idref="alpha"/>\n    </scaleOperator>\n')
    if not skygrid:
        fh.write('    <scaleOperator scaleFactor="0.75" weight="3">\n'
                 '      <parameter idref="exponential.popSize"/>\n    </scaleOperator>\n')
        fh.write('    <randomWalkOperator windowSize="1.0" weight="3">\n'
                 '      <parameter idref="exponential.growthRate"/>\n'
                 '    </randomWalkOperator>\n')
    else:
        fh.write('    <gmrfGridBlockUpdateOperator scaleFactor="2.0" weight="2">\n'
                 '      <gmrfSkyrideLikelihood idref="skygrid"/>\n'
                 '    </gmrfGridBlockUpdateOperator>\n')
        fh.write('    <scaleOperator scaleFactor="0.75" weight="1">\n'
                 '      <parameter idref="skygrid.precision"/>\n    </scaleOperator>\n')
    fh.write('    <subtreeSlide size="1.0" gaussian="true" weight="30">\n'
             '      <treeModel idref="treeModel"/>\n    </subtreeSlide>\n'
             '    <narrowExchange weight="30">\n'
             '      <treeModel idref="treeModel"/>\n    </narrowExchange>\n'
             '    <wideExchange weight="3">\n'
             '      <treeModel idref="treeModel"/>\n    </wideExchange>\n'
             '    <wilsonBalding weight="3">\n'
             '      <treeModel idref="treeModel"/>\n    </wilsonBalding>\n'
             '    <scaleOperator scaleFactor="0.75" weight="3">\n'
             '      <parameter idref="treeModel.rootHeight"/>\n    </scaleOperator>\n'
             '    <uniformOperator weight="30">\n'
             '      <parameter idref="treeModel.internalNodeHeights"/>\n'
             '    </uniformOperator>\n')
    fh.write('  </operators>\n\n')

    # mcmc + priors + logs
    stem = "delphy_beast_x"
    fh.write(f'  <mcmc id="mcmc" chainLength="{chain_length}" autoOptimize="true">\n')
    fh.write('    <joint id="joint">\n      <prior id="prior">\n')
    fh.write('        <ctmcScalePrior>\n'
             '          <ctmcScale>\n            <parameter idref="clock.rate"/>\n'
             '          </ctmcScale>\n'
             '          <treeModel idref="treeModel"/>\n'
             '        </ctmcScalePrior>\n')
    fh.write('        <logNormalPrior mu="1.0" sigma="1.25" offset="0.0">\n'
             '          <parameter idref="kappa"/>\n        </logNormalPrior>\n')
    if not skygrid:
        fh.write('        <oneOnXPrior>\n'
                 '          <parameter idref="exponential.popSize"/>\n'
                 '        </oneOnXPrior>\n')
        fh.write('        <laplacePrior mean="0.001" scale="30.701135">\n'
                 '          <parameter idref="exponential.growthRate"/>\n'
                 '        </laplacePrior>\n')
    else:
        fh.write('        <gammaPrior shape="0.001" scale="1000.0" offset="0.0">\n'
                 '          <parameter idref="skygrid.precision"/>\n'
                 '        </gammaPrior>\n')
    if gamma:
        fh.write('        <exponentialPrior mean="1.0" offset="0.0">\n'
                 '          <parameter idref="alpha"/>\n        </exponentialPrior>\n')
    fh.write('      </prior>\n      <likelihood id="likelihood">\n'
             '        <treeDataLikelihood idref="treeLikelihood"/>\n')
    fh.write(f'        {tree_prior_block}')
    fh.write('      </likelihood>\n    </joint>\n')
    fh.write('    <operators idref="operators"/>\n\n')
    fh.write(f'    <log id="screenLog" logEvery="{log_every}">\n'
             '      <column label="Joint" dp="4" width="12">\n'
             '        <joint idref="joint"/>\n      </column>\n    </log>\n')
    fh.write(f'    <log id="fileLog" logEvery="{log_every}" '
             f'fileName="{stem}.log" overwrite="false">\n'
             '      <joint idref="joint"/>\n      <prior idref="prior"/>\n'
             '      <likelihood idref="likelihood"/>\n'
             '      <parameter idref="treeModel.rootHeight"/>\n'
             '      <parameter idref="clock.rate"/>\n'
             '      <parameter idref="kappa"/>\n'
             '      <parameter idref="frequencies"/>\n')
    if gamma:
        fh.write('      <parameter idref="alpha"/>\n')
    if not skygrid:
        fh.write('      <parameter idref="exponential.popSize"/>\n'
                 '      <parameter idref="exponential.growthRate"/>\n')
    else:
        fh.write('      <parameter idref="skygrid.precision"/>\n'
                 '      <parameter idref="skygrid.logPopSize"/>\n'
                 '      <parameter idref="skygrid.cutOff"/>\n')
    fh.write('    </log>\n')
    fh.write(f'    <logTree id="treeFileLog" logEvery="{tree_every}" '
             f'nexusFormat="true" fileName="{stem}.trees" sortTranslationTable="true">\n'
             '      <treeModel idref="treeModel"/>\n'
             '      <trait name="rate" tag="rate">\n'
             '        <strictClockBranchRates idref="branchRates"/>\n'
             '      </trait>\n      <joint idref="joint"/>\n    </logTree>\n')
    fh.write('  </mcmc>\n\n')
    fh.write('  <report>\n    <property name="timer">\n'
             '      <mcmc idref="mcmc"/>\n    </property>\n  </report>\n')
    fh.write('</beast>\n')
