"""Golden-statistics integration tests over the example-model zoo.

Mirrors the reference's run-the-examples testing (test/runexamples.jl) but
with assertions: posterior means must sit within a few Monte-Carlo standard
errors of the published tables (BASELINE.md), and PSRF must be near 1.
Shortened run configs keep CI fast; the full golden configs are exercised
by the drive scripts / bench.
"""

import numpy as np
import pytest

import mamba_tpu as mt
from mamba_tpu.models import eyes, rats, seeds


@pytest.mark.slow
def test_rats_golden():
    model, inputs, inits = rats.build("reference")
    sim = mt.mcmc(model, inputs, inits, 6000, burnin=2000, thin=2, chains=2,
                  verbose=False)
    s = mt.summarystats(sim).to_dict()
    assert abs(s["mu_beta"]["Mean"] - 6.1831) < 0.1
    assert abs(s["alpha0"]["Mean"] - 106.626) < 2.5
    assert abs(s["s2_c"]["Mean"] - 37.254) < 6.0
    assert np.all(mt.gelmandiag(sim).value[:, 0, 0] < 1.3)


@pytest.mark.slow
def test_rats_nuts_scheme_agrees():
    # bench.py gates (rank-R-hat < 1.01, bulk-ESS floor) enforced here too,
    # at smaller scale, so the bench is never the first detector of a
    # mixing regression (r3 verdict #2/#3)
    model, inputs, inits = rats.build("nuts")
    sim = mt.mcmc(model, inputs, inits, 1700, burnin=700, thin=1, chains=16,
                  verbose=False)
    s = mt.summarystats(sim).to_dict()
    assert abs(s["mu_beta"]["Mean"] - 6.1831) < 0.05
    assert abs(s["s2_c"]["Mean"] - 37.254) < 3.0
    v = np.asarray(sim.value)
    assert float(np.max(mt.rhat_rank(v))) < 1.01
    assert float(np.min(mt.ess_bulk(v))) > 400


@pytest.mark.slow
def test_eyes_golden():
    """Mixture with latent discrete indicators: DGS + SliceSimplex path."""
    model, inputs, inits = eyes.build()
    sim = mt.mcmc(model, inputs, inits, 6000, burnin=2000, thin=2, chains=2,
                  verbose=False)
    s = mt.summarystats(sim).to_dict()
    assert abs(s["P[1]"]["Mean"] - 0.6036) < 0.08
    assert abs(s["lam[1]"]["Mean"] - 536.753) < 1.5
    assert abs(s["lam[2]"]["Mean"] - 548.987) < 1.5
    # component probabilities stay on the simplex
    comb = sim[:, ["P"], :].combine()
    assert np.all((comb > 0) & (comb < 1))


@pytest.mark.slow
def test_seeds_golden():
    model, inputs, inits = seeds.build("reference")
    sim = mt.mcmc(model, inputs, inits, 8000, burnin=2500, thin=2, chains=2,
                  verbose=False)
    s = mt.summarystats(sim).to_dict()
    assert abs(s["alpha0"]["Mean"] + 0.5562) < 0.15
    assert abs(s["alpha12"]["Mean"] + 0.7464) < 0.3
    assert abs(s["s2"]["Mean"] - 0.0857) < 0.07


@pytest.mark.slow
def test_pumps_golden():
    from mamba_tpu.models import pumps
    model, inputs, inits = pumps.build()
    sim = mt.mcmc(model, inputs, inits, 6000, burnin=2000, thin=2, chains=2,
                  verbose=False)
    s = mt.summarystats(sim).to_dict()
    assert abs(s["alpha"]["Mean"] - 0.6968) < 0.08
    assert abs(s["beta"]["Mean"] - 0.9304) < 0.16
    assert abs(s["theta[1]"]["Mean"] - 0.0599) < 0.01


@pytest.mark.slow
def test_dyes_golden():
    from mamba_tpu.models import dyes
    model, inputs, inits = dyes.build()
    sim = mt.mcmc(model, inputs, inits, 6000, burnin=2000, thin=2, chains=2,
                  verbose=False)
    s = mt.summarystats(sim).to_dict()
    assert abs(s["theta"]["Mean"] - 1526.72) < 8.0
    assert abs(s["mu[1]"]["Mean"] - 1511.48) < 8.0


@pytest.mark.slow
def test_blocker_golden():
    from mamba_tpu.models import blocker
    model, inputs, inits = blocker.build()
    sim = mt.mcmc(model, inputs, inits, 8000, burnin=2500, thin=2, chains=2,
                  verbose=False)
    s = mt.summarystats(sim).to_dict()
    assert abs(s["d"]["Mean"] + 0.2556) < 0.05
    assert abs(s["delta_new"]["Mean"] + 0.2501) < 0.08


@pytest.mark.slow
def test_stacks_golden_and_monitor_mask():
    from mamba_tpu.models import stacks
    model, inputs, inits = stacks.build()
    sim = mt.mcmc(model, inputs, inits, 6000, burnin=2000, thin=2, chains=2,
                  verbose=False)
    s = mt.summarystats(sim).to_dict()
    assert abs(s["b[1]"]["Mean"] - 0.8369) < 0.08
    assert abs(s["b0"]["Mean"] + 38.777) < 3.0
    assert abs(s["sigma"]["Mean"] - 3.488) < 0.5
    assert abs(s["outlier[21]"]["Mean"] - 0.60) < 0.25
    # element-level monitor mask: only the reference's 4 outlier entries
    stored = [n for n in sim.names if n.startswith("outlier")]
    assert stored == ["outlier[1]", "outlier[3]", "outlier[4]", "outlier[21]"]


@pytest.mark.slow
def test_salm_golden():
    from mamba_tpu.models import salm
    model, inputs, inits = salm.build()
    sim = mt.mcmc(model, inputs, inits, 8000, burnin=2500, thin=2, chains=2,
                  verbose=False)
    s = mt.summarystats(sim).to_dict()
    assert abs(s["alpha"]["Mean"] - 2.010) < 0.35
    assert abs(s["beta"]["Mean"] - 0.3543) < 0.1
    assert abs(s["s2"]["Mean"] - 0.0691) < 0.05


@pytest.mark.slow
def test_birats_golden():
    from mamba_tpu.models import birats
    model, inputs, inits = birats.build()
    sim = mt.mcmc(model, inputs, inits, 6000, burnin=2000, thin=2, chains=2,
                  verbose=False)
    s = mt.summarystats(sim).to_dict()
    assert abs(s["mu_beta[1]"]["Mean"] - 106.70) < 1.5
    assert abs(s["mu_beta[2]"]["Mean"] - 6.180) < 0.1
    assert abs(s["sigmaC"]["Mean"] - 6.143) < 0.4


@pytest.mark.slow
def test_glmm_truth_recovery():
    from mamba_tpu.models import glmm
    model, inputs, inits, truth = glmm.build(G=200, n=10, seed=1)
    sim = mt.mcmc(model, inputs, inits, 700, burnin=350, chains=2,
                  verbose=False)
    s = mt.summarystats(sim).to_dict()
    for i in range(4):
        assert abs(s[f"beta[{i+1}]"]["Mean"] - truth["beta"][i]) < 0.25
    assert 0.15 < s["s2"]["Mean"] < 1.2


@pytest.mark.slow
def test_surgical_golden():
    from mamba_tpu.models import surgical
    model, inputs, inits = surgical.build()
    sim = mt.mcmc(model, inputs, inits, 6000, burnin=2000, thin=2, chains=2,
                  verbose=False)
    s = mt.summarystats(sim).to_dict()
    assert abs(s["mu"]["Mean"] + 2.550) < 0.12
    assert abs(s["pop_mean"]["Mean"] - 0.0731) < 0.01
    assert abs(s["p[1]"]["Mean"] - 0.0536) < 0.012


@pytest.mark.slow
def test_epil_golden():
    from mamba_tpu.models import epil
    model, inputs, inits = epil.build()
    sim = mt.mcmc(model, inputs, inits, 8000, burnin=2500, thin=2, chains=2,
                  verbose=False)
    s = mt.summarystats(sim).to_dict()
    assert abs(s["alpha_Base"]["Mean"] - 0.9110) < 0.15
    assert abs(s["alpha_Trt"]["Mean"] + 0.7593) < 0.4
    assert abs(s["s2_b1"]["Mean"] - 0.2491) < 0.1
    assert abs(s["s2_b"]["Mean"] - 0.1352) < 0.06


@pytest.mark.slow
def test_equiv_golden():
    from mamba_tpu.models import equiv
    model, inputs, inits = equiv.build()
    sim = mt.mcmc(model, inputs, inits, 8000, burnin=2500, thin=2, chains=2,
                  verbose=False)
    s = mt.summarystats(sim).to_dict()
    assert abs(s["mu"]["Mean"] - 1.4387) < 0.05
    assert abs(s["theta"]["Mean"] - 1.0003) < 0.1
    assert abs(s["pi_"]["Mean"] + 0.1874) < 0.1
    assert s["equiv"]["Mean"] > 0.8


@pytest.mark.slow
def test_oxford_golden():
    from mamba_tpu.models import oxford
    model, inputs, inits = oxford.build()
    sim = mt.mcmc(model, inputs, inits, 9000, burnin=3000, thin=2, chains=2,
                  verbose=False)
    s = mt.summarystats(sim).to_dict()
    assert abs(s["alpha"]["Mean"] - 0.5658) < 0.12
    assert abs(s["beta1"]["Mean"] + 0.0433) < 0.025
    assert s["s2"]["Mean"] < 0.2


@pytest.mark.slow
def test_dogs_golden():
    """Improper Truncated(Flat) priors (dogs.jl:52-70)."""
    from mamba_tpu.models import dogs
    model, inputs, inits = dogs.build()
    sim = mt.mcmc(model, inputs, inits, 6000, burnin=2000, thin=2, chains=2,
                  verbose=False)
    s = mt.summarystats(sim).to_dict()
    assert abs(s["alpha"]["Mean"] + 0.2442) < 0.02
    assert abs(s["beta"]["Mean"] + 0.0789) < 0.01
    assert abs(s["A"]["Mean"] - 0.7836) < 0.015
    assert abs(s["B"]["Mean"] - 0.9242) < 0.01


@pytest.mark.slow
def test_mice_golden():
    """Censored Weibull survival with MISS imputation (mice.jl:20-36)."""
    from mamba_tpu.models import mice
    model, inputs, inits = mice.build()
    sim = mt.mcmc(model, inputs, inits, 6000, burnin=2500, thin=2, chains=2,
                  verbose=False)
    s = mt.summarystats(sim).to_dict()
    assert abs(s["r"]["Mean"] - 3.27) < 0.45
    assert abs(s["median[1]"]["Mean"] - 22.8) < 1.5
    assert abs(s["median[2]"]["Mean"] - 26.5) < 1.8
    # r mixes slowly under the reference's Slice(0.25) scheme; at this
    # shortened run length its PSRF can sit near 1.7
    assert np.all(mt.gelmandiag(sim).value[:, 0, 0] < 2.0)


@pytest.mark.slow
def test_bones_golden():
    """Ragged graded-response Categorical + MISS imputation (bones.jl)."""
    from mamba_tpu.models import bones
    model, inputs, inits = bones.build()
    sim = mt.mcmc(model, inputs, inits, 5000, burnin=2000, thin=2, chains=2,
                  verbose=False)
    s = mt.summarystats(sim).to_dict()
    assert abs(s["theta[1]"]["Mean"] - 0.3260) < 0.15
    assert abs(s["theta[5]"]["Mean"] - 5.5443) < 0.5
    assert abs(s["theta[13]"]["Mean"] - 16.9303) < 0.8


@pytest.mark.slow
def test_asthma_golden():
    """Batched row-simplex SliceSimplex over (3, 5) Dirichlet node."""
    from mamba_tpu.models import asthma
    model, inputs, inits = asthma.build()
    sim = mt.mcmc(model, inputs, inits, 6000, burnin=2000, thin=2, chains=3,
                  verbose=False)
    s = mt.summarystats(sim).to_dict()
    assert abs(s["q[1,1]"]["Mean"] - 0.7616) < 0.04
    assert abs(s["q[2,2]"]["Mean"] - 0.8544) < 0.02
    assert abs(s["q[3,1]"]["Mean"] - 0.2937) < 0.12
    comb = sim[:, ["q"], :].combine()
    assert np.all((comb >= 0) & (comb <= 1))


@pytest.mark.slow
def test_lsat_golden():
    from mamba_tpu.models import lsat
    model, inputs, inits = lsat.build()
    sim = mt.mcmc(model, inputs, inits, 3000, burnin=1500, thin=1, chains=2,
                  verbose=False)
    s = mt.summarystats(sim).to_dict()
    assert abs(s["beta"]["Mean"] - 0.8040) < 0.08
    assert abs(s["a[1]"]["Mean"] + 1.2624) < 0.08
    assert abs(s["a[3]"]["Mean"] - 1.2421) < 0.08


@pytest.mark.slow
def test_jaws_golden():
    """BDiagNormal likelihood + InverseWishart AMWG in Cholesky-link space."""
    from mamba_tpu.models import jaws
    model, inputs, inits = jaws.build()
    sim = mt.mcmc(model, inputs, inits, 6000, burnin=2000, thin=2, chains=2,
                  verbose=False)
    s = mt.summarystats(sim).to_dict()
    assert abs(s["beta1"]["Mean"] - 1.8743) < 0.1
    assert abs(s["Sigma[1,1]"]["Mean"] - 6.7916) < 1.5
    assert abs(s["Sigma[4,4]"]["Mean"] - 8.0594) < 1.8


@pytest.mark.slow
def test_leuk_golden():
    """Cox counting-process model; masked-rate Poisson risk set."""
    from mamba_tpu.models import leuk
    model, inputs, inits = leuk.build()
    sim = mt.mcmc(model, inputs, inits, 6000, burnin=2000, thin=2, chains=2,
                  verbose=False)
    s = mt.summarystats(sim).to_dict()
    assert abs(s["beta"]["Mean"] - 1.5521) < 0.25
    assert abs(s["S_treat[1]"]["Mean"] - 0.9830) < 0.02
    assert abs(s["S_treat[10]"]["Mean"] - 0.7718) < 0.06


@pytest.mark.slow
def test_inhalers_golden():
    """Ordered-categorical with dependent improper cutpoint truncations."""
    from mamba_tpu.models import inhalers
    model, inputs, inits = inhalers.build()
    sim = mt.mcmc(model, inputs, inits, 5000, burnin=1500, thin=2, chains=2,
                  verbose=False)
    s = mt.summarystats(sim).to_dict()
    assert abs(s["beta"]["Mean"] - 0.98) < 0.3
    assert abs(s["kappa"]["Mean"] - 0.25) < 0.2
    assert abs(s["pi_"]["Mean"] + 0.22) < 0.2
    # cutpoints stay ordered draw by draw
    comb = sim[:, ["a1", "a2", "a3"], :].combine()
    assert np.all(comb[:, 0] <= comb[:, 1]) and np.all(comb[:, 1] <= comb[:, 2])


@pytest.mark.slow
def test_magnesium_golden_mixed_node():
    """Mixed per-element prior families in one node (magnesium.jl:74-84)."""
    from mamba_tpu.models import magnesium
    model, inputs, inits = magnesium.build()
    sim = mt.mcmc(model, inputs, inits, 8000, burnin=2500, thin=2, chains=2,
                  verbose=False)
    s = mt.summarystats(sim).to_dict()
    assert abs(s["tau[6]"]["Mean"] - 0.568) < 0.12
    assert abs(s["OR[1]"]["Mean"] - 0.478) < 0.12
    assert abs(s["OR[3]"]["Mean"] - 0.431) < 0.12


@pytest.mark.slow
def test_pollution_variable_selection():
    """Bayesian variable selection: all five binary schemes on gamma.

    The reference's golden means for weakly-identified indicators
    (gamma[1], gamma[14]) are bimodal stuck-chain artifacts (ESS ~200 of
    36000, per-chain quantiles split 0/1 in pollution.rst:78-91), so only
    the robust features are asserted: gamma[9] (NOX) is decisively in and
    gamma[2] decisively uncertain-to-out.
    """
    from mamba_tpu.models import pollution
    model, inputs, inits = pollution.build("dgs")
    sim = mt.mcmc(model, inputs, inits, 3000, burnin=1000, thin=2, chains=2,
                  verbose=False)
    s = mt.summarystats(sim).to_dict()
    assert s["gamma[9]"]["Mean"] > 0.8
    assert s["gamma[2]"]["Mean"] < 0.6
    comb = sim[:, ["gamma"], :].combine()
    assert set(np.unique(comb)) <= {0.0, 1.0}


@pytest.mark.slow
@pytest.mark.parametrize("scheme", ["bhmc", "bmc3", "bmg", "bia"])
def test_pollution_binary_schemes_run(scheme):
    """The other four binary samplers drive the same block (pollution.jl:133-157)."""
    from mamba_tpu.models import pollution
    model, inputs, inits = pollution.build(scheme)
    sim = mt.mcmc(model, inputs, inits[:2], 400, burnin=150, thin=1, chains=2,
                  verbose=False)
    comb = sim[:, ["gamma"], :].combine()
    assert set(np.unique(comb)) <= {0.0, 1.0}
    # means finite; MCSE/ESS may be NaN for coordinates that never flip
    assert np.isfinite(mt.summarystats(sim).value[:, 0, :]).all()


@pytest.mark.slow
def test_line_abc_golden():
    """Likelihood-free line fit: Normal + Epanechnikov ABC kernels, nsim=3."""
    from mamba_tpu.models import line_abc
    model, inputs, inits = line_abc.build()
    sim = mt.mcmc(model, inputs, inits[:2], 2500, burnin=500, thin=1,
                  chains=2, verbose=False)
    s = mt.summarystats(sim).to_dict()
    assert abs(s["beta[1]"]["Mean"] - 0.7235) < 0.4
    assert abs(s["beta[2]"]["Mean"] - 0.7747) < 0.15
    assert abs(s["s2"]["Mean"] - 1.3074) < 0.9


@pytest.mark.slow
def test_gk_golden():
    """Quantile-only extension distribution fit by ABC (gk.jl)."""
    from mamba_tpu.models import gk
    model, inputs, inits = gk.build()
    sim = mt.mcmc(model, inputs, inits[:2], 2000, burnin=700, thin=1,
                  chains=2, verbose=False)
    s = mt.summarystats(sim).to_dict()
    assert abs(s["A"]["Mean"] - 3.0037) < 0.15
    assert abs(s["B"]["Mean"] - 1.0576) < 0.35
    assert abs(s["g"]["Mean"] - 2.0259) < 0.5
    assert abs(s["k"]["Mean"] - 0.3511) < 0.25


@pytest.mark.slow
def test_kidney_runs_and_is_sane():
    """Censored Weibull frailty; kidney.rst publishes no golden table, so
    assert sign/stability features of the posterior instead.

    Run length is deliberately short: the MISS-imputed censored times make
    the t-likelihood extraordinarily steep whenever the coefficients stray
    (|dlogf| ~ 1e4 per 0.1 of beta_age), and on the CPU backend the slice
    shrinkage ``while_loop`` executes pathologically slowly in that regime
    (r5 diagnosis — the identical math as a bounded ``fori`` runs 1000
    trips in 2 s while the while form stalls; slice loops are now capped
    at MAX_SHRINK as defense).  A short chain from the in-range inits
    stays out of the regime and still pins the posterior's sign features."""
    from mamba_tpu.models import kidney
    model, inputs, inits = kidney.build()
    sim = mt.mcmc(model, inputs, [inits[0]], 400, burnin=150, thin=1,
                  chains=2, verbose=False)
    s = mt.summarystats(sim).to_dict()
    assert np.isfinite(mt.summarystats(sim).value[:, 0, :]).all()
    assert s["beta_sex"]["Mean"] < 0       # female protective effect
    assert 0.5 < s["r"]["Mean"] < 2.5      # Weibull shape near 1.2
    assert s["s2"]["Mean"] > 0


def test_line_amwg_slice_golden():
    """AMWG+Slice sampling scheme on the tutorial line model (reference
    doc/examples/line_amwg_slice.jl): same posterior as the NUTS scheme."""
    from mamba_tpu.models import line
    model, inputs, inits = line.build(chains=2, scheme="amwg_slice")
    sim = mt.mcmc(model, inputs, inits, 8000, burnin=2000, thin=2, chains=2,
                  verbose=False)
    s = mt.summarystats(sim).to_dict()
    assert abs(s["beta[2]"]["Mean"] - line.GOLDEN["beta[2]"]["Mean"]) < 0.12
    assert abs(s["s2"]["Mean"] - line.GOLDEN["s2"]["Mean"]) < 0.8


@pytest.mark.slow
def test_rats_no_stuck_chains_from_dispersed_inits():
    # r4 regression: with a FIXED mass window, one chain per ~64 from the
    # over-dispersed second init baked its warmup transient into the mass
    # (minv ~1500 vs ~9), froze at a collapsed step size, and dragged the
    # s2_c posterior mean to ~2288.  Expanding windows + post-refresh dual
    # averaging re-centering (samplers/nuts.py) must keep every chain's
    # s2_c mean in the posterior bulk.  seed=5 is the stream that exposed
    # the original failure.
    model, inputs, inits = rats.build("nuts")
    sim = mt.mcmc(model, inputs, inits, 1200, burnin=500, thin=1,
                  chains=64, verbose=False, seed=5)
    v = np.asarray(sim.value)
    names = list(sim.names)
    per_chain = v[:, names.index("s2_c"), :].mean(0)
    assert per_chain.max() < 60.0, per_chain.max()
    assert per_chain.min() > 20.0, per_chain.min()
    eps = np.asarray(sim.states["tunes"][0].epsilonbar)
    assert (eps > 0.01).all(), eps.min()
