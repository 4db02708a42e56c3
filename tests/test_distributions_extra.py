"""Unit tests for the long-tail distribution inventory (univariate_extra,
discrete_extra, multivariate_extra) against scipy closed forms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as st
import scipy.special as ss

import mamba_tpu.ops.distributions as d

KEY = jax.random.PRNGKey(7)


def assert_close(a, b, rtol=1e-6, atol=1e-8):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=rtol, atol=atol)


X = np.linspace(0.1, 5.0, 7)
XR = np.linspace(-3.0, 3.0, 7)
P01 = np.linspace(0.05, 0.95, 7)

CASES = [
    (d.Arcsine(-1.0, 3.0), st.arcsine(loc=-1.0, scale=4.0), np.linspace(-0.9, 2.9, 7)),
    (d.BetaPrime(2.0, 3.0), st.betaprime(2.0, 3.0), X),
    (d.Chi(3.0), st.chi(3.0), X),
    (d.Cosine(0.5, 2.0), st.cosine(loc=0.5, scale=2.0 / np.pi), np.linspace(-1.4, 2.4, 7)),
    (d.Erlang(3, 1.5), st.erlang(3, scale=1.5), X),
    (d.FDist(4.0, 6.0), st.f(4.0, 6.0), X),
    (d.Frechet(2.0, 1.5), st.invweibull(2.0, scale=1.5), X),
    (d.InverseGaussian(2.0, 3.0), st.invgauss(2.0 / 3.0, scale=3.0), X),
    (d.Kolmogorov(), st.kstwobign(), np.linspace(0.4, 2.0, 7)),
    (d.Levy(0.5, 2.0), st.levy(0.5, 2.0), X + 0.5),
    (d.NoncentralChisq(3.0, 2.5), st.ncx2(3.0, 2.5), X),
    (d.NoncentralF(4.0, 6.0, 2.0), st.ncf(4.0, 6.0, 2.0), X),
    (d.NoncentralT(5.0, 1.5), st.nct(5.0, 1.5), XR),
    (d.NoncentralT(5.0, -1.5), st.nct(5.0, -1.5), XR),
    (d.NormalCanon(2.0, 4.0), st.norm(0.5, 0.5), XR),
    (d.Rayleigh(1.5), st.rayleigh(scale=1.5), X),
    (d.SymTriangularDist(0.5, 2.0), st.triang(0.5, loc=-1.5, scale=4.0),
     np.linspace(-1.4, 2.4, 7)),
    (d.TriangularDist(-1.0, 3.0, 0.5), st.triang(1.5 / 4.0, loc=-1.0, scale=4.0),
     np.linspace(-0.9, 2.9, 7)),
    (d.VonMises(0.5, 2.0), st.vonmises(2.0, loc=0.5), np.linspace(-2.5, 3.4, 7)),
]


def _id(c):
    return type(c).__name__


@pytest.mark.parametrize("dist,ref,xs", CASES, ids=lambda c: _id(c))
def test_logpdf(dist, ref, xs):
    assert_close(dist.log_prob(jnp.asarray(xs)), ref.logpdf(xs), rtol=2e-5, atol=1e-6)


@pytest.mark.parametrize("dist,ref,xs", CASES, ids=lambda c: _id(c))
def test_cdf(dist, ref, xs):
    if not hasattr(dist, "cdf"):
        pytest.skip("no cdf")
    assert_close(dist.cdf(jnp.asarray(xs)), ref.cdf(xs), rtol=2e-5, atol=1e-6)


@pytest.mark.parametrize("dist,ref,xs", CASES, ids=lambda c: _id(c))
def test_sample_moments(dist, ref, xs):
    s = np.asarray(dist.sample(KEY, (100_000,)))
    m, v = ref.stats()
    if np.isfinite(m) and np.isfinite(v):
        assert_close(np.mean(s), m, rtol=0, atol=5.0 * np.sqrt(v / 1e5) + 2e-3)


# --- kernel-density families (no scipy analog): normalization + moments ---
KERNELS = [
    (d.Biweight(0.5, 2.0), 4.0 / 7.0),
    (d.Epanechnikov(0.5, 2.0), 4.0 / 5.0),
    (d.Triweight(0.5, 2.0), 4.0 / 9.0),
]


@pytest.mark.parametrize("dist,var", KERNELS, ids=lambda c: _id(c))
def test_kernel_normalization_and_moments(dist, var):
    xs = np.linspace(-1.5, 2.5, 20001)
    pdf = np.exp(np.asarray(dist.log_prob(jnp.asarray(xs))))
    pdf[~np.asarray(dist.in_support(jnp.asarray(xs)))] = 0.0
    assert_close(np.trapezoid(pdf, xs), 1.0, rtol=1e-5)
    assert_close(np.trapezoid(pdf * xs, xs), 0.5, rtol=0, atol=1e-5)
    # cdf consistency
    cdf = np.asarray(dist.cdf(jnp.asarray(xs)))
    assert_close(cdf[-1], 1.0, rtol=1e-6)
    s = np.asarray(dist.sample(KEY, (100_000,)))
    assert_close(np.mean(s), 0.5, rtol=0, atol=0.02)
    assert_close(np.var(s), var, rtol=0.05, atol=0.0)


def test_noncentral_beta_vs_poisson_mixture():
    a, b, lam = 2.0, 3.0, 2.5
    xs = np.linspace(0.05, 0.95, 9)
    pdf = sum(st.poisson(lam / 2).pmf(j) * st.beta(a + j, b).pdf(xs)
              for j in range(60))
    assert_close(d.NoncentralBeta(a, b, lam).log_prob(jnp.asarray(xs)),
                 np.log(pdf), rtol=1e-5)
    s = np.asarray(d.NoncentralBeta(a, b, lam).sample(KEY, (100_000,)))
    mean = np.trapezoid(pdf * np.linspace(0.05, 0.95, 9), xs)  # coarse; use fine grid
    xs_f = np.linspace(1e-4, 1 - 1e-4, 20001)
    pdf_f = sum(st.poisson(lam / 2).pmf(j) * st.beta(a + j, b).pdf(xs_f)
                for j in range(60))
    assert_close(np.mean(s), np.trapezoid(pdf_f * xs_f, xs_f), rtol=0, atol=0.003)


def test_ks_finite_sample_approximations():
    n = 30
    xs = np.linspace(0.1, 0.4, 9)
    # two-sided: Stephens-corrected asymptotic, ~2e-2 accurate in the far
    # left tail at n=30, tightening quickly with n and toward the body.
    assert_close(d.KSDist(n).cdf(jnp.asarray(xs)), st.kstwo(n).cdf(xs),
                 rtol=0, atol=2e-2)
    # one-sided: exact Birnbaum-Tingey
    assert_close(d.KSOneSided(n).cdf(jnp.asarray(xs)), st.ksone(n).cdf(xs),
                 rtol=1e-5, atol=1e-7)
    assert_close(np.exp(np.asarray(d.KSOneSided(n).log_prob(jnp.asarray(xs)))),
                 st.ksone(n).pdf(xs), rtol=1e-4)


DISCRETE = [
    (d.Skellam(3.0, 1.5), st.skellam(3.0, 1.5), np.arange(-6, 10)),
    (d.NoncentralHypergeometric(7, 5, 6, 2.0),
     st.nchypergeom_fisher(12, 7, 6, 2.0), np.arange(2, 7)),
]


@pytest.mark.parametrize("dist,ref,xs", DISCRETE, ids=lambda c: _id(c))
def test_discrete_logpmf(dist, ref, xs):
    assert_close(dist.log_prob(jnp.asarray(xs, jnp.float64)), ref.logpmf(xs),
                 rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("dist,ref,xs", DISCRETE, ids=lambda c: _id(c))
def test_discrete_sample_moments(dist, ref, xs):
    s = np.asarray(dist.sample(KEY, (100_000,)))
    m, v = ref.stats()
    assert_close(np.mean(s), m, rtol=0, atol=5.0 * np.sqrt(v / 1e5) + 1e-3)
    assert_close(dist.mean(), m, rtol=1e-5, atol=1e-6)


def test_poisson_binomial():
    # equal p reduces to Binomial
    p = np.full(10, 0.4)
    pb = d.PoissonBinomial(jnp.asarray(p))
    ks = np.arange(11)
    assert_close(pb.log_prob(jnp.asarray(ks, jnp.float64)),
                 st.binom(10, 0.4).logpmf(ks), rtol=1e-5)
    # heterogeneous p: exact enumeration oracle (n=4)
    p = np.array([0.1, 0.5, 0.7, 0.9])
    pmf = np.zeros(5)
    for bits in range(16):
        sel = np.array([(bits >> i) & 1 for i in range(4)])
        pmf[sel.sum()] += np.prod(np.where(sel, p, 1 - p))
    pb = d.PoissonBinomial(jnp.asarray(p))
    assert_close(pb.log_prob(jnp.asarray(np.arange(5), jnp.float64)),
                 np.log(pmf), rtol=1e-5)
    s = np.asarray(pb.sample(KEY, (100_000,)))
    assert_close(np.mean(s), p.sum(), rtol=0, atol=0.02)


def test_log_bessel_i():
    orders = np.array([0.0, 0.5, 1.0, 2.5, 7.0])
    zs = np.array([0.1, 1.0, 5.0, 20.0, 80.0, 300.0])
    for v in orders:
        got = np.asarray(d.log_bessel_i(v, jnp.asarray(zs)))
        want = np.log(ss.ive(v, zs)) + zs
        np.testing.assert_allclose(got, want, rtol=2e-5)


def test_von_mises_fisher_p3_closed_form():
    # p=3: C(kappa) = kappa / (4 pi sinh kappa)
    kappa = 2.5
    mu = np.array([0.0, 0.6, 0.8])
    vmf = d.VonMisesFisher(jnp.asarray(mu), kappa)
    xs = np.array([[1.0, 0.0, 0.0], [0.0, 0.6, 0.8], [0.0, -0.6, -0.8]])
    want = np.log(kappa / (4 * np.pi * np.sinh(kappa))) + kappa * xs @ mu
    assert_close(vmf.log_prob(jnp.asarray(xs)), want, rtol=1e-5)


def test_von_mises_fisher_sampling():
    kappa = 10.0
    mu = np.array([0.6, 0.0, 0.8])
    vmf = d.VonMisesFisher(jnp.asarray(mu), kappa)
    s = np.asarray(vmf.sample(KEY, (20_000,)))
    assert_close(np.linalg.norm(s, axis=-1), 1.0, rtol=0, atol=1e-5)
    # resultant direction ~ mu, mean resultant length A_3(kappa) = coth(k)-1/k
    r = s.mean(0)
    a3 = 1.0 / np.tanh(kappa) - 1.0 / kappa
    assert_close(r, a3 * mu, rtol=0, atol=0.015)
    assert_close(np.asarray(vmf.mean()), a3 * mu, rtol=1e-4, atol=1e-6)


def test_von_mises_sampling():
    vm = d.VonMises(0.5, 2.0)
    s = np.asarray(vm.sample(KEY, (100_000,)))
    assert np.all(s >= 0.5 - np.pi) and np.all(s <= 0.5 + np.pi)
    # circular resultant: E[e^{i(x-mu)}] = I1(k)/I0(k)
    want = ss.i1e(2.0) / ss.i0e(2.0)
    assert_close(np.mean(np.cos(s - 0.5)), want, rtol=0, atol=0.005)
    assert_close(np.mean(np.sin(s - 0.5)), 0.0, rtol=0, atol=0.005)


def test_truncated_over_extra_family():
    # Truncated works over any new family exposing cdf (e.g. Rayleigh)
    tr = d.Truncated(d.Rayleigh(1.5), 1.0, 3.0)
    xs = np.linspace(1.05, 2.95, 7)
    ref = st.rayleigh(scale=1.5)
    mass = ref.cdf(3.0) - ref.cdf(1.0)
    assert_close(tr.log_prob(jnp.asarray(xs)), ref.logpdf(xs) - np.log(mass),
                 rtol=1e-5)
    s = np.asarray(tr.sample(KEY, (50_000,)))
    assert np.all((s >= 1.0) & (s <= 3.0))
