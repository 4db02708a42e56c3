"""Distribution kernel unit tests: logpdf/cdf/sampling parity vs scipy closed
forms (upgrade over the reference's run-the-docs smoke testing, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as st

import mamba_tpu.ops.distributions as d

KEY = jax.random.PRNGKey(0)


def assert_close(a, b, rtol=1e-6, atol=1e-8):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=rtol, atol=atol)


X = np.linspace(0.1, 5.0, 7)
XR = np.linspace(-3.0, 3.0, 7)
P01 = np.linspace(0.05, 0.95, 7)


CASES = [
    (d.Normal(1.0, 2.0), st.norm(1.0, 2.0), XR),
    (d.LogNormal(0.5, 1.2), st.lognorm(1.2, scale=np.exp(0.5)), X),
    (d.Exponential(2.0), st.expon(scale=2.0), X),
    (d.Gamma(2.5, 1.5), st.gamma(2.5, scale=1.5), X),
    (d.InverseGamma(3.0, 2.0), st.invgamma(3.0, scale=2.0), X),
    (d.Beta(2.0, 3.0), st.beta(2.0, 3.0), P01),
    (d.Uniform(-1.0, 4.0), st.uniform(-1.0, 5.0), np.linspace(-0.5, 3.5, 7)),
    (d.Cauchy(0.5, 2.0), st.cauchy(0.5, 2.0), XR),
    (d.Laplace(0.5, 2.0), st.laplace(0.5, 2.0), XR),
    (d.Logistic(0.5, 2.0), st.logistic(0.5, 2.0), XR),
    (d.TDist(4.0), st.t(4.0), XR),
    (d.Chisq(3.0), st.chi2(3.0), X),
    (d.Weibull(2.0, 1.5), st.weibull_min(2.0, scale=1.5), X),
    (d.Pareto(3.0, 1.0), st.pareto(3.0, scale=1.0), X + 1.0),
    (d.Gumbel(0.5, 2.0), st.gumbel_r(0.5, 2.0), XR),
]


@pytest.mark.parametrize("dist,ref,xs", CASES, ids=lambda c: type(c).__name__)
def test_univariate_logpdf(dist, ref, xs):
    assert_close(dist.log_prob(jnp.asarray(xs)), ref.logpdf(xs), rtol=1e-5)


@pytest.mark.parametrize("dist,ref,xs", CASES, ids=lambda c: type(c).__name__)
def test_univariate_cdf(dist, ref, xs):
    if not hasattr(dist, "cdf"):
        pytest.skip("no cdf")
    assert_close(dist.cdf(jnp.asarray(xs)), ref.cdf(xs), rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("dist,ref,xs", CASES, ids=lambda c: type(c).__name__)
def test_univariate_sample_moments(dist, ref, xs):
    s = dist.sample(KEY, (200_000,))
    m, v = ref.stats()
    if np.isfinite(m):
        assert_close(np.mean(np.asarray(s)), m, rtol=0, atol=4.5 * np.sqrt(v / 2e5) + 1e-3)


DISCRETE_CASES = [
    (d.Bernoulli(0.3), st.bernoulli(0.3), np.array([0, 1])),
    (d.Binomial(10, 0.4), st.binom(10, 0.4), np.arange(11)),
    (d.Poisson(3.5), st.poisson(3.5), np.arange(12)),
    (d.Geometric(0.3), st.geom(0.3, loc=-1), np.arange(10)),
    (d.NegativeBinomial(4.0, 0.5), st.nbinom(4, 0.5), np.arange(10)),
    (d.DiscreteUniform(2, 7), st.randint(2, 8), np.arange(2, 8)),
    (d.Hypergeometric(7, 5, 6), st.hypergeom(12, 7, 6), np.arange(2, 7)),
]


@pytest.mark.parametrize("dist,ref,xs", DISCRETE_CASES, ids=lambda c: type(c).__name__)
def test_discrete_logpmf(dist, ref, xs):
    assert_close(dist.log_prob(jnp.asarray(xs, jnp.float64)), ref.logpmf(xs), rtol=1e-5)


def test_categorical():
    p = np.array([0.2, 0.3, 0.5])
    cat = d.Categorical(p)
    assert_close(cat.log_prob(jnp.array([1.0, 2.0, 3.0])), np.log(p))
    s = cat.sample(KEY, (100_000,))
    freq = np.array([(np.asarray(s) == k).mean() for k in (1, 2, 3)])
    assert_close(freq, p, rtol=0, atol=0.01)


def test_truncated_normal():
    tn = d.Truncated(d.Normal(0.0, 1.0), -1.0, 2.0)
    ref = st.truncnorm(-1.0, 2.0)
    xs = np.linspace(-0.9, 1.9, 7)
    assert_close(tn.log_prob(jnp.asarray(xs)), ref.logpdf(xs), rtol=1e-5)
    s = tn.sample(KEY, (100_000,))
    assert np.all((np.asarray(s) >= -1) & (np.asarray(s) <= 2))
    assert_close(np.mean(np.asarray(s)), ref.mean(), atol=0.01)


def test_mvnormal_forms():
    mu = np.array([1.0, -1.0, 0.5])
    A = np.array([[2.0, 0.3, 0.1], [0.3, 1.5, 0.2], [0.1, 0.2, 1.0]])
    x = np.array([0.5, 0.2, -0.3])
    ref = st.multivariate_normal(mu, A)
    assert_close(d.MvNormal(mu, A).log_prob(jnp.asarray(x)), ref.logpdf(x), rtol=1e-6)
    # isotropic
    refi = st.multivariate_normal(mu, 4.0 * np.eye(3))
    assert_close(d.MvNormal(mu, 2.0).log_prob(jnp.asarray(x)), refi.logpdf(x), rtol=1e-6)
    # diagonal (stds)
    sd = np.array([0.5, 1.0, 2.0])
    refd = st.multivariate_normal(mu, np.diag(sd ** 2))
    assert_close(d.MvNormal(mu, sd).log_prob(jnp.asarray(x)), refd.logpdf(x), rtol=1e-6)
    # batched evaluation
    xb = np.random.RandomState(0).randn(11, 3)
    assert_close(d.MvNormal(mu, A).log_prob(jnp.asarray(xb)), ref.logpdf(xb), rtol=1e-6)
    # sampling covariance
    s = np.asarray(d.MvNormal(mu, A).sample(KEY, (200_000,)))
    assert_close(s.mean(0), mu, atol=0.02)
    assert_close(np.cov(s.T), A, atol=0.05)


def test_mvnormal_canon():
    mu = np.array([1.0, -1.0])
    A = np.array([[2.0, 0.3], [0.3, 1.5]])
    J = np.linalg.inv(A)
    h = J @ mu
    x = np.array([0.5, 0.2])
    ref = st.multivariate_normal(mu, A)
    assert_close(d.MvNormalCanon(h, J).log_prob(jnp.asarray(x)), ref.logpdf(x), rtol=1e-6)


def test_mvt():
    mu = np.array([1.0, -1.0])
    S = np.array([[2.0, 0.3], [0.3, 1.5]])
    x = np.array([0.5, 0.2])
    ref = st.multivariate_t(mu, S, df=5)
    assert_close(d.MvTDist(5.0, mu, S).log_prob(jnp.asarray(x)), ref.logpdf(x), rtol=1e-6)


def test_dirichlet():
    a = np.array([2.0, 3.0, 4.0])
    x = np.array([0.2, 0.3, 0.5])
    ref = st.dirichlet(a)
    assert_close(d.Dirichlet(a).log_prob(jnp.asarray(x)), ref.logpdf(x), rtol=1e-6)


def test_multinomial():
    p = np.array([0.2, 0.3, 0.5])
    x = np.array([2.0, 3.0, 5.0])
    ref = st.multinomial(10, p)
    assert_close(d.Multinomial(10, p).log_prob(jnp.asarray(x)), ref.logpmf(x), rtol=1e-6)


def test_bdiag_normal():
    rng = np.random.RandomState(1)
    blocks = np.stack([np.eye(2) + 0.3, 2 * np.eye(2) - 0.5])
    mu = rng.randn(4)
    full = np.zeros((4, 4))
    full[:2, :2] = blocks[0]
    full[2:, 2:] = blocks[1]
    x = rng.randn(4)
    ref = st.multivariate_normal(mu, full)
    assert_close(d.BDiagNormal(mu, blocks).log_prob(jnp.asarray(x)), ref.logpdf(x), rtol=1e-6)


def test_wishart():
    S = np.array([[1.0, 0.3], [0.3, 2.0]])
    x = np.array([[2.0, 0.5], [0.5, 3.0]])
    ref = st.wishart(5, S)
    assert_close(d.Wishart(5.0, S).log_prob(jnp.asarray(x)), ref.logpdf(x), rtol=1e-6)
    s = np.asarray(d.Wishart(5.0, S).sample(KEY, (100_000,)))
    assert_close(s.mean(0), 5 * S, rtol=0.02)


def test_inverse_wishart():
    Psi = np.array([[1.0, 0.3], [0.3, 2.0]])
    x = np.array([[2.0, 0.5], [0.5, 3.0]])
    ref = st.invwishart(5, Psi)
    assert_close(d.InverseWishart(5.0, Psi).log_prob(jnp.asarray(x)), ref.logpdf(x), rtol=1e-6)


def test_flat_symuniform():
    assert_close(d.Flat().log_prob(jnp.asarray([1.0, -5.0])), np.zeros(2))
    su = d.SymUniform(1.0, 2.0)
    assert_close(su.log_prob(jnp.asarray(0.0)), np.log(1 / 4.0))


def test_distributions_are_pytrees():
    dist = d.Normal(jnp.ones(3), 2.0)
    leaves = jax.tree_util.tree_leaves(dist)
    assert len(leaves) == 2
    mapped = jax.tree_util.tree_map(lambda x: x * 2, dist)
    assert_close(mapped.mu, 2 * np.ones(3))


def test_logprob_under_jit_and_vmap():
    @jax.jit
    def f(mu, x):
        return d.Normal(mu, 1.0).log_prob(x)

    assert_close(f(jnp.asarray(0.5), jnp.asarray(1.0)), st.norm(0.5, 1).logpdf(1.0))
    xs = jnp.linspace(-1, 1, 5)
    vs = jax.vmap(lambda x: d.Gamma(2.0, 1.0).log_prob(x))(xs + 2)
    assert_close(vs, st.gamma(2.0).logpdf(np.asarray(xs) + 2), rtol=1e-5)


def test_batched_params():
    mus = np.array([0.0, 1.0, 2.0])
    lp = d.Normal(jnp.asarray(mus), 1.0).log_prob(jnp.asarray(1.0))
    assert_close(lp, st.norm(mus, 1).logpdf(1.0))


def test_mixed_distribution():
    """Heterogeneous per-element families (reference mixed
    Array{UnivariateDistribution} nodes, distributionstruct.jl:22-79)."""
    import jax
    from mamba_tpu.ops.distributions import Mixed
    import mamba_tpu as mt
    from scipy import stats as ss

    m = Mixed(mt.Normal(1.0, 2.0), mt.Gamma(3.0, 2.0), mt.Uniform(0.0, 4.0))
    x = jnp.array([0.5, 1.5, 2.0])
    expect = (ss.norm(1, 2).logpdf(0.5) + ss.gamma(3, scale=2).logpdf(1.5)
              + ss.uniform(0, 4).logpdf(2.0))
    assert_close(m.log_prob(x), expect, rtol=1e-6)
    assert m.event_shape == (3,)
    # out-of-support element detected
    assert not bool(m.in_support(jnp.array([0.5, -1.0, 2.0])))
    # sampling: each column follows its family
    s = np.asarray(m.sample(jax.random.key(0), (20000,)))
    assert abs(s[:, 0].mean() - 1.0) < 0.05
    assert abs(s[:, 1].mean() - 6.0) < 0.15
    assert (s[:, 2] >= 0).all() and (s[:, 2] <= 4).all()
    # blockwise bijector round-trips
    b = m.bijector()
    u = b.inverse(x)
    np.testing.assert_allclose(np.asarray(b.forward(u)), np.asarray(x),
                               rtol=1e-6)
