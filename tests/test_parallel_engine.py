"""Mesh-sharded engine runs: same compiled scan, chains partitioned over
devices (SURVEY.md §2.7 — the TPU replacement for pmap2 process fan-out)."""

import jax
import jax.numpy as jnp
import numpy as np

import mamba_tpu as mt
from mamba_tpu.parallel import make_mesh
from jax.sharding import PartitionSpec as P


def _line():
    model = mt.Model(
        y=mt.Stochastic(1, lambda mu, s2: mt.Normal(mu, jnp.sqrt(s2)),
                        monitor=False),
        mu=mt.Logical(1, lambda xmat, beta: xmat @ beta, monitor=False),
        beta=mt.Stochastic(1, lambda: mt.Normal(jnp.zeros(2), jnp.sqrt(1000.0))),
        s2=mt.Stochastic(lambda: mt.InverseGamma(0.001, 0.001)),
    )
    model.set_samplers([mt.NUTS("beta"), mt.Slice("s2", 2.0)])
    X = jnp.stack([jnp.ones(5), jnp.arange(1.0, 6.0)], 1)
    inits = {"y": jnp.array([1.0, 3.0, 3.0, 3.0, 5.0]),
             "beta": jnp.zeros(2), "s2": 1.0}
    return model, {"xmat": X}, [inits]


def test_mesh_sharded_chains_match_unsharded():
    model, inputs, inits = _line()
    kw = dict(iters=400, burnin=150, chains=8, seed=3, verbose=False)
    plain = mt.mcmc(model, inputs, inits, **kw)
    mesh = make_mesh({"chains": 8})
    sharded = mt.mcmc(model, inputs, inits, mesh=mesh, **kw)
    # sharding changes XLA fusion layouts, so trajectories diverge chaotically
    # after a few iterations — statistical agreement is the invariant
    a, b = np.asarray(plain.value), np.asarray(sharded.value)
    np.testing.assert_allclose(a.mean((0, 2)), b.mean((0, 2)), rtol=0, atol=0.3)
    np.testing.assert_allclose(a.std((0, 2)), b.std((0, 2)), rtol=0.5, atol=0.1)


def test_mesh_2d_with_data_axis():
    # 5 (prime) observations on a data axis of 2: the engine edge-pads the
    # sharded arrays and masks the padded likelihood terms to zero, so no
    # divisibility is required of the user.
    model, inputs, inits = _line()
    mesh = make_mesh({"chains": 4, "data": 2})
    sim = mt.mcmc(model, inputs, inits, iters=400, burnin=100, chains=8,
                  seed=3, verbose=False, mesh=mesh,
                  site_specs={"y": P("data"), "xmat": P("data", None)})
    arr = np.asarray(sim.value)
    names = list(sim.names)
    assert np.isfinite(arr).all()
    b2 = arr[:, names.index("beta[2]"), :].mean()
    assert abs(b2 - 0.8) < 0.25


def test_pad_and_mask_logpdf_matches_unpadded():
    # the padded+masked compiled density must equal the unpadded density
    # at identical parameter values (padding contributes exactly zero)
    from mamba_tpu.parallel.mesh import pad_axes, pad_mask
    model, inputs, inits = _line()
    init = inits[0]
    mesh = make_mesh({"chains": 4, "data": 2})
    specs = {"y": P("data"), "xmat": P("data", None)}
    p_inputs, _ = pad_axes(mesh, specs, inputs)
    p_init, pads = pad_axes(mesh, specs, init)
    assert pads == {"y": {0: (5, 6)}}
    assert p_inputs["xmat"].shape == (6, 2) and p_init["y"].shape == (6,)
    masks = {"y": pad_mask((6,), pads["y"])}
    cm0 = mt.compile_model(model, inputs, init)
    cm1 = mt.compile_model(model, p_inputs, p_init, masks=masks)
    st0 = {k: jnp.asarray(init[k], cm0.dtype) for k in cm0.stochastic}
    st1 = {k: jnp.asarray(p_init[k], cm1.dtype) for k in cm1.stochastic}
    np.testing.assert_allclose(float(cm0.logpdf(st0)), float(cm1.logpdf(st1)),
                               rtol=1e-12)
    # block logf parity too (NUTS beta block, transformed space)
    for transform in (True, False):
        pk0, _, _, lf0 = cm0.block_functions(("beta", "s2"), transform)
        pk1, _, _, lf1 = cm1.block_functions(("beta", "s2"), transform)
        np.testing.assert_allclose(float(lf0(pk0(st0), st0)),
                                   float(lf1(pk1(st1), st1)), rtol=1e-12)


import pytest


@pytest.mark.slow
def test_rats_sharded_posterior_parity():
    # GSPMD sharding must not perturb the posterior (moved out of
    # __graft_entry__.dryrun_multichip so the driver gate stays fast).
    # Same config sharded (2-D chains x data mesh) vs unsharded;
    # trajectories diverge chaotically (different XLA fusion layouts), so
    # the invariant is agreement of posterior means within a fraction of
    # the posterior SD.
    from mamba_tpu.models import rats

    model, inputs, inits = rats.build("nuts")
    mesh = make_mesh({"chains": 4, "data": 2})
    site_specs = {"y": P("data"), "alpha": P("data"), "beta": P("data")}
    # burnin must cover actual convergence from the over-dispersed second
    # init: the conjugate s2 draws track the current SSE exactly, so an
    # unconverged chain shows s2_c in the thousands (the old width-capped
    # slice masked this by moving s2_c at most ~10/iteration)
    kw = dict(iters=500, burnin=300, thin=1, chains=8, seed=11,
              verbose=False)
    sharded = mt.mcmc(model, inputs, inits, mesh=mesh,
                      site_specs=site_specs, **kw)
    plain = mt.mcmc(model, inputs, inits, **kw)
    a = np.asarray(plain.value)     # (kept, params, chains)
    b = np.asarray(sharded.value)
    mean_a, mean_b = a.mean((0, 2)), b.mean((0, 2))
    sd = np.maximum(a.std((0, 2)), 1e-3)
    z = np.abs(mean_a - mean_b) / sd
    worst = int(np.argmax(z))
    assert z.max() < 0.75, (
        f"sharded posterior diverged: param {plain.names[worst]} "
        f"plain={mean_a[worst]:.4f} sharded={mean_b[worst]:.4f} "
        f"({z.max():.2f} posterior SDs)")


def test_chees_under_mesh():
    # pmean cross-chain collectives lower through GSPMD on the mesh
    model, inputs, inits = _line()
    model.set_samplers([mt.ChEESHMC("beta"), mt.Slice("s2", 2.0)])
    mesh = make_mesh({"chains": 8})
    sim = mt.mcmc(model, inputs, inits, iters=800, burnin=400, chains=8,
                  seed=3, verbose=False, mesh=mesh)
    arr = np.asarray(sim.value)
    assert np.isfinite(arr).all()
