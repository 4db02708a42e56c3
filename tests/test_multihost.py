"""Multi-host execution: 2 OS processes under jax.distributed, global mesh
over 4 virtual CPU devices (2 per process), chain-sharded mcmc.

This executes the one code path no single-process test can: real
``jax.distributed.initialize`` bring-up (``parallel/mesh.py
distributed_init`` / ``global_mesh``), cross-process GSPMD execution of the
compiled Gibbs scan, and the multi-host all-gather of monitored rows.
TPU-native replacement for the reference's user-launched Julia worker
processes (src/utils.jl:91-98, src/model/mcmc.jl:36-59), which its own CI
never exercised either (SURVEY.md §4).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "tests", "_multihost_worker.py")


def _free_port():
    import socket
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_workers(mode: str):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    # the worker pins its own platform/device-count flags
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, WORKER, coord, "2", str(pid), mode],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed rc={rc}\nstdout:{out}\nstderr:{err}"
    res = json.loads(outs[0][1].strip().splitlines()[-1])
    assert res["processes"] == 2 and res["devices"] == 4
    if "shape" in res:
        # all 8 chains' draws gathered on process 0
        assert res["shape"][2] == 8, res["shape"]
    return res


@pytest.mark.slow
def test_two_process_distributed_mcmc_matches_single_process():
    res = _run_workers("1d")

    # statistical parity with the in-process (single-host) engine: same
    # model, same seed and chain count -> identical chain RNG streams, so
    # the posterior summaries must agree to fp tolerance, not just MC error
    import jax.numpy as jnp
    import mamba_tpu as mt

    model = mt.Model(
        y=mt.Stochastic(1, lambda mu, s2: mt.Normal(mu, jnp.sqrt(s2)),
                        monitor=False),
        mu=mt.Logical(1, lambda xmat, beta: xmat @ beta, monitor=False),
        beta=mt.Stochastic(1, lambda: mt.Normal(jnp.zeros(2),
                                                jnp.sqrt(1000.0))),
        s2=mt.Stochastic(lambda: mt.InverseGamma(0.001, 0.001)),
    )
    model.set_samplers([mt.HMC("beta", 0.1, 10), mt.Slice("s2", 2.0)])
    X = jnp.stack([jnp.ones(5), jnp.arange(1.0, 6.0)], 1)
    inits = {"y": jnp.array([1.0, 3.0, 3.0, 3.0, 5.0]),
             "beta": jnp.zeros(2), "s2": 1.0}
    sim = mt.mcmc(model, {"xmat": X}, [inits], 600, burnin=200, chains=8,
                  seed=19, verbose=False)
    s = mt.summarystats(sim).to_dict()
    np.testing.assert_allclose(res["beta1"], s["beta[1]"]["Mean"], rtol=1e-8)
    np.testing.assert_allclose(res["beta2"], s["beta[2]"]["Mean"], rtol=1e-8)
    np.testing.assert_allclose(res["s2"], s["s2"]["Mean"], rtol=1e-8)


@pytest.mark.slow
def test_two_process_2d_mesh_sharded_likelihood():
    # r3 verdict #8: the psum-reduced sharded-likelihood path must cross
    # process boundaries, not just the chain axis.  Mesh (chains=2, data=2)
    # over 2 processes x 2 devices: the 5-observation axis is edge-padded
    # to 6, masked, and its log-density partial sums all-reduce over the
    # inter-process link every leapfrog step.
    res = _run_workers("2d")

    # statistical parity with the in-process engine on an identically
    # shaped 2-D mesh (4 of the parent's 8 virtual devices)
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    import mamba_tpu as mt
    from mamba_tpu.parallel import make_mesh

    model = mt.Model(
        y=mt.Stochastic(1, lambda mu, s2: mt.Normal(mu, jnp.sqrt(s2)),
                        monitor=False),
        mu=mt.Logical(1, lambda xmat, beta: xmat @ beta, monitor=False),
        beta=mt.Stochastic(1, lambda: mt.Normal(jnp.zeros(2),
                                                jnp.sqrt(1000.0))),
        s2=mt.Stochastic(lambda: mt.InverseGamma(0.001, 0.001)),
    )
    model.set_samplers([mt.HMC("beta", 0.1, 10), mt.Slice("s2", 2.0)])
    X = jnp.stack([jnp.ones(5), jnp.arange(1.0, 6.0)], 1)
    inits = {"y": jnp.array([1.0, 3.0, 3.0, 3.0, 5.0]),
             "beta": jnp.zeros(2), "s2": 1.0}
    mesh = make_mesh({"chains": 2, "data": 2}, jax.devices()[:4])
    sim = mt.mcmc(model, {"xmat": X}, [inits], 600, burnin=200, chains=8,
                  seed=19, verbose=False, mesh=mesh,
                  site_specs={"y": P("data"), "xmat": P("data", None)})
    s = mt.summarystats(sim).to_dict()
    # same program partitioning, different device placement: agreement is
    # statistical (fusion layouts may differ across process topologies)
    np.testing.assert_allclose(res["beta1"], s["beta[1]"]["Mean"], atol=0.3)
    np.testing.assert_allclose(res["beta2"], s["beta[2]"]["Mean"], atol=0.1)
    assert 0.3 < res["s2"] < 4.0


@pytest.mark.slow
def test_two_process_chees_cross_process_pmean():
    """ChEES-HMC under a 2-process mesh: the per-iteration ``lax.pmean``
    adaptation statistics all-reduce across the process boundary (r4
    verdict #8 — previously only covered by the single-process mesh test
    tests/test_parallel_engine.py::test_chees_under_mesh)."""
    res = _run_workers("chees")
    # the line posterior's scale is well known; cross-process adaptation
    # diverging would blow these straight past the tolerance
    assert abs(res["beta1"] - 0.6) < 1.0, res
    assert abs(res["beta2"] - 0.8) < 0.3, res
    assert 0.3 < res["s2"] < 5.0, res


@pytest.mark.slow
def test_two_process_smc_sharded_particles():
    """SMC with the particle axis sharded across 2 processes: systematic
    resampling's gather and the ESS psum ride the inter-process links;
    the result must match the conjugate posterior mean (r4 verdict #8)."""
    res = _run_workers("smc")
    m_exact = (1 / (8 + 0.5)) * 8.4   # conjugate_model() posterior mean
    assert res["n_particles"] == 512
    assert abs(res["mu_mean"] - m_exact) < 0.08, res
