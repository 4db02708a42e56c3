"""Benchmark: NUTS samples/sec/chip on the rats model (BASELINE.json metric).

Runs the flagship config — rats (BUGS hierarchical growth curves, 65
parameters) with a NUTS block over the 62 continuous parameters + a
univariate slice block on the 3 variances — with many vmapped chains on one
chip, and reports whole-run sampling throughput (compile excluded via a
warm cached run).

The reference publishes no numeric throughput (BASELINE.md); its claim is
"run-time performance on par with compiled MCMC software" (README.md:42).
``vs_baseline`` is therefore measured against BASELINE_CPU_ITERS_S: this
same config's single-chain serial throughput on host CPU with float64 —
our stand-in for the reference's compiled-CPU performance class.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import mamba_tpu as mt
from mamba_tpu.models import rats

# Measured: rats reference scheme, serial-equivalent CPU float64 engine
# (2,316 chain-iters/s, 2 chains, Xeon host). Stand-in for the reference's
# "compiled MCMC software" CPU class.
BASELINE_CPU_ITERS_S = 2300.0

CHAINS = 1024
ITERS = 1000
BURNIN = 300


def _chees_run(iters, burnin, chains):
    """Secondary metric: same rats posterior under the TPU-first ChEES-HMC
    scheme (cross-chain adaptive trajectory HMC, samplers/chees.py) — all
    vmapped chains do identical lockstep work, so raw throughput and ESS/s
    beat vmapped NUTS by ~2.4x on this model."""
    import mamba_tpu.samplers as S
    model, inputs, inits = rats.build("nuts")
    model.set_samplers([S.ChEESHMC(model.samplers[0].params),
                        *model.samplers[1:]])
    mt.mcmc(model, inputs, inits, iters, burnin=burnin, thin=1,
            chains=chains, verbose=False)
    t0 = time.time()
    sim = mt.mcmc(model, inputs, inits, iters, burnin=burnin, thin=1,
                  chains=chains, verbose=False)
    warm = time.time() - t0
    s = mt.summarystats(sim).to_dict()
    ok = bool(abs(s["mu_beta"]["Mean"] - rats.GOLDEN["mu_beta"]["Mean"]) < 0.1)
    return chains * iters / warm, warm, ok


def main():
    model, inputs, inits = rats.build("nuts")
    t0 = time.time()
    sim = mt.mcmc(model, inputs, inits, ITERS, burnin=BURNIN, thin=1,
                  chains=CHAINS, verbose=False)
    cold = time.time() - t0

    # warm run: compile cache hit -> pure sampling throughput
    t0 = time.time()
    sim = mt.mcmc(model, inputs, inits, ITERS, burnin=BURNIN, thin=1,
                  chains=CHAINS, verbose=False)
    warm = time.time() - t0

    samples_s = CHAINS * ITERS / warm
    s = mt.summarystats(sim).to_dict()
    ess_s = sum(s[k]["ESS"] for k in ("mu_beta", "s2_c", "alpha0")) / 3 \
        * CHAINS / warm
    chees_s, chees_warm, chees_ok = _chees_run(ITERS, BURNIN, CHAINS)
    golden_ok = bool(abs(s["mu_beta"]["Mean"] - rats.GOLDEN["mu_beta"]["Mean"])
                     < 0.1)

    print(json.dumps({
        "metric": "rats NUTS samples/sec/chip",
        "value": round(samples_s, 1),
        "unit": "samples/s",
        "vs_baseline": round(samples_s / BASELINE_CPU_ITERS_S, 2),
        "extra": {
            "device": str(jax.devices()[0]),
            "chains": CHAINS, "iters": ITERS,
            "cold_s": round(cold, 2), "warm_s": round(warm, 2),
            "ess_per_sec_mean_param": round(ess_s, 1),
            "mu_beta_mean": round(s["mu_beta"]["Mean"], 4),
            "golden_match": golden_ok,
            "chees_samples_s": round(chees_s, 1),
            "chees_warm_s": round(chees_warm, 2),
            "chees_golden_match": chees_ok,
        },
    }))


if __name__ == "__main__":
    main()
