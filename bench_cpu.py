"""Reproducible CPU baseline for bench.py's ``vs_baseline`` ratio.

Measures the rats model (the flagship bench config, see bench.py) on the
host CPU in float64 with 2 chains — our stand-in for the reference's
"compiled MCMC software" performance class (reference README.md:42 makes
only that prose claim; BASELINE.md records that no numbers are published).
Writes ``BASELINE_CPU.json`` which bench.py reads, so the headline
``vs_baseline`` multiple is derived from two in-repo runs instead of a
hard-coded constant.

Run with:  python bench_cpu.py
(jax is pre-imported by the session's sitecustomize, so the platform is
switched via jax.config — env vars are ignored; see tests/conftest.py).
"""

import json
import os
import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import mamba_tpu as mt  # noqa: E402
from mamba_tpu.models import rats  # noqa: E402

CHAINS = 2
ITERS = 1500
BURNIN = 500


def main():
    assert jax.devices()[0].platform == "cpu"
    model, inputs, inits = rats.build("nuts")
    t0 = time.time()
    mt.mcmc(model, inputs, inits, ITERS, burnin=BURNIN, thin=1,
            chains=CHAINS, verbose=False)
    cold = time.time() - t0
    t0 = time.time()
    mt.mcmc(model, inputs, inits, ITERS, burnin=BURNIN, thin=1,
            chains=CHAINS, verbose=False)
    warm = time.time() - t0
    out = {
        "metric": "rats NUTS chain-iters/sec on host CPU (float64)",
        "cpu_iters_s": round(CHAINS * ITERS / warm, 1),
        "chains": CHAINS,
        "iters": ITERS,
        "burnin": BURNIN,
        "cold_s": round(cold, 2),
        "warm_s": round(warm, 2),
        "x64": True,
    }
    with open(os.path.join(os.path.dirname(__file__), "BASELINE_CPU.json"),
              "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
