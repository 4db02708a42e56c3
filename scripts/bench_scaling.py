"""Chain-scaling evidence (BASELINE.md target: >=85% scaling efficiency).

Two measurements, written to SCALING.json at the repo root:

- ``--mode chip``  (run on the real TPU): single-chip strong/weak scaling —
  warm sampling throughput of the rats NUTS config at chains in
  {1, 8, 64, 256, 1024, 4096}.  vmapped chains are *free* until the chip
  saturates; the curve shows where throughput stops growing linearly.
- ``--mode mesh``  (runs anywhere; uses 8 virtual CPU devices): weak
  scaling across a device mesh — same per-device chain count on a
  1-device vs an 8-device mesh.  On virtual devices all shards share the
  same host cores, so ideal time is 8x the 1-device time; efficiency =
  8*t1/t8 isolates GSPMD partitioning/collective overhead, which is the
  only thing a single host can measure (real multi-chip is linear in
  hardware on top of this, as chains never communicate).

Usage:  python scripts/bench_scaling.py --mode chip|mesh|both
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "SCALING.json")

ITERS = 500
BURNIN = 150


def _run(mt, rats, chains, mesh=None, iters=ITERS):
    model, inputs, inits = rats.build("nuts")
    kw = dict(iters=iters, burnin=BURNIN, thin=1, chains=chains,
              verbose=False, mesh=mesh)
    mt.mcmc(model, inputs, inits, **kw)          # compile
    t0 = time.time()
    mt.mcmc(model, inputs, inits, **kw)
    dt = time.time() - t0
    return chains * iters / dt, dt


def mode_chip():
    import jax

    import mamba_tpu as mt
    from mamba_tpu.models import rats

    dev = jax.devices()[0]
    rows = []
    base = None
    for chains in (1, 8, 64, 256, 1024, 4096):
        sps, dt = _run(mt, rats, chains)
        if base is None:
            base = sps  # chains=1 throughput
        rows.append({"chains": chains, "samples_s": round(sps, 1),
                     "warm_s": round(dt, 2),
                     "speedup_vs_1": round(sps / base, 1)})
        print(f"chains={chains:5d}  {sps:12,.0f} samples/s  "
              f"({dt:.2f}s, x{sps / base:,.1f})")
    return {"device": str(dev), "iters": ITERS, "burnin": BURNIN,
            "rows": rows}


def mode_mesh():
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
    import jax
    jax.config.update("jax_platforms", "cpu")

    import mamba_tpu as mt
    from mamba_tpu.models import rats
    from mamba_tpu.parallel import make_mesh

    per_dev = 16
    iters = 300
    m1 = make_mesh({"chains": 1}, jax.devices()[:1])
    m8 = make_mesh({"chains": 8}, jax.devices())
    sps1, t1 = _run(mt, rats, per_dev, mesh=m1, iters=iters)
    sps8, t8 = _run(mt, rats, 8 * per_dev, mesh=m8, iters=iters)
    eff = 100.0 * (8 * t1) / t8      # shared-core ideal is 8x the time
    print(f"1-dev mesh : {per_dev} chains   {t1:.2f}s  {sps1:,.0f} samples/s")
    print(f"8-dev mesh : {8 * per_dev} chains  {t8:.2f}s  {sps8:,.0f} samples/s")
    print(f"weak-scaling efficiency (GSPMD overhead proxy): {eff:.1f}%")
    return {"per_device_chains": per_dev, "iters": iters,
            "t_1dev_s": round(t1, 2), "t_8dev_s": round(t8, 2),
            "samples_s_1dev": round(sps1, 1), "samples_s_8dev": round(sps8, 1),
            "weak_scaling_efficiency_pct": round(eff, 1)}


def main():
    ap = argparse.ArgumentParser()
    # one mode per process: chip needs the TPU platform, mesh forces CPU,
    # and a JAX backend can't be switched after initialization
    ap.add_argument("--mode", choices=["chip", "mesh"], required=True)
    args = ap.parse_args()
    out = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            out = json.load(f)
    if args.mode == "chip":
        out["single_chip_chain_sweep"] = mode_chip()
    else:
        out["virtual_mesh_weak_scaling"] = mode_mesh()
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
