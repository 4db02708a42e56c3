"""Chain-scaling evidence (BASELINE.md target: >=85% scaling efficiency).

Two measurements, written to SCALING.json at the repo root:

- ``--mode chip``  (run on the real TPU): single-chip strong/weak scaling —
  warm sampling throughput of the rats config at chains in
  {1, 8, 64, 256, 1024, 4096}, for BOTH samplers:
  * NUTS: vmapped chains run the deepest tree in lockstep, so the
    per-iteration cost grows with max-over-chains tree depth — the sweep
    records the depth distribution (``depth_mean``/``depth_max`` of the
    final iteration) to make that cost visible, plus ESS/s so mixing
    quality at scale is not hidden by raw samples/s.
  * ChEES-HMC: identical leapfrog counts on every chain — the lockstep-
    free alternative this framework recommends at high chain counts; its
    throughput curve should be monotone to saturation.
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


def _build(sampler):
    import mamba_tpu.samplers as S
    from mamba_tpu.models import rats

    model, inputs, inits = rats.build("nuts")
    if sampler == "chees":
        model.set_samplers([S.ChEESHMC(model.samplers[0].params,
                                       mass_window=50),
                            *model.samplers[1:]])
    return model, inputs, inits


def _run(mt, sampler, chains, mesh=None, iters=ITERS):
    import numpy as np

    model, inputs, inits = _build(sampler)
    kw = dict(iters=iters, burnin=BURNIN, thin=1, chains=chains,
              verbose=False, mesh=mesh)
    mt.mcmc(model, inputs, inits, **kw)          # compile
    sim = mt.mcmc(model, inputs, inits, **kw)
    # barrier-timed device compute (utils/timing.py queue-drain sync);
    # fetch_s reported separately — r3 proved block_until_ready-style
    # host walls measure dispatch/tunnel, not the chip
    dt = sim.timing["sample_s"]
    ess_s = float(np.sum(mt.ess_bulk(np.asarray(sim.value)))) / dt
    row = {"chains": chains, "samples_s": round(chains * iters / dt, 1),
           "warm_s": round(dt, 2),
           "fetch_s": round(sim.timing["fetch_s"], 2),
           "ess_s": round(ess_s, 1)}
    if sampler == "nuts":
        depth = np.asarray(sim.states["tunes"][0].depth)
        row["depth_mean"] = round(float(depth.mean()), 2)
        row["depth_max"] = int(depth.max())
    return row, dt


def mode_chip():
    import jax

    import mamba_tpu as mt

    dev = jax.devices()[0]
    out = {"device": str(dev), "iters": ITERS, "burnin": BURNIN}
    for sampler in ("nuts", "chees"):
        rows = []
        base = None
        for chains in (1, 8, 64, 256, 1024, 4096):
            row, _ = _run(mt, sampler, chains)
            if base is None:
                base = row["samples_s"]
            row["speedup_vs_1"] = round(row["samples_s"] / base, 1)
            rows.append(row)
            print(f"{sampler:6s} chains={chains:5d}  "
                  f"{row['samples_s']:12,.0f} samples/s  "
                  f"{row['ess_s']:10,.0f} ESS/s  ({row['warm_s']:.2f}s, "
                  f"x{row['speedup_vs_1']:,.1f})"
                  + (f"  depth mean {row['depth_mean']} max {row['depth_max']}"
                     if sampler == "nuts" else ""), flush=True)
        out[sampler] = rows
    return out


def mode_mesh():
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
    import jax
    jax.config.update("jax_platforms", "cpu")

    import mamba_tpu as mt
    from mamba_tpu.parallel import make_mesh

    per_dev = 16
    iters = 300
    m1 = make_mesh({"chains": 1}, jax.devices()[:1])
    m8 = make_mesh({"chains": 8}, jax.devices())
    r1, t1 = _run(mt, "nuts", per_dev, mesh=m1, iters=iters)
    r8, t8 = _run(mt, "nuts", 8 * per_dev, mesh=m8, iters=iters)
    eff = 100.0 * (8 * t1) / t8      # shared-core ideal is 8x the time
    print(f"1-dev mesh : {per_dev} chains   {t1:.2f}s  "
          f"{r1['samples_s']:,.0f} samples/s")
    print(f"8-dev mesh : {8 * per_dev} chains  {t8:.2f}s  "
          f"{r8['samples_s']:,.0f} samples/s")
    print(f"weak-scaling efficiency (GSPMD overhead proxy): {eff:.1f}%")
    return {"per_device_chains": per_dev, "iters": iters,
            "t_1dev_s": round(t1, 2), "t_8dev_s": round(t8, 2),
            "samples_s_1dev": r1["samples_s"], "samples_s_8dev": r8["samples_s"],
            "weak_scaling_efficiency_pct": round(eff, 1)}


def mode_ab():
    """Unrolled-vs-nested NUTS doubling-loop A/B at the bench config,
    barrier-timed (r3 verdict #4: decompose the r2->r3 throughput delta
    into timing-artifact vs unroll cost).  Both formulations produce
    bit-identical kept samples (tests/test_samplers.py); this measures
    only their runtime difference on the current backend."""
    import mamba_tpu as mt

    rows = {}
    for flag, label in (("1", "unrolled"), ("0", "nested_while")):
        os.environ["MAMBA_TPU_UNROLL"] = flag
        row, _ = _run(mt, "nuts", 1024)
        rows[label] = row
        print(f"{label:13s} {row['samples_s']:12,.0f} samples/s "
              f"({row['warm_s']:.2f}s)", flush=True)
    os.environ.pop("MAMBA_TPU_UNROLL", None)
    rows["speedup_unrolled_vs_nested"] = round(
        rows["unrolled"]["samples_s"] / rows["nested_while"]["samples_s"], 3)
    return rows


def main():
    ap = argparse.ArgumentParser()
    # one mode per process: chip needs the TPU platform, mesh forces CPU,
    # and a JAX backend can't be switched after initialization
    ap.add_argument("--mode", choices=["chip", "mesh", "ab"], required=True)
    args = ap.parse_args()
    out = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            out = json.load(f)
    if args.mode == "chip":
        out["single_chip_chain_sweep"] = mode_chip()
    elif args.mode == "ab":
        out["nuts_loop_formulation_ab"] = mode_ab()
    else:
        out["virtual_mesh_weak_scaling"] = mode_mesh()
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
