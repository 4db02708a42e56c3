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
- ``--mode mesh``  (runs anywhere; CPU devices): honest weak scaling with
  cores pinned 1:1 to devices — 1 device/1 core vs 2 devices/2 cores vs
  2 processes (jax.distributed) x 1 device/1 core each, fixed per-device
  chains, efficiency = t_1dev / t_ndev (ideal 100%).  An 8-virtual-device
  point is kept but labeled as 4x core-oversubscribed (NOT efficiency).
  Real multi-chip scaling cannot be measured on this box; chains never
  communicate, so on hardware it is linear on top of these overheads.

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

#: 500-iteration warmup, 350 kept: the rats NUTS scheme's documented
#: contract (models/rats.py — mass_window=100 refreshes at 100/300, and
#: chains from the over-dispersed second init need 150-300 iterations to
#: converge).  The r4 sweep ran burnin=150, which baked init transients
#: into the ESS columns at high chain counts (rank-R-hat over many chains
#: punishes any unconverged stragglers).
ITERS = 850
BURNIN = 500


def _build(sampler):
    import mamba_tpu.samplers as S
    from mamba_tpu.models import rats

    model, inputs, inits = rats.build("nuts")
    if sampler == "chees":
        model.set_samplers([S.ChEESHMC(model.samplers[0].params,
                                       mass_window=50),
                            *model.samplers[1:]])
        # ChEES's initialization contract (samplers/chees.py docstring):
        # shared cross-chain adaptation requires chains started together.
        # The r4 sweep fed it the over-dispersed two-point NUTS inits and
        # hit a 13x ESS/s collapse at 64 chains — reproduced and
        # diagnosed r5 (/tmp experiment, now tests/test_chees.py
        # ::test_chees_ess_scales_with_chains): the pooled step size
        # strangles to ~0.01 (vs 0.165 warm) accommodating the far-mode
        # half and the rank-R-hat blows to 1.6.  Shared init is the
        # contract; over-dispersed inits belong to per-chain-adaptive
        # samplers (NUTS rows keep them).
        inits = [inits[0]]
    return model, inputs, inits


def _run(mt, sampler, chains, mesh=None, iters=ITERS, burnin=None):
    import numpy as np

    model, inputs, inits = _build(sampler)
    # bounded launches at huge chain counts: a single 500-iteration NUTS
    # launch at 4096 chains (~1 min of device time) exceeds the tunneled
    # runtime's execution window and faults the worker
    kw = dict(iters=iters, burnin=BURNIN if burnin is None else burnin,
              thin=1, chains=chains,
              verbose=False, mesh=mesh,
              launch_iters=(200 if chains >= 4096 else 2000))
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
    if mesh is not None and getattr(mesh, "devices", None) is not None:
        # tune pytrees stay sharded (possibly across processes) — the
        # diagnostics below fetch them, which a multi-process run cannot
        pass
    elif sampler == "nuts":
        depth = np.asarray(sim.states["tunes"][0].depth)
        row["depth_mean"] = round(float(depth.mean()), 2)
        row["depth_max"] = int(depth.max())
    else:
        # adaptation end-state diagnostics (r4 verdict #3: the 64-chain
        # ESS/s dip needed tune introspection to explain)
        t = sim.states["tunes"][0]
        row["traj"] = round(float(np.asarray(t.traj)[0]), 4)
        row["epsilonbar"] = round(float(np.asarray(t.epsilonbar)[0]), 5)
        row["steps_per_iter_max"] = int(np.ceil(
            float(np.asarray(t.traj)[0]) / max(float(
                np.asarray(t.epsilonbar)[0]), 1e-12)))
        row["rhat_rank_max"] = round(float(np.max(
            mt.rhat_rank(np.asarray(sim.value)))), 4)
    return row, dt


def mode_chip():
    import jax

    import mamba_tpu as mt

    dev = jax.devices()[0]
    from mamba_tpu.utils.backend import nuts_unroll
    import subprocess
    commit = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                            capture_output=True, text=True,
                            cwd=ROOT).stdout.strip()
    # r4 verdict #2: stamp the loop formulation + commit the sweep was
    # measured at (the r4 table was silently measured under the
    # non-default unrolled arm and understated the engine ~3x)
    out = {"device": str(dev), "iters": ITERS, "burnin": BURNIN,
           "nuts_formulation": ("unrolled" if nuts_unroll()
                                else "nested_while (default)"),
           "commit": commit}
    # resume: a worker fault kills the process but _flush_partial keeps
    # finished rows — skip any row already measured under this config
    done = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            prev = json.load(f).get("single_chip_chain_sweep", {})
        if (prev.get("iters") == ITERS and prev.get("burnin") == BURNIN
                and prev.get("nuts_formulation") == out["nuts_formulation"]):
            done = {(s, r["chains"]): r for s in ("nuts", "chees")
                    for r in prev.get(s, [])}

    for sampler in ("nuts", "chees"):
        rows = []
        base = None
        for chains in (1, 8, 64, 256, 1024, 4096):
            if (sampler, chains) in done:
                row = done[(sampler, chains)]
                if base is None and "samples_s" in row:
                    base = row["samples_s"] / row["speedup_vs_1"]
                rows.append(row)
                out[sampler] = rows
                continue
            row = _row_subprocess(sampler, chains)
            if "samples_s" in row:
                if base is None:
                    base = row["samples_s"]
                row["speedup_vs_1"] = round(row["samples_s"] / base, 1)
                print(f"{sampler:6s} chains={chains:5d}  "
                      f"{row['samples_s']:12,.0f} samples/s  "
                      f"{row['ess_s']:10,.0f} ESS/s  ({row['warm_s']:.2f}s, "
                      f"x{row['speedup_vs_1']:,.1f})"
                      + (f"  depth mean {row['depth_mean']} "
                         f"max {row['depth_max']}"
                         if sampler == "nuts" else ""), flush=True)
            else:
                print(f"{sampler:6s} chains={chains:5d}  FAILED: {row}",
                      flush=True)
            rows.append(row)
            out[sampler] = rows
            _flush_partial(out)     # crash mid-sweep keeps finished rows
    return out


def _row_subprocess(sampler, chains):
    """Measure one sweep row in a FRESH process: the tunneled-TPU worker
    can fault mid-row (observed deterministically for 4096-chain NUTS under
    the nested formulation), and a faulted backend poisons every later call
    in the same client — per-row processes isolate that.  Retry schedule:
    backoff-retry once; for NUTS, a third attempt flips to the unrolled
    doubling formulation (the r4 sweep's arm, which ran 4096 chains
    without faulting) and stamps the row."""
    import subprocess
    attempts = [({}, None),
                ({}, None),
                ({"MAMBA_TPU_UNROLL": "1"},
                 "unrolled (nested faults the tunneled worker at this "
                 "scale)") if sampler == "nuts" else ({}, None)]
    last_err = "unknown"
    for i, (env_extra, stamp) in enumerate(attempts):
        if i:
            time.sleep(90)
        env = dict(os.environ)
        env.update(env_extra)
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--mode", "chip-row",
             "--sampler", sampler, "--chains", str(chains)],
            capture_output=True, text=True, env=env, timeout=3000)
        for line in p.stdout.splitlines():
            if line.startswith("RESULT "):
                row = json.loads(line[len("RESULT "):])
                if stamp:
                    row["formulation"] = stamp
                return row
        last_err = (p.stderr.strip().splitlines() or ["no output"])[-1][:200]
        print(f"row {sampler}/{chains} attempt {i + 1} failed: {last_err}",
              flush=True)
    return {"chains": chains, "error": last_err}


def _flush_partial(chip_out):
    prev = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            prev = json.load(f)
    prev["single_chip_chain_sweep"] = chip_out
    with open(OUT, "w") as f:
        json.dump(prev, f, indent=1)


#: enough per-device work that per-launch dispatch overhead amortizes —
#: at 16 chains the per-iteration math is ~microseconds and ANY fixed
#: overhead reads as catastrophic inefficiency (measured r5: 4.2%
#: "efficiency" for 2 processes at 16 chains/device, pure gRPC-loopback
#: dispatch cost, not compute scaling)
PER_DEV_CHAINS = 128
MESH_ITERS = 300


def _mesh_worker(n_devices: int, distributed: str | None = None):
    """Subprocess body: run the fixed-per-device-chains NUTS config on an
    ``n_devices``-device CPU mesh and print one JSON line with the
    barrier-timed sample_s.  ``distributed`` = 'coord,nproc,pid' enables
    jax.distributed (1 local device per process)."""
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_devices}")
    import jax
    jax.config.update("jax_platforms", "cpu")

    pid = 0
    if distributed:
        coord, nproc, pid = distributed.split(",")
        nproc, pid = int(nproc), int(pid)
        from mamba_tpu.parallel import distributed_init
        distributed_init(coordinator_address=coord, num_processes=nproc,
                         process_id=pid)

    import mamba_tpu as mt
    from mamba_tpu.parallel import make_mesh

    total_dev = len(jax.devices())
    mesh = make_mesh({"chains": total_dev}, jax.devices())
    row, t = _run(mt, "nuts", PER_DEV_CHAINS * total_dev, mesh=mesh,
                  iters=MESH_ITERS, burnin=100)
    if pid == 0:
        print("RESULT " + json.dumps({"devices": total_dev, "t_s": round(t, 3),
                                      "samples_s": row["samples_s"]}),
              flush=True)


def _spawn_pinned(cores: str, extra_args, env_extra=None):
    """Run this script as a core-pinned subprocess; return its RESULT dict."""
    import subprocess
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.update(env_extra or {})
    cmd = ["taskset", "-c", cores, sys.executable,
           os.path.abspath(__file__)] + extra_args
    p = subprocess.run(cmd, capture_output=True, text=True, env=env,
                       timeout=3600)
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"worker produced no RESULT\nrc={p.returncode}\n"
                       f"stdout:{p.stdout}\nstderr:{p.stderr}")


def _free_port():
    import socket
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def mode_mesh():
    """Weak scaling with fixed per-device chains, measured HONESTLY for a
    host with few cores (r4 verdict #4: the old 8-virtual-devices-on-2-cores
    number multiplied a speedup by 100 and called it efficiency).

    The only configuration this box can measure without oversubscription is
    one where cores scale with devices: 1 device pinned to 1 core vs
    2 devices pinned to 2 cores (same per-device chains — ideal weak
    scaling keeps wall time constant).  A third point runs the 2 devices as
    2 OS PROCESSES under jax.distributed (1 core + 1 device each), pricing
    the cross-process GSPMD dispatch the multi-host path adds.  Efficiency
    = t_1dev / t_Ndev, <= ~100% by construction.  Real multi-chip scaling
    cannot be measured on this machine at all — chains never communicate,
    so on real hardware it is linear by construction on top of these
    overheads (BASELINE.md north-star note)."""
    import multiprocessing
    ncores = multiprocessing.cpu_count()
    out = {"per_device_chains": PER_DEV_CHAINS, "iters": MESH_ITERS,
           "physical_cores": ncores,
           "method": "cores pinned 1:1 to devices (taskset); "
                     "efficiency = t_1dev / t_ndev, ideal 100%"}
    r1 = _spawn_pinned("0", ["--mode", "mesh-worker", "--ndev", "1"])
    out["t_1dev_1core_s"] = r1["t_s"]
    r2 = _spawn_pinned("0,1", ["--mode", "mesh-worker", "--ndev", "2"])
    out["t_2dev_2core_s"] = r2["t_s"]
    out["weak_scaling_efficiency_2dev_pct"] = round(
        100.0 * r1["t_s"] / r2["t_s"], 1)

    # 2 processes x 1 device, one core each, under jax.distributed
    import subprocess
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        ["taskset", "-c", str(i), sys.executable, os.path.abspath(__file__),
         "--mode", "mesh-worker", "--ndev", "1",
         "--distributed", f"{coord},2,{i}"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for i in range(2)]
    outs = [p.communicate(timeout=3600) for p in procs]
    res = None
    for (so, se), p in zip(outs, procs):
        if p.returncode != 0:
            raise RuntimeError(f"distributed worker rc={p.returncode}\n{se}")
        for line in so.splitlines():
            if line.startswith("RESULT "):
                res = json.loads(line[len("RESULT "):])
    out["t_2proc_2core_s"] = res["t_s"]
    out["weak_scaling_efficiency_2proc_pct"] = round(
        100.0 * r1["t_s"] / res["t_s"], 1)

    # the old oversubscribed point, kept but labeled for what it is: 8
    # virtual devices sharing the same cores measures GSPMD partitioning
    # overhead UNDER 4x core oversubscription, not scaling efficiency
    r8 = _spawn_pinned("0,1", ["--mode", "mesh-worker", "--ndev", "8"])
    out["oversubscribed_8dev_2core"] = {
        "t_8dev_s": r8["t_s"],
        "note": "8 virtual devices on 2 cores (4x oversubscribed): wall "
                "time includes core contention; NOT a scaling-efficiency "
                "measurement",
        "throughput_ratio_vs_1dev": round(
            (8 * PER_DEV_CHAINS * MESH_ITERS / r8["t_s"])
            / (PER_DEV_CHAINS * MESH_ITERS / r1["t_s"]), 2)}
    for k, v in out.items():
        print(f"{k}: {v}")
    return out


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
    ap.add_argument("--mode", choices=["chip", "mesh", "ab", "mesh-worker",
                                       "chip-row"],
                    required=True)
    ap.add_argument("--ndev", type=int, default=1)
    ap.add_argument("--distributed", default=None)
    ap.add_argument("--sampler", default="nuts")
    ap.add_argument("--chains", type=int, default=1024)
    args = ap.parse_args()
    if args.mode == "mesh-worker":
        _mesh_worker(args.ndev, args.distributed)
        return
    if args.mode == "chip-row":
        import mamba_tpu as mt
        row, _ = _run(mt, args.sampler, args.chains)
        print("RESULT " + json.dumps(row), flush=True)
        return
    out = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            out = json.load(f)
    if args.mode == "chip":
        out["single_chip_chain_sweep"] = mode_chip()
    elif args.mode == "ab":
        out["nuts_loop_formulation_ab"] = mode_ab()
    else:
        out.pop("virtual_mesh_weak_scaling", None)   # superseded (r4 #4)
        out["pinned_core_weak_scaling"] = mode_mesh()
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
