"""Plot engine tests (reference src/output/plot.jl parity)."""

import os

import numpy as np
import pytest

import mamba_tpu as mt


@pytest.fixture(scope="module")
def sim():
    rng = np.random.default_rng(0)
    v = np.stack([rng.normal(0, 1, (500, 2)),
                  rng.normal(0.2, 1, (500, 2))], axis=2)
    disc = rng.integers(0, 3, (500, 1, 2)).astype(float)
    return mt.Chains(np.concatenate([v, disc], 1), start=11, thin=2,
                     names=["a", "b", "k"])


def test_plot_types_and_counts(sim):
    p = mt.plot(sim)                      # trace + density
    assert len(p) == 6
    p = mt.plot(sim, ["autocor", "mean", "bar"])
    assert len(p) == 9
    p = mt.plot(sim, "contour")
    assert len(p) == 3                    # pairs of 3 params
    p = mt.plot(sim, ["mixeddensity"])
    assert len(p) == 3
    with pytest.raises(ValueError):
        mt.plot(sim, ["nope"])


def test_draw_pagination(tmp_path, sim):
    p = mt.plot(sim, ["trace", "density"])     # 6 plots
    files = mt.draw(p, fmt="png", filename=os.path.join(tmp_path, "x"),
                    nrow=2, ncol=2)
    assert len(files) == 2                     # 6 plots / 4 per page
    for f in files:
        assert os.path.getsize(f) > 3000
    with pytest.raises(ValueError):
        mt.draw(p, fmt="bmp", filename=os.path.join(tmp_path, "y"))


def test_progress_meter_runs(capsys):
    from mamba_tpu.models import line
    model, inputs, inits = line.build()
    sim = mt.mcmc(model, inputs, inits, 300, burnin=100, chains=2,
                  verbose=False, progress=True)
    out = capsys.readouterr().out
    assert "300 Iterations x 2 Chains" in out and "100%" in out
    assert "remaining]" in out
    assert sim.niter == 200
