"""Example-driver smoke suite (the reference's tests/test_examples.py
pattern): run the committed drivers in-process via runpy at tiny scale and
assert finite losses. Each driver synthesizes its surrogate corpus on the
fly, so these also cover the zero-egress data paths end to end."""

import os
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(rel, argv, tmp_path, monkeypatch):
    import runpy

    monkeypatch.chdir(tmp_path)  # logs/ go to tmp
    monkeypatch.setattr(sys, "argv", ["x"] + argv)
    ns = runpy.run_path(os.path.join(ROOT, rel))
    return ns["main"]()


@pytest.mark.parametrize(
    "rel,argv",
    [
        ("examples/ising_model/ising_model.py", []),
        ("examples/csce/train_gap.py",
         ["--num_epoch", "2", "--num_samples", "80"]),
        ("examples/eam/eam.py", ["--num_epoch", "2", "--num_samples", "60"]),
        ("examples/qm9/qm9.py", ["--num_epoch", "2", "--num_samples", "80"]),
        ("examples/md17/md17.py", ["--num_epoch", "2", "--num_samples", "80"]),
        ("examples/dftb_uv_spectrum/train_smooth_uv_spectrum.py",
         ["--epochs", "2", "--n-mol", "60"]),
        ("examples/ani1_x/train.py",
         ["--energy", "--num_epoch", "2", "--num_samples", "60"]),
        ("examples/nabla2_dft/train.py",
         ["--energy", "--num_epoch", "2", "--num_samples", "60"]),
    ],
)
def test_example_driver_smoke(rel, argv, tmp_path, monkeypatch):
    out = _run(rel, argv, tmp_path, monkeypatch)
    if isinstance(out, dict) and "history" in out:
        assert np.isfinite(out["history"][-1]["train"])
    elif out is not None:
        assert np.isfinite(float(out))


def test_example_giant_graph_smoke(tmp_path, monkeypatch):
    out = _run(
        "examples/giant_graph/train.py",
        ["--nodes-per-shard", "128", "--epochs", "5", "--hidden", "16"],
        tmp_path,
        monkeypatch,
    )
    assert np.isfinite(float(out))
