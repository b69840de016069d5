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


@pytest.mark.parametrize(
    "rel,argv",
    [
        ("examples/multidataset_hpo/gfm.py",
         ["--num_epoch", "1", "--num_samples", "24", "--hidden_dim", "16"]),
        ("examples/multidataset_deepspeed/train.py",
         ["--mode", "zero1", "--num_epoch", "1", "--num_samples", "24"]),
        ("examples/multibranch_hpo/train.py", ["--trials", "1", "--epochs", "1"]),
        ("examples/multidataset_hpo_sc26/structure_optimization.py",
         ["--num_epoch", "2", "--steps", "8", "--random-displacement"]),
        ("examples/multidataset_hpo_sc26/branch_weighting_mlp.py",
         ["--num_epoch", "1", "--num_samples", "32", "--mlp_epochs", "40"]),
    ],
)
def test_hpo_and_sc26_driver_smoke(rel, argv, tmp_path, monkeypatch):
    """The HPO / SC26-harness drivers run end to end at tiny scale."""
    out = _run(rel, argv, tmp_path, monkeypatch)
    assert out is not None


def test_sc26_inference_writes_json(tmp_path, monkeypatch):
    import json

    out_path = str(tmp_path / "structures.json")
    _run(
        "examples/multidataset_hpo_sc26/inference_fused_write_json.py",
        ["--num_structures", "8", "--num_epoch", "1", "--output", out_path],
        tmp_path,
        monkeypatch,
    )
    with open(out_path) as f:
        d = json.load(f)
    assert d["num_structures"] == 8
    s = d["structures"][0]
    assert len(s["forces"]) == len(s["atomic_numbers"])


def test_example_giant_graph_smoke(tmp_path, monkeypatch):
    out = _run(
        "examples/giant_graph/train.py",
        ["--nodes-per-shard", "128", "--epochs", "5", "--hidden", "16"],
        tmp_path,
        monkeypatch,
    )
    assert np.isfinite(float(out))
