"""2-process ``jax.distributed`` CPU test — the analogue of the reference
CI's ``mpirun -n 2 --oversubscribe pytest --with-mpi`` leg (CI.yml:60-69).

Exercises, with REAL process boundaries (not just a virtual mesh):
``setup_distributed`` (jax.distributed.initialize + rendezvous),
``shard_samples_for_host`` per-host dataset sharding, multi-process
data-parallel training (make_array_from_process_local_data batch
assembly, psum across processes), and the multi-host orbax checkpoint
save/restore round trip.  The 2-process loss trajectory must equal the
single-process 8-device run over the same global batches.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _baseline_losses(n_epochs=4):
    """Single-process 8-device run over the same global batch set.

    ``shard_samples_for_host`` with process_count==1 returns the full
    seed-43-shuffled list, which equals shard0+shard1 of the 2-process
    split concatenated — so each epoch's single group covers exactly the
    same 8 batches, and the ng-weighted psum makes device assignment
    order-irrelevant."""
    import jax

    from hydragnn_tpu.data.batching import PaddedBatcher, compute_batch_dims
    from hydragnn_tpu.models.create import create_model
    from hydragnn_tpu.parallel.dp import DataParallelTrainer, make_mesh
    from hydragnn_tpu.parallel.runtime import shard_samples_for_host
    from tests.distributed_worker import _build_samples, build_cfg

    bs = 4
    samples = _build_samples(bs)
    dims = compute_batch_dims(samples, bs)
    loader = PaddedBatcher(shard_samples_for_host(samples), bs, dims=dims)
    model = create_model("GIN", build_cfg())
    mesh = make_mesh(8)
    trainer = DataParallelTrainer(
        model, {"type": "AdamW", "learning_rate": 1e-3}, mesh
    )
    state = trainer.place_state(trainer.init_state(next(iter(loader))))
    losses = []
    for epoch in range(n_epochs):
        loader.set_epoch(epoch)
        state, loss, _ = trainer.run_epoch(state, loader)
        losses.append(float(loss))
    return losses


@pytest.mark.slow
def test_two_process_jax_distributed_matches_single_process(tmp_path):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")

    port = _free_port()
    env = dict(os.environ)
    # the workers provision their own 4-device CPU backends in-process
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    env.pop("JAX_PLATFORM_NAME", None)
    env["PYTHONPATH"] = os.path.dirname(HERE)

    procs = [
        subprocess.Popen(
            [
                sys.executable,
                os.path.join(HERE, "distributed_worker.py"),
                str(pid),
                "2",
                f"localhost:{port}",
                str(tmp_path),
            ],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode(errors="replace"))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

    l0 = json.load(open(tmp_path / "losses_0.json"))
    l1 = json.load(open(tmp_path / "losses_1.json"))
    # losses are psum-replicated: both processes must report identical values
    np.testing.assert_allclose(l0, l1, rtol=0, atol=0)
    assert len(l0) == 4 and np.all(np.isfinite(l0))

    base = _baseline_losses()
    # same global batches + ng-weighted psum => same trajectory (fp
    # reduction order may differ across process boundaries)
    np.testing.assert_allclose(l0, base, rtol=2e-4)
