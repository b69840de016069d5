"""Native C++ graph builder: parity with the numpy fallbacks."""

import numpy as np
import pytest

import hydragnn_tpu.native as nat
from hydragnn_tpu.data.radius_graph import radius_graph
from hydragnn_tpu.ops.pallas_segment import plan_segment_tiles

pytestmark = pytest.mark.skipif(
    nat.get_lib() is None, reason="native lib unavailable (no g++?)"
)


def test_radius_graph_native_matches_numpy():
    rng = np.random.default_rng(0)
    pos = rng.uniform(0, 5, (150, 3)).astype(np.float32)
    ein = radius_graph(pos, 1.2, 20)
    orig = nat.radius_graph_open_native
    nat.radius_graph_open_native = lambda *a: None
    try:
        eif = radius_graph(pos, 1.2, 20)
    finally:
        nat.radius_graph_open_native = orig

    def canon(ei):
        d = np.linalg.norm(pos[ei[1]] - pos[ei[0]], axis=1)
        return sorted(zip(ei[1].tolist(), np.round(d, 4).tolist()))

    assert canon(ein) == canon(eif)


def test_pbc_native_matches_numpy():
    from hydragnn_tpu.data.pbc import radius_graph_pbc

    rng = np.random.default_rng(1)
    cell = (np.eye(3) * 2.0).astype(np.float32)
    pos = rng.uniform(0, 2, (16, 3)).astype(np.float32)
    e1, s1 = radius_graph_pbc(pos, cell, 0.9, 16)
    orig = nat.radius_graph_pbc_native
    nat.radius_graph_pbc_native = lambda *a, **k: None
    try:
        e2, s2 = radius_graph_pbc(pos, cell, 0.9, 16)
    finally:
        nat.radius_graph_pbc_native = orig
    d1 = np.sort(np.round(np.linalg.norm(pos[e1[1]] - pos[e1[0]] + s1, axis=1), 4))
    d2 = np.sort(np.round(np.linalg.norm(pos[e2[1]] - pos[e2[0]] + s2, axis=1), 4))
    assert len(d1) == len(d2)
    np.testing.assert_allclose(d1, d2, atol=1e-4)


def test_plan_native_matches_python():
    rng = np.random.default_rng(2)
    rcv = np.sort(rng.integers(0, 255, 1500)).astype(np.int32)
    rcv = np.concatenate([rcv, np.full(300, 255, np.int32)])
    mask = np.zeros(1800, bool)
    mask[:1500] = True
    pn = nat.plan_segment_tiles_native(rcv, mask, 256, 128, 512, 6)
    pp = plan_segment_tiles(rcv, mask, 256, 128, 512, 6)
    np.testing.assert_array_equal(pn["block_offsets"], pp["block_offsets"])
    np.testing.assert_array_equal(pn["blocks_per_tile"], pp["blocks_per_tile"])
    np.testing.assert_array_equal(
        pn["sid_blocks"], pp["sid_blocks"].reshape(pn["sid_blocks"].shape)
    )


def test_runtime_helpers():
    from hydragnn_tpu.parallel.runtime import get_comm_size_and_rank, nsplit

    size, rank = get_comm_size_and_rank()
    assert size >= 1 and 0 <= rank < size
    chunks = nsplit(list(range(10)), 3)
    assert [len(c) for c in chunks] == [4, 3, 3]
    assert sum(chunks, []) == list(range(10))
