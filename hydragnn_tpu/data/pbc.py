"""Periodic-boundary-condition radius graphs.

Re-derivation of the reference ``RadiusGraphPBC`` (vesin-backed,
``hydragnn/preprocess/graph_samples_checks_and_updates.py:144-417``):
neighbor search over explicit lattice-shift images, per-receiver
max-neighbour truncation sorted by distance, radius auto-expansion (x1.25,
up to 3 attempts) when a structure yields no edges, and artificial
self-edges for isolated nodes.  Host-side numpy (preprocessing), emitting
Cartesian ``edge_shifts`` so that vec = pos[recv] - pos[send] + shift.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np


def radius_graph_pbc(
    pos: np.ndarray,  # [n, 3] Cartesian
    cell: np.ndarray,  # [3, 3] lattice vectors as rows
    radius: float,
    max_neighbours: Optional[int] = None,
    pbc: Sequence[bool] = (True, True, True),
    max_attempts: int = 3,
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (edge_index [2, e], edge_shifts [e, 3] Cartesian)."""
    n = pos.shape[0]
    cell = np.asarray(cell, np.float64)

    from hydragnn_tpu.native import radius_graph_pbc_native

    for attempt in range(max_attempts):
        r = radius * (1.25**attempt)
        native = radius_graph_pbc_native(pos, cell, r, max_neighbours, pbc)
        if native is not None:
            ei, sh = native
            if ei.shape[1] > 0 or n == 1:
                return ei.astype(np.int64), sh.astype(np.float32)
        elif native is None:
            break  # no native lib: fall through to numpy path

    for attempt in range(max_attempts):
        r = radius * (1.25**attempt)
        # number of periodic images needed per (periodic) axis: project onto
        # reciprocal directions to get plane spacings
        inv = np.linalg.inv(cell)
        heights = 1.0 / np.linalg.norm(inv, axis=0)  # spacing along each axis
        nmax = [
            int(np.ceil(r / heights[k])) if pbc[k] else 0 for k in range(3)
        ]
        shifts_frac = np.array(
            [
                (i, j, k)
                for i in range(-nmax[0], nmax[0] + 1)
                for j in range(-nmax[1], nmax[1] + 1)
                for k in range(-nmax[2], nmax[2] + 1)
            ],
            np.float64,
        )
        shifts_cart = shifts_frac @ cell  # [S, 3]

        senders, receivers, shift_out, dists = [], [], [], []
        for s_idx in range(shifts_cart.shape[0]):
            sh = shifts_cart[s_idx]
            is_zero = np.allclose(shifts_frac[s_idx], 0.0)
            # vec from sender j to receiver i: pos[i] - (pos[j] + sh) ... we
            # define edge (j -> i) with shift such that
            # vec = pos[i] - pos[j] + shift; image of j displaced by -sh
            diff = pos[None, :, :] + sh[None, None, :] - pos[:, None, :]
            # diff[i, j] = pos[j] + sh - pos[i]: vector from i to image of j
            d = np.linalg.norm(diff, axis=-1)
            within = d <= r
            if is_zero:
                np.fill_diagonal(within, False)
            ii, jj = np.nonzero(within)
            # edge (sender=j, image at pos[j]+sh) -> (receiver=i):
            # convention vec = pos[recv] - pos[send] + edge_shift
            #             = pos[i] - (pos[j] + sh)  =>  edge_shift = -sh
            senders.append(jj)
            receivers.append(ii)
            shift_out.append(np.tile(-sh, (len(ii), 1)))
            dists.append(d[ii, jj])
        senders = np.concatenate(senders)
        receivers = np.concatenate(receivers)
        shift_out = np.concatenate(shift_out)
        dists = np.concatenate(dists)
        if len(senders) > 0 or n == 1:
            break

    # truncate per receiver by distance
    if max_neighbours is not None and len(senders):
        keep = np.zeros(len(senders), bool)
        order = np.lexsort((dists, receivers))
        prev_r, count = -1, 0
        for idx in order:
            rcv = receivers[idx]
            if rcv != prev_r:
                prev_r, count = rcv, 0
            if count < max_neighbours:
                keep[idx] = True
                count += 1
        senders, receivers, shift_out = (
            senders[keep],
            receivers[keep],
            shift_out[keep],
        )

    # artificial self-edges for isolated nodes (reference :300-322)
    present = np.zeros(n, bool)
    present[receivers] = True
    isolated = np.nonzero(~present)[0]
    if len(isolated):
        senders = np.concatenate([senders, isolated])
        receivers = np.concatenate([receivers, isolated])
        shift_out = np.concatenate([shift_out, np.zeros((len(isolated), 3))])

    edge_index = np.stack([senders, receivers]).astype(np.int64)
    return edge_index, shift_out.astype(np.float32)
