"""Sharded graph container format (the ADIOS2 / DDStore replacement).

Same schema as the reference's ADIOS layout (``adiosdataset.py:110-277``):
each per-node/per-edge field is concatenated along its variable dimension
into one global array with per-sample count/offset indices; dataset-level
attributes (minmax tables, pna_deg, names) ride in ``meta.json``.

Storage is plain ``.npy`` files (memory-mapped lazily) grouped in shard
directories -- one shard per writer host, the analogue of ADIOS
substreams + DDStore's per-rank partitioning (``distdataset.py:72-367``):
each host reads its own shards; pod-scale training shards the *dataset*,
not the file.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from hydragnn_tpu.data.sample import GraphSample

# field -> ('node'|'edge'|'graph'|'scalar', trailing shape fixed?)
_NODE_FIELDS = ("x", "pos", "y_node", "forces", "pe", "x_raw")
_EDGE_FIELDS = ("edge_attr", "edge_shifts", "rel_pe")
_GRAPH_FIELDS = ("y_graph", "graph_attr", "cell", "y_raw")


class GraphContainerWriter:
    """Writes a list of GraphSamples into one shard directory."""

    def __init__(self, path: str, attrs: Optional[Dict] = None):
        self.path = path
        self.attrs = attrs or {}
        os.makedirs(path, exist_ok=True)

    def write(self, samples: Sequence[GraphSample]):
        n = len(samples)
        counts_node = np.asarray([s.num_nodes for s in samples], np.int64)
        counts_edge = np.asarray([s.num_edges for s in samples], np.int64)
        np.save(os.path.join(self.path, "counts_node.npy"), counts_node)
        np.save(os.path.join(self.path, "counts_edge.npy"), counts_edge)

        fields = {}

        def _cat(name, getter, axis=0):
            vals = [getter(s) for s in samples]
            if any(v is None for v in vals):
                return
            arr = np.concatenate([np.asarray(v) for v in vals], axis=axis)
            np.save(os.path.join(self.path, f"{name}.npy"), arr)
            fields[name] = {"dtype": str(arr.dtype), "shape": list(arr.shape)}

        for f in _NODE_FIELDS:
            _cat(f, lambda s, f=f: getattr(s, f))
        for f in _EDGE_FIELDS:
            _cat(f, lambda s, f=f: getattr(s, f))
        _cat("edge_index", lambda s: s.edge_index, axis=1)
        for f in _GRAPH_FIELDS:
            _cat(
                f,
                lambda s, f=f: None
                if getattr(s, f) is None
                else np.asarray(getattr(s, f))[None],
            )
        # scalars
        energy = [s.energy for s in samples]
        if all(e is not None for e in energy):
            np.save(
                os.path.join(self.path, "energy.npy"),
                np.asarray(energy, np.float32),
            )
            fields["energy"] = {"dtype": "float32", "shape": [n]}
        dsid = np.asarray([s.dataset_id for s in samples], np.int32)
        np.save(os.path.join(self.path, "dataset_id.npy"), dsid)

        meta = {
            "num_samples": n,
            "fields": fields,
            "attrs": _jsonable(self.attrs),
        }
        with open(os.path.join(self.path, "meta.json"), "w") as f:
            json.dump(meta, f)


def _jsonable(obj):
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if isinstance(obj, (np.integer, np.floating)):
        return obj.item()
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    return obj


class GraphContainerDataset:
    """Lazy per-sample reads from one or more shard directories (memory
    mapped; the preload/shmem/ddstore read modes of ``adiosdataset.py``
    collapse into mmap + OS page cache)."""

    def __init__(self, paths):
        if isinstance(paths, str):
            paths = [paths]
        self.shards = []
        for p in paths:
            with open(os.path.join(p, "meta.json")) as f:
                meta = json.load(f)
            shard = {
                "path": p,
                "meta": meta,
                "counts_node": np.load(os.path.join(p, "counts_node.npy")),
                "counts_edge": np.load(os.path.join(p, "counts_edge.npy")),
                "arrays": {},
            }
            shard["off_node"] = np.concatenate(
                [[0], np.cumsum(shard["counts_node"])]
            )
            shard["off_edge"] = np.concatenate(
                [[0], np.cumsum(shard["counts_edge"])]
            )
            self.shards.append(shard)
        self._index = []
        for si, sh in enumerate(self.shards):
            self._index.extend((si, i) for i in range(sh["meta"]["num_samples"]))

    @property
    def attrs(self) -> Dict:
        return self.shards[0]["meta"]["attrs"]

    def __len__(self):
        return len(self._index)

    def _arr(self, shard, name):
        if name not in shard["arrays"]:
            fp = os.path.join(shard["path"], f"{name}.npy")
            shard["arrays"][name] = (
                np.load(fp, mmap_mode="r") if os.path.exists(fp) else None
            )
        return shard["arrays"][name]

    def __getitem__(self, idx: int) -> GraphSample:
        si, i = self._index[idx]
        sh = self.shards[si]
        n0, n1 = sh["off_node"][i], sh["off_node"][i + 1]
        e0, e1 = sh["off_edge"][i], sh["off_edge"][i + 1]

        def node(name):
            a = self._arr(sh, name)
            return None if a is None else np.array(a[n0:n1])

        def edge(name):
            a = self._arr(sh, name)
            return None if a is None else np.array(a[e0:e1])

        def graphf(name):
            a = self._arr(sh, name)
            return None if a is None else np.array(a[i])

        ei = self._arr(sh, "edge_index")
        energy = self._arr(sh, "energy")
        dsid = self._arr(sh, "dataset_id")
        return GraphSample(
            x=node("x"),
            pos=node("pos"),
            edge_index=None if ei is None else np.array(ei[:, e0:e1]),
            edge_attr=edge("edge_attr"),
            edge_shifts=edge("edge_shifts"),
            cell=graphf("cell"),
            y_graph=graphf("y_graph"),
            y_node=node("y_node"),
            graph_attr=graphf("graph_attr"),
            dataset_id=0 if dsid is None else int(dsid[i]),
            pe=node("pe"),
            rel_pe=edge("rel_pe"),
            energy=None if energy is None else float(energy[i]),
            forces=node("forces"),
            x_raw=node("x_raw"),
            y_raw=graphf("y_raw"),
        )

    def samples(self) -> List[GraphSample]:
        return [self[i] for i in range(len(self))]
