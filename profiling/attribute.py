"""Per-op attribution of bench configs on the real TPU.

Captures a ``jax.profiler`` trace of the jitted train step for one bench
config and dumps the top HLO ops by self time (parsed from the xplane via
tensorboard_plugin_profile) — the committed per-region evidence VERDICT r02
asked for ("no config left at <2% MFU and <30% BW unexplained").

Usage (serialized; only one process may own the TPU):
    python profiling/attribute.py mace|gps|performer|pna|egnn_force \
        [--out PROFILE.json]
"""

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import re

_CONTAINER = re.compile(r"^(\d+|jit_.*|.*\(\d+\))$")


def _category(name):
    """HLO op name -> coarse category (strip fusion ids/suffixes)."""
    base = name.split(".")[0]
    for tag in ("fusion", "convolution", "copy", "reshape", "transpose",
                "custom-call", "dynamic-slice", "dynamic-update-slice",
                "all-reduce", "scatter", "gather", "reduce", "select",
                "broadcast", "dot", "iota", "bitcast", "concatenate"):
        if tag in base:
            return base
    return base


def _top_ops_from_trace(logdir, top=40):
    """Parse the trace.json.gz event dump: sum durations per HLO op on the
    TPU device track, excluding container/step umbrella events."""
    paths = glob.glob(
        os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True
    )
    if not paths:
        return None
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {
        p for p, n in pid_names.items()
        if ("TPU" in n or "/device" in n.lower()) and "Steps" not in n
    }
    agg, cat = {}, {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        # skip umbrella/nesting events: bare step-lane digits and the
        # jit_<fn>(fingerprint) module event that spans the whole step
        if _CONTAINER.match(name):
            continue
        dur = float(e.get("dur", 0.0))  # us
        agg[name] = agg.get(name, 0.0) + dur
        c = _category(name)
        cat[c] = cat.get(c, 0.0) + dur
        total += dur
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[:top]
    crows = sorted(cat.items(), key=lambda kv: -kv[1])[:20]
    return {
        "total_busy_us": round(total, 1),
        "top_ops": [
            {"name": k[:160], "us": round(v, 1), "pct": round(100 * v / total, 2)}
            for k, v in rows
        ],
        "by_category": [
            {"name": k, "us": round(v, 1), "pct": round(100 * v / total, 2)}
            for k, v in crows
        ],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", choices=["mace", "gps", "performer", "pna",
                                       "egnn_force"])
    ap.add_argument("--out", default=None)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax

    import bench

    batch = bench.build_bench_batch(with_pe=args.config in ("gps", "performer"))
    fns = {
        "mace": lambda: bench.bench_mace,
        "pna": lambda: bench.bench_pna,
        "gps": lambda: bench.bench_gps,
        "performer": lambda: (lambda b: bench.bench_gps(b, "performer")),
        "egnn_force": lambda: bench.bench_force_step,
    }
    # rebuild the pieces by hand so we can trace the compiled step
    from hydragnn_tpu.train.loop import Trainer
    from hydragnn_tpu.models.create import create_model
    import numpy as np

    if args.config == "pna":
        cfg = bench._mk_cfg(
            "PNA", 256, 6,
            pna_deg=tuple(np.bincount(np.full(16384, 16)).tolist()),
        )
        model = create_model("PNA", cfg)
        mlip = None
    elif args.config == "mace":
        cfg = bench._mk_cfg(
            "MACE", 128, 2,
            max_ell=2, node_max_ell=1, num_radial=8, correlation=(2,),
            avg_num_neighbors=16.0, radius=4.0,
        )
        model = create_model("MACE", cfg)
        mlip = None
    elif args.config in ("gps", "performer"):
        cfg = bench._mk_cfg(
            "GIN", 256, 4,
            global_attn_engine="GPS",
            global_attn_type="multihead" if args.config == "gps" else "performer",
            global_attn_heads=8, pe_dim=2,
        )
        model = create_model("GIN", cfg)
        mlip = None
    else:
        cfg = bench._mk_cfg(
            "EGNN", 256, 4,
            output_dim=(1,), output_type=("node",),
            head_levels=("node",), task_weights=(1.0,),
            equivariance=True, max_ell=1, node_max_ell=1, num_radial=8,
            radius=4.0, avg_num_neighbors=16.0,
        )
        model = create_model("EGNN", cfg)
        mlip = {
            "energy_weight": 1.0, "energy_peratom_weight": 1.0,
            "force_weight": 25.0,
        }

    trainer = Trainer(
        model, {"type": "AdamW", "learning_rate": 1e-3},
        mlip=mlip, precision="bf16",
    )
    state = trainer.init_state(batch)
    step = trainer.train_step.lower(state, batch).compile()
    # warm up
    state2, loss, _ = step(state, batch)
    _ = float(loss)

    logdir = tempfile.mkdtemp(prefix=f"prof_{args.config}_")
    with jax.profiler.trace(logdir):
        for _ in range(args.iters):
            state2, loss, _ = step(state, batch)
        _ = float(loss)
    result = _top_ops_from_trace(logdir)
    result = {"config": args.config, "iters": args.iters, **(result or {})}
    out = args.out or f"profiling/PROFILE_{args.config}.json"
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result.get("top_ops", [])[:15], indent=1))
    print(f"written {out}; logdir={logdir}")


if __name__ == "__main__":
    main()
