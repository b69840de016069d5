"""Measured-bytes attribution of a bench config (VERDICT r03 item 1).

Joins three sources for the compiled train step of one bench config:

  * a ``jax.profiler`` device trace  -> self-time per HLO instruction;
  * the optimized HLO text           -> output + operand shapes per
    instruction (an upper bound on the HBM bytes the op moves: operands
    already resident in VMEM via fusion are not visible, so treat the
    number as "tensor bytes touched") and the ``metadata`` source
    file:line each op was traced from;
  * the analytic floor of bench.py   -> the compulsory-bytes anchor.

Output: a JSON artifact with every instruction >0.2% of device time,
annotated with (us, pct, est bytes touched, implied GB/s, source line),
plus per-source-line rollups -- the "where do 119 of 122 ms go" table.

Usage (one TPU process at a time):
    python profiling/bytes_attrib.py pna [--out profiling/BYTES_pna.json]
"""

import argparse
import glob
import gzip
import json
import os
import re
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_SHAPE = re.compile(r"(bf16|f32|f16|s32|u32|s8|u8|pred|s64|f64)\[([\d,]*)\]")
_DEF = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(\(?)(.*?)\s+"
    r"(fusion|custom-call|copy|convolution|dot|reduce|scatter|gather|"
    r"all-reduce|all-gather|reduce-scatter|dynamic-slice|"
    r"dynamic-update-slice|transpose|broadcast|concatenate|pad|select|"
    r"add|multiply|compare|reshape|bitcast|convert|iota|constant|"
    r"parameter|get-tuple-element|tuple|while|conditional|call|rng|"
    r"slice|copy-start|copy-done|log|exponential|sqrt|rsqrt|divide|"
    r"subtract|maximum|minimum|negate|abs|tanh|power|and|or|not|sort|"
    r"reduce-window|clamp|sign|floor|ceil|round|is-finite|remainder|"
    r"partition-id|replica-id|after-all|bitcast-convert|map|"
    r"domain|infeed|outfeed|send|recv|optimization-barrier)"
)
_META = re.compile(
    r'metadata=\{[^}]*?op_name="([^"]*)"[^}]*?'
    r'source_file="([^"]*)"\s+source_line=(\d+)'
)


def _operand_names(tail, limit=20000):
    """Names inside the first (...) of ``tail`` via a linear scan — NO
    regex: constant literals can be MB-long and a nested-quantifier regex
    backtracks exponentially on them."""
    start = tail.find("(")
    if start < 0:
        return []
    end = tail.find(")", start + 1)
    if end < 0 or end - start > limit:
        return []
    names = []
    for t in tail[start + 1 : end].split(","):
        t = t.strip()
        if t.startswith("%"):
            t = t[1:]
        # operand tokens are bare instruction names; anything with spaces
        # or braces is a literal/attribute, not an operand list
        if t and all(c.isalnum() or c in "._-" for c in t):
            names.append(t)
        else:
            return []
    return names

_ITEM = {"bf16": 2, "f16": 2, "f32": 4, "s32": 4, "u32": 4, "s8": 1,
         "u8": 1, "pred": 1, "s64": 8, "f64": 8}


def _shape_bytes(type_str):
    """Total bytes of all array literals in an HLO type string (handles
    tuples by summing every element)."""
    total = 0
    for m in _SHAPE.finditer(type_str):
        dt, dims = m.group(1), m.group(2)
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _ITEM[dt]
    return total


def parse_hlo(text):
    """name -> {out_bytes, operands[list of names], src, op_name}."""
    ops = {}
    for line in text.splitlines():
        m = _DEF.match(line)
        if not m:
            continue
        name, _tup, type_str, kind = m.groups()
        rec = {"out_bytes": _shape_bytes(type_str), "kind": kind,
               "operands": [], "src": None, "op_name": None}
        # operand list: first parenthesized group AFTER the op kind
        tail = line[m.end():]
        if kind != "constant":
            rec["operands"] = _operand_names(tail)
        mm = _META.search(line)
        if mm:
            rec["op_name"] = mm.group(1)
            rec["src"] = f"{os.path.basename(mm.group(2))}:{mm.group(3)}"
        ops[name] = rec
    return ops


def trace_durations(logdir):
    """instruction name -> total device self-time us over the trace."""
    paths = glob.glob(
        os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True
    )
    if not paths:
        return {}
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
    cont = re.compile(r"^(\d+|jit_.*|.*\(\d+\))$")
    agg = defaultdict(float)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        if cont.match(name):
            continue
        agg[name] += float(e.get("dur", 0.0))
    return dict(agg)


def build_step(config):
    import numpy as np

    import bench
    from hydragnn_tpu.models.create import create_model
    from hydragnn_tpu.train.loop import Trainer

    mlip = None
    if config == "pna":
        cfg = bench._mk_cfg(
            "PNA", 256, 6,
            pna_deg=tuple(np.bincount(np.full(16384, 16)).tolist()),
        )
        model = create_model("PNA", cfg)
    elif config == "mace":
        cfg = bench._mk_cfg(
            "MACE", 128, 2,
            max_ell=2, node_max_ell=1, num_radial=8, correlation=(2,),
            avg_num_neighbors=16.0, radius=4.0,
        )
        model = create_model("MACE", cfg)
    elif config == "gat":
        cfg = bench._mk_cfg("GAT", 256, 4)
        model = create_model("GAT", cfg)
    elif config in ("gps", "performer"):
        cfg = bench._mk_cfg(
            "GIN", 256, 4,
            global_attn_engine="GPS",
            global_attn_type="multihead" if config == "gps" else "performer",
            global_attn_heads=8, pe_dim=2,
        )
        model = create_model("GIN", cfg)
    else:  # egnn_force
        cfg = bench._mk_cfg(
            "EGNN", 256, 4,
            output_dim=(1,), output_type=("node",),
            head_levels=("node",), task_weights=(1.0,),
            equivariance=True, max_ell=1, node_max_ell=1, num_radial=8,
            radius=4.0, avg_num_neighbors=16.0,
        )
        model = create_model("EGNN", cfg)
        mlip = {"energy_weight": 1.0, "energy_peratom_weight": 1.0,
                "force_weight": 25.0}
    trainer = Trainer(
        model, {"type": "AdamW", "learning_rate": 1e-3},
        mlip=mlip, precision="bf16",
    )
    return trainer, cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", choices=["pna", "mace", "gps", "performer",
                                       "egnn_force", "gat"])
    ap.add_argument("--out", default=None)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--pct-floor", type=float, default=0.2)
    args = ap.parse_args()

    import jax

    import bench

    batch = jax.device_put(
        bench.build_bench_batch(with_pe=args.config in ("gps", "performer"))
    )
    trainer, _cfg = build_step(args.config)
    state = trainer.init_state(batch)
    compiled = trainer.train_step.lower(state, batch).compile()
    hlo_ops = parse_hlo(compiled.as_text())

    s2, loss, _ = compiled(state, batch)
    _ = float(loss)
    logdir = tempfile.mkdtemp(prefix=f"bytes_{args.config}_")
    with jax.profiler.trace(logdir):
        for _ in range(args.iters):
            s2, loss, _ = compiled(state, batch)
        _ = float(loss)
    durs = trace_durations(logdir)
    total = sum(durs.values())

    rows = []
    by_src = defaultdict(lambda: [0.0, 0])
    for name, us in durs.items():
        rec = hlo_ops.get(name)
        out_b = rec["out_bytes"] if rec else 0
        opnd_b = 0
        if rec:
            for o in rec["operands"]:
                r2 = hlo_ops.get(o)
                if r2:
                    opnd_b += r2["out_bytes"]
        touched = out_b + opnd_b
        us_iter = us / args.iters
        row = {
            "name": name, "us": round(us_iter, 1),
            "pct": round(100 * us / total, 2),
            "mb_touched": round(touched / 1e6, 1),
            "gbps": round(touched / max(us_iter, 1e-9) / 1e3, 1),
            "src": (rec or {}).get("src"),
            "op": ((rec or {}).get("op_name") or "")[-120:],
        }
        rows.append(row)
        key = row["src"] or ("<" + (rec or {}).get("kind", "unknown") + ">")
        by_src[key][0] += us_iter
        by_src[key][1] += touched
    rows.sort(key=lambda r: -r["us"])
    rows = [r for r in rows if r["pct"] >= args.pct_floor]

    src_rows = sorted(
        (
            {"src": k, "us": round(v[0], 1),
             "pct": round(100 * v[0] * args.iters / total, 2),
             "mb_touched": round(v[1] / 1e6 / args.iters, 1)}
            for k, v in by_src.items()
        ),
        key=lambda r: -r["us"],
    )[:40]

    # the compulsory anchor
    n_params = bench._param_count(state)
    hidden, layers = {"pna": (256, 6), "mace": (128, 2), "gps": (256, 4),
                      "performer": (256, 4), "egnn_force": (256, 4),
                      "gat": (256, 4)}[args.config]
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    bytes_min, flops_min = bench.analytic_floor(
        batch, n_params, hidden, layers, float(ca.get("flops", 0.0))
    )

    out = {
        "config": args.config,
        "iters": args.iters,
        "total_busy_us_per_iter": round(total / args.iters, 1),
        "bytes_min_gb": round(bytes_min / 1e9, 3),
        "sum_mb_touched_per_iter": round(
            sum(r["mb_touched"] for r in src_rows), 1
        ),
        "top_ops": rows[:60],
        "by_source_line": src_rows,
    }
    path = args.out or f"profiling/BYTES_{args.config}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(src_rows[:20], indent=1))
    print(f"written {path}")


if __name__ == "__main__":
    main()
