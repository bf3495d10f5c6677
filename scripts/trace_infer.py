#!/usr/bin/env python
"""Per-HLO device-time table of the SERVING graph in each bench.py mode
(xla | fold | fold_xla | pallas). Diagnoses composition effects around the
Pallas calls (pad/slice glue, lost fusions) that per-op microbenchmarks
cannot see.

Usage: python scripts/trace_infer.py [--mode fold] [--steps 4] [--top 30]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def print_hlo_table(xspaces, steps, top, out=None):
    from xprof.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(xspaces, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode("utf-8", errors="replace")
    if out:
        with open(out, "w") as f:
            f.write(data)
    rows = []
    try:
        obj = json.loads(data)
        cols = [c["label"] for c in obj["cols"]]
        for r in obj["rows"]:
            rows.append({c: (v or {}).get("v") for c, v in zip(cols, r["c"])})
    except Exception:
        import csv as _csv
        import io

        rows = list(_csv.DictReader(io.StringIO(data)))
    if not rows:
        print(data[:2000])
        return
    keys = rows[0].keys()
    time_key = next((k for k in keys if "total time" in k.lower()
                     or "self time (us)" in k.lower()), None)
    if time_key is None:
        time_key = next((k for k in keys if "time" in k.lower() and "%" not in k), list(keys)[0])
    name_key = next((k for k in keys if "expression" in k.lower() or "hlo" in k.lower()
                     or "name" in k.lower()), list(keys)[0])
    cat_key = next((k for k in keys if "category" in k.lower()), None)

    def tval(r):
        try:
            return float(r[time_key])
        except (TypeError, ValueError):
            return 0.0

    rows.sort(key=tval, reverse=True)
    total = sum(tval(r) for r in rows)
    print(f"TOTAL {time_key}: {total/steps:.0f} us/step over {steps} steps")
    for r in rows[:top]:
        cat = (r.get(cat_key) or "")[:18] if cat_key else ""
        name = str(r.get(name_key))[:110]
        print(f"{tval(r)/steps:10.1f} us  {cat:18s} {name}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", default="fold")
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    os.environ["HYPERPRI_BENCH_MODE"] = args.mode
    import jax
    import jax.numpy as jnp

    from hyperpri_tpu.models import CubeNET
    from bench import D, FD, H, W

    mode = args.mode
    model = CubeNET(hsi_depth=D, n_classes=1, first_depth=FD, bilinear=False,
                    pallas_train=(mode == "pallas"), dtype=jnp.bfloat16)
    rng = jax.random.key(0)
    small = jnp.zeros((1, 64, 64, D), jnp.bfloat16)
    variables = jax.jit(lambda r, s: model.init(r, s, train=False))(rng, small)
    if mode.startswith("fold"):
        from hyperpri_tpu.ops.fold_bn import fold_batch_norm

        folded = fold_batch_norm(variables["params"], variables["batch_stats"])
        model = CubeNET(hsi_depth=D, n_classes=1, first_depth=FD, bilinear=False,
                        fused_bn=True, use_pallas=(mode == "fold"), dtype=jnp.bfloat16)
        variables = {"params": folded}

    # bench.py's r5 protocol: pre-staged cube pool in AUTO entry layouts
    # (the old in-graph jax.random.normal synthesis showed up as a 4.7 ms
    # [608,1,968,238] RNG+relayout fusion — 29% of the trace was harness).
    import functools

    from jax.experimental.layout import Format, Layout

    n_staged = 8
    xs = jax.random.normal(rng, (n_staged, H, W, D), jnp.bfloat16)

    @functools.partial(jax.jit, in_shardings=Format(Layout.AUTO))
    def run(variables, xs, start):
        def body(carry, k):
            x = jax.lax.dynamic_index_in_dim(xs, (start + k) % n_staged, 0)
            y = model.apply(variables, x, train=False)
            # keep in lockstep with bench.py's body: squeeze the size-1
            # channel before reducing (the raw (1,H,W,1) reduce runs at a
            # pathological 100 GiB/s and would pollute the roofline table)
            return carry + jnp.sum(y[..., 0].astype(jnp.float32)), None

        acc, _ = jax.lax.scan(body, 0.0, jnp.arange(args.steps))
        return acc

    from hyperpri_tpu.utils.staging import compile_with_auto_formats, stage_in_formats

    start0 = jnp.zeros((), jnp.int32)
    compiled, fmts = compile_with_auto_formats(run, variables, xs, start0)
    variables, xs, start0 = stage_in_formats((variables, xs, start0), fmts)
    float(compiled(variables, xs, start0))  # warm
    tdir = tempfile.mkdtemp(prefix="jaxtrace_")
    jax.profiler.start_trace(tdir)
    float(compiled(variables, xs, start0))
    jax.profiler.stop_trace()
    xspaces = glob.glob(os.path.join(tdir, "**", "*.xplane.pb"), recursive=True)
    print_hlo_table(xspaces, args.steps, args.top, args.out)


if __name__ == "__main__":
    main()
