#!/usr/bin/env python
"""Capture a jax.profiler trace of the CubeNET train step and print the
per-HLO-op device-time table (top N) via xprof's hlo_stats converter.

This is the ground-truth view of where the 167 ms step goes — the op-level
microbenchmarks (profile_ops.py) can't see composition effects (fusion
boundaries, layout transposes between ops).

Usage: python scripts/trace_train.py [--steps 4] [--top 40] [--infer]
"""

from __future__ import annotations

import argparse
import functools
import glob
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--model", default="CubeNET", choices=["CubeNET", "SpectralUNET"])
    p.add_argument("--chunks", type=int, default=0,
                   help="SpectralUNET: trace the chunked grad-accum step "
                        "(train/chunked.py) at 608x700 instead of the plain one")
    p.add_argument("--infer", action="store_true", help="trace inference instead")
    p.add_argument("--pallas-train", action=argparse.BooleanOptionalAction, default=None)
    p.add_argument("--out", default=None, help="save full hlo_stats CSV here")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from hyperpri_tpu.config import ExpHyperspectralPRI
    from hyperpri_tpu.train.trainer import create_train_state, make_train_step

    cfg = ExpHyperspectralPRI(calling_path=".")
    cfg.model_name = args.model
    cfg.precision = "bf16"
    if args.pallas_train is not None:
        cfg.pallas_train = args.pallas_train
    if args.model == "SpectralUNET":
        cfg.remat = args.chunks == 0  # chunking replaces remat (BENCHMARKS.md)
    channels = cfg.channels
    model = cfg.get_network()
    state = create_train_state(cfg, model, np.zeros((1, 64, 64, channels), np.float32), seed=0)

    b, h, w = args.batch, 608, 968 if args.model == "CubeNET" else 700
    K = args.steps

    # Host pre-padded ingest when the route supports it (production trainer
    # wiring; see scripts/bench_train.py) — trace the graph users actually run.
    ingest_spec = None
    if not args.infer and args.model == "CubeNET":
        from hyperpri_tpu.models.parts import first_conv_ingest_spec

        ingest_spec = first_conv_ingest_spec(
            h, w, channels, cfg.cube_featmaps, cfg.compute_dtype,
            pallas_train=cfg.pallas_train, train=True, spatial_mesh=None,
        )
    apply_fn = model.clone(ingest_hw=(h, w)).apply if ingest_spec is not None else None
    if args.chunks:
        from hyperpri_tpu.train.chunked import make_chunked_train_step

        train_step = make_chunked_train_step(cfg.threshold, n_chunks=args.chunks)
    else:
        train_step = make_train_step(cfg.threshold, apply_fn=apply_fn)

    # Same input staging as scripts/bench_train.py: a base batch staged
    # outside the step, varied per step by an in-place 8-row noise band
    # (a full-image scalar multiply costs 1.8 ms/step and pollutes the
    # trace; in-graph full-res RNG regeneration ~10 ms/step).
    base_key = jax.random.key(123)
    image_dt = jnp.bfloat16 if cfg.precision == "bf16" else jnp.float32
    base_image = jax.random.normal(base_key, (b, h, w, channels), jnp.float32).astype(image_dt)
    if ingest_spec is not None:
        (hp, wp, cp), (r0, c0) = ingest_spec[0], ingest_spec[1]
        base_image = jnp.zeros((b, hp, wp, cp), image_dt).at[
            :, r0 : r0 + h, c0 : c0 + w, :channels
        ].set(base_image)
    base_mask = (jax.random.uniform(base_key, (b, h, w, 1)) < 0.3).astype(jnp.float32)

    @jax.jit
    def run(state, base_image, base_mask, key):
        bands = jax.random.normal(key, (K, b, 8, w, channels), image_dt)

        def body(carry, band):
            st, image, acc = carry
            off = (0, 1, 1, 0) if ingest_spec is not None else (0, 0, 0, 0)
            image = jax.lax.dynamic_update_slice(image, band, off)
            batch = {"image": image, "mask": base_mask, "valid": jnp.ones((b,))}
            if args.infer:
                logits = st.apply_fn(
                    {"params": st.params, "batch_stats": st.batch_stats},
                    image.astype(jnp.bfloat16), train=False)
                return (st, image, acc + jnp.sum(logits * logits) * 1e-20), None
            st, logs = train_step(st, batch)
            return (st, image, acc + logs["loss_sum"]), None
        (state, _, acc), _ = jax.lax.scan(
            body, (state, base_image, jnp.zeros(())), bands
        )
        return acc

    run = functools.partial(run, base_image=base_image, base_mask=base_mask)
    run_ = run
    run = lambda st, key: run_(st, key=key)
    float(run(state, jax.random.key(0)))  # compile + warm

    tdir = tempfile.mkdtemp(prefix="jaxtrace_")
    jax.profiler.start_trace(tdir)
    float(run(state, jax.random.key(1)))
    jax.profiler.stop_trace()

    xspaces = glob.glob(os.path.join(tdir, "**", "*.xplane.pb"), recursive=True)
    print(f"trace: {xspaces}", file=sys.stderr)
    from xprof.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(xspaces, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode("utf-8", errors="replace")
    if args.out:
        with open(args.out, "w") as f:
            f.write(data)
        print(f"wrote {args.out}", file=sys.stderr)

    # hlo_stats is JSON (gviz) or CSV depending on version; handle both
    rows = []
    try:
        obj = json.loads(data)
        cols = [c["label"] for c in obj["cols"]]
        for r in obj["rows"]:
            rows.append({c: (v or {}).get("v") for c, v in zip(cols, r["c"])})
    except Exception:
        import csv as _csv
        import io
        rd = _csv.DictReader(io.StringIO(data))
        rows = list(rd)
    if not rows:
        print(data[:2000])
        return

    keys = rows[0].keys()
    time_key = next((k for k in keys if "total time" in k.lower() or "self time (us)" in k.lower()
                     or k.lower().startswith("total_time")), None)
    if time_key is None:
        time_key = next((k for k in keys if "time" in k.lower() and "%" not in k), list(keys)[0])
    name_key = next((k for k in keys if k.lower() in ("hlo op text", "hlo op expression")),
                    None) or next((k for k in keys if "expression" in k.lower()
                                   or "hlo op name" in k.lower() or "name" in k.lower()),
                                  list(keys)[0])
    cat_key = next((k for k in keys if "category" in k.lower()), None)

    def tval(r):
        try:
            return float(r[time_key])
        except (TypeError, ValueError):
            return 0.0

    rows.sort(key=tval, reverse=True)
    total = sum(tval(r) for r in rows)
    print(f"columns: {list(keys)}", file=sys.stderr)
    print(f"TOTAL {time_key}: {total/K:.0f} us/step over {K} steps")
    for r in rows[: args.top]:
        cat = (r.get(cat_key) or "")[:18] if cat_key else ""
        name = str(r.get(name_key))[:110]
        print(f"{tval(r)/K:10.1f} us  {cat:18s} {name}")


if __name__ == "__main__":
    main()
