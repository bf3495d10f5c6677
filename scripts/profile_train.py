#!/usr/bin/env python
"""Bisection profiler for the CubeNET train step (VERDICT r1 item 3).

Times progressively larger slices of the training step on the real chip so
the cost of each stage (fwd, bwd, optimizer, metrics, input cast) is isolated
without needing a trace viewer. Each slice runs K times inside one jitted
lax.scan so dispatch RTT amortizes away; RTT itself is measured with a null
dispatch (same protocol as bench.py).

Usage: python scripts/profile_train.py [--batch 2] [--steps 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(fn, *args, reps=3):
    # fetch the scalar result: block_until_ready is not a reliable barrier
    # on the tunneled dev platform (see bench.py)
    float(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--height", type=int, default=608)
    p.add_argument("--width", type=int, default=968)
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--in-dtype", default="f32", choices=["f32", "bf16"])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from hyperpri_tpu.config import ExpHyperspectralPRI
    from hyperpri_tpu.train.trainer import create_train_state, make_train_step, masked_bce

    cfg = ExpHyperspectralPRI(calling_path=".")
    cfg.model_name = "CubeNET"
    cfg.precision = "bf16"
    channels = cfg.channels
    model = cfg.get_network()
    state = create_train_state(cfg, model, np.zeros((1, 64, 64, channels), np.float32), seed=0)
    train_step = make_train_step(cfg.threshold)

    K = args.steps
    b, h, w = args.batch, args.height, args.width
    in_dt = jnp.float32 if args.in_dtype == "f32" else jnp.bfloat16

    def batch_from(k):
        image = jax.random.normal(k, (b, h, w, channels), jnp.float32).astype(in_dt)
        mask = (jax.random.uniform(k, (b, h, w, 1)) < 0.3).astype(jnp.float32)
        return {"image": image, "mask": mask, "valid": jnp.ones((b,))}

    def scanned(body):
        @jax.jit
        def run(state, key):
            def step(carry, k):
                st, acc = carry
                st, out = body(st, batch_from(k))
                # accumulate so no per-step work is dead code
                return (st, acc + out.astype(jnp.float32)), None
            (state2, acc), _ = jax.lax.scan(
                step, (state, jnp.zeros(())), jax.random.split(key, K)
            )
            return acc
        return run

    # RTT: null dispatch
    @jax.jit
    def null(x):
        return x + 1.0

    rtt = measure(null, jnp.zeros(()))

    results = {}

    # 0. data generation only (RNG + cast): subtract from everything else
    def gen_only(st, batch):
        return st, (
            jnp.sum(batch["image"].astype(jnp.float32)) + jnp.sum(batch["mask"])
        )

    # 1. forward only (train=True, mutable stats, loss)
    def fwd_only(st, batch):
        logits, updates = st.apply_fn(
            {"params": st.params, "batch_stats": st.batch_stats},
            batch["image"], train=True, mutable=["batch_stats"],
        )
        loss = masked_bce(logits, batch["mask"], batch["valid"])
        return st.replace(batch_stats=updates["batch_stats"]), loss

    # 2. forward + backward (no update, no metrics)
    def fwd_bwd(st, batch):
        def loss_fn(params):
            logits, updates = st.apply_fn(
                {"params": params, "batch_stats": st.batch_stats},
                batch["image"], train=True, mutable=["batch_stats"],
            )
            return masked_bce(logits, batch["mask"], batch["valid"]), updates["batch_stats"]
        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(st.params)
        gsum = sum(jnp.sum(leaf.astype(jnp.float32)) for leaf in jax.tree.leaves(grads))
        return st.replace(batch_stats=stats), loss + gsum * 1e-30

    # 3. forward + backward + adam (no metrics)
    def fwd_bwd_opt(st, batch):
        def loss_fn(params):
            logits, updates = st.apply_fn(
                {"params": params, "batch_stats": st.batch_stats},
                batch["image"], train=True, mutable=["batch_stats"],
            )
            return masked_bce(logits, batch["mask"], batch["valid"]), updates["batch_stats"]
        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(st.params)
        return st.apply_gradients(grads=grads, batch_stats=stats), loss

    # 4. full production step
    def full(st, batch):
        st, logs = train_step(st, batch)
        return st, logs["loss_sum"]

    for name, body in [
        ("gen_only", gen_only),
        ("fwd_only", fwd_only),
        ("fwd_bwd", fwd_bwd),
        ("fwd_bwd_opt", fwd_bwd_opt),
        ("full_step", full),
    ]:
        run = scanned(body)
        t0 = time.time()
        float(run(state, jax.random.key(0)))
        compile_s = time.time() - t0
        t = measure(run, state, jax.random.key(1))
        per = (t - rtt) / K * 1e3
        results[name] = per
        print(f"{name:14s}  {per:8.2f} ms/step   (compile {compile_s:.0f}s)", flush=True)

    gen = results["gen_only"]
    print(f"\nrtt={rtt*1e3:.1f}ms  gen={gen:.2f}ms")
    print(f"fwd      : {results['fwd_only'] - gen:8.2f} ms")
    print(f"bwd      : {results['fwd_bwd'] - results['fwd_only']:8.2f} ms")
    print(f"adam     : {results['fwd_bwd_opt'] - results['fwd_bwd']:8.2f} ms")
    print(f"metrics  : {results['full_step'] - results['fwd_bwd_opt']:8.2f} ms")
    print(f"total    : {results['full_step'] - gen:8.2f} ms (ex datagen)")


if __name__ == "__main__":
    main()
