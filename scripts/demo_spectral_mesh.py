#!/usr/bin/env python
"""SpectralUNET paper-protocol training step on a virtual multi-chip mesh.

The reference's one configuration that does not fit a single accelerator:
SpectralUNET (bn_feats=1650, ~30.4M params), batch 2, 608x700 crops — it
needed DeepSpeed ZeRO-2 over >=2 GPUs (/root/reference/README.md:67-68,
MODEL_SHARD=True). The TPU-native answer is remat + spatial sharding of the
pixel axis + ZeRO-sharded Adam moments over a ('data','spatial') mesh.

This script executes ONE jitted train step at the exact paper *shape*
(N=2, H=608, W=700, D=238, bf16, remat, ZeRO) on an 8-virtual-device CPU
mesh. Width is scaled by --bn-feats (default 128) because this dev host has
ONE CPU core — full width is ~1.5e14 FLOP per step; the dataflow, shardings,
and memory behavior are width-independent. It also AOT-compiles the
FULL-width (1650) step on the same mesh and prints XLA's per-device memory
analysis next to the single-device equivalent.

Memory math at full width (fp32 -> bf16), batch 2 @ 608x700:
  pixel rows R = 2*608*700 = 851,200
  one block activation = R x 1650 x 2 B (bf16)  = 2.81 GB
  11 blocks saved without remat ~= 31 GB  -> does not fit 16 GB HBM
  with remat: ~10 block inputs still saved     -> ~28 GB, still too big
  + spatial sharding over 4: 7.0 GB/device     -> fits with headroom
i.e. the paper protocol needs BOTH remat and the mesh, which is what
model_parallel=True configures (trainer.train_net).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bn-feats", type=int, default=128)
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--width", type=int, default=700)
    p.add_argument("--height", type=int, default=608)
    p.add_argument("--full-compile", action="store_true",
                   help="also AOT-compile the full bn_feats=1650 step and print memory analysis")
    args = p.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    if "--xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"  # also gates the compile cache off
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from hyperpri_tpu.models import SpectralUNET
    from hyperpri_tpu.parallel.mesh import batch_sharding, make_mesh, sample_sharding
    from hyperpri_tpu.parallel.sharding import replicated_like, zero_opt_state_shardings
    from hyperpri_tpu.train.trainer import make_train_step

    data, spatial = 2, args.devices // 2
    mesh = make_mesh({"data": data, "spatial": spatial})
    N, H, W, D = 2, args.height, args.width, 238
    print(f"mesh=(data={data}, spatial={spatial})  shape=({N},{H},{W},{D})  "
          f"bn_feats={args.bn_feats}  dtype=bf16 remat=True zero_shard=True")

    def build(feats):
        model = SpectralUNET(hsi_depth=D, n_classes=1, bn_feats=feats,
                             remat=True, dtype=jnp.bfloat16)
        import optax

        tx = optax.adam(1e-3)
        small = jnp.zeros((1, 16, 16, D), jnp.bfloat16)
        variables = jax.jit(lambda: model.init(jax.random.key(0), small, train=False))()
        from hyperpri_tpu.train.trainer import TrainState

        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(variables["params"]), apply_fn=model.apply, tx=tx,
        )
        return model, state

    def shardings_for(state):
        rep = replicated_like(
            {"step": state.step, "params": state.params, "batch_stats": state.batch_stats}, mesh
        )
        opt = zero_opt_state_shardings(state.opt_state, mesh)
        return state.replace(
            step=rep["step"], params=rep["params"], batch_stats=rep["batch_stats"], opt_state=opt
        )

    from jax.sharding import NamedSharding, PartitionSpec as P

    bsh = batch_sharding(mesh, spatial=True)
    batch_sh = {"image": bsh, "mask": bsh, "valid": sample_sharding(mesh)}
    grad_sh = NamedSharding(mesh, P())

    # ---- scaled-width EXECUTED step -------------------------------------
    model, state = build(args.bn_feats)
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(state.params))
    print(f"scaled model params: {n_params:,}")
    state_sh = shardings_for(state)
    state = jax.tree.map(lambda x, s: jax.device_put(x, s), state, state_sh)
    step = jax.jit(
        make_train_step(0.5, grad_sharding=grad_sh),
        in_shardings=(state_sh, batch_sh),
        out_shardings=(state_sh, None),
        donate_argnums=0,
    )
    rng = np.random.default_rng(0)
    batch = {
        "image": jax.device_put(rng.normal(size=(N, H, W, D)).astype(np.float32), bsh),
        "mask": jax.device_put((rng.uniform(size=(N, H, W, 1)) < 0.3).astype(np.float32), bsh),
        "valid": jax.device_put(np.ones((N,), np.float32), sample_sharding(mesh)),
    }
    t0 = time.time()
    state, logs = step(state, batch)
    loss = float(logs["loss_sum"]) / float(logs["n"])
    print(f"one sharded train step executed in {time.time()-t0:.1f}s "
          f"(incl. compile), loss={loss:.4f}")
    img_shard = batch["image"].sharding
    print(f"image sharding: {img_shard.spec}, "
          f"addressable shard shape: {batch['image'].addressable_shards[0].data.shape}")

    # ---- full-width AOT compile + memory analysis ------------------------
    if args.full_compile:
        model_f, state_f = build(1650)
        n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(state_f.params))
        print(f"\nfull model params: {n_params:,} (paper: 30,388,051)")
        state_fsh = shardings_for(state_f)
        step_f = jax.jit(
            make_train_step(0.5, grad_sharding=grad_sh),
            in_shardings=(state_fsh, batch_sh),
            out_shardings=(state_fsh, None),
            donate_argnums=0,
        )
        shapes = {
            "image": jax.ShapeDtypeStruct((N, H, W, D), np.float32, sharding=bsh),
            "mask": jax.ShapeDtypeStruct((N, H, W, 1), np.float32, sharding=bsh),
            "valid": jax.ShapeDtypeStruct((N,), np.float32, sharding=sample_sharding(mesh)),
        }
        t0 = time.time()
        compiled = step_f.lower(state_f, shapes).compile()
        print(f"full-width step compiled for the mesh in {time.time()-t0:.1f}s")
        ma = compiled.memory_analysis()
        gb = 1 << 30
        if ma is not None:
            print(f"per-device memory (mesh): args {ma.argument_size_in_bytes/gb:.2f} GiB, "
                  f"temps {ma.temp_size_in_bytes/gb:.2f} GiB, "
                  f"output {ma.output_size_in_bytes/gb:.2f} GiB")

        # single-device equivalent for the ratio (the configuration the
        # reference could not run on one GPU)
        step_1 = jax.jit(make_train_step(0.5), donate_argnums=0)
        shapes_1 = {
            "image": jax.ShapeDtypeStruct((N, H, W, D), np.float32),
            "mask": jax.ShapeDtypeStruct((N, H, W, 1), np.float32),
            "valid": jax.ShapeDtypeStruct((N,), np.float32),
        }
        ma1 = step_1.lower(state_f, shapes_1).compile().memory_analysis()
        if ma1 is not None and ma is not None:
            print(f"single-device equivalent temps: {ma1.temp_size_in_bytes/gb:.2f} GiB "
                  f"(sharding ratio {ma1.temp_size_in_bytes/max(ma.temp_size_in_bytes,1):.1f}x)")


if __name__ == "__main__":
    main()
