"""Headline benchmark: CubeNET-64 full-resolution HSI inference throughput.

Protocol mirrors the reference's inference benchmark
(/root/reference/test_models.ipynb cells 10-11): batch 1, full 608x968x238
cube, forward only, mean of 5 timed runs — but on TPU with bf16 compute and
a jitted graph (the reference protocol runs torch on CPU).

Baseline: the same architecture executed through torch (CPU, fp32, no_grad)
with this machine's CPU — the reference's own protocol hardware. The torch
measurement is cached in baseline_torch_cpu.json after the first run.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "cubes/sec", "vs_baseline": N}
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

H, W, D, FD = 608, 968, 238, 64
BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "baseline_torch_cpu.json")


def measure_rtt(n: int = 20) -> float:
    """Measured dispatch+fetch round-trip of a null program.

    Timing protocol subtracts this from each measured wall time; measuring it
    (rather than assuming the ~29 ms of this tunneled platform) keeps the
    benchmark honest on direct-attached hosts where RTT is microseconds.
    """
    import jax
    import jax.numpy as jnp

    null = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros(())
    float(null(x))  # compile
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(null(x))
        times.append(time.perf_counter() - t0)
    return min(times)


def measure_tpu(k_lo: int = 10, k_hi: int = 30, n_runs: int = 3) -> float:
    """Amortized throughput: K forwards inside one scanned dispatch.

    Per-call host<->device round-trips (~29 ms on a tunneled platform, where
    block_until_ready is not a reliable barrier) would otherwise dominate the
    ~17 ms compute; each scan iteration regenerates its input from a fresh
    RNG key so XLA cannot hoist or CSE the model application.

    Dispatch overhead is cancelled with a two-point protocol: time K_lo- and
    K_hi-iteration dispatches and take (t_hi - t_lo) / (k_hi - k_lo). A
    measured null RTT is only a cross-check — subtracting it directly can go
    NEGATIVE when host load inflates the RTT probe more than the timed runs
    (observed: 200 ms probe vs ~29 ms steady-state on the tunneled platform).
    """
    import jax
    import jax.numpy as jnp

    from hyperpri_tpu.models import CubeNET

    rtt = measure_rtt()
    print(f"measured null-dispatch RTT: {rtt*1e3:.1f} ms", file=sys.stderr)

    # Serving graph selection (HYPERPRI_BENCH_MODE):
    #   xla   (default): the plain pure-XLA eval graph — fastest measured
    #          (79.5 cubes/s under the r5 AUTO-layout staging; XLA's
    #          pure-forward conv+BN+ReLU fusion).
    #   fold_xla: BatchNorm folded into conv weights (ops/fold_bn.py) — a
    #          numerically identical serving graph; measures 78.6 under the
    #          r5 staged protocol vs 78.6-79.5 xla (folding alone buys
    #          nothing: XLA already fuses eval BN into the conv fusions).
    #   fold  : folded BN + tap-packed Pallas kernels at the per-op winning
    #          shapes — measures 38.7: the kernels win in isolation (7.2 vs
    #          10.9 ms on the first conv) but lose in-graph (composition
    #          costs under investigation; see BENCHMARKS.md).
    #   pallas: unfolded BN, packed Pallas convs at the winning shapes.
    mode = os.environ.get("HYPERPRI_BENCH_MODE", "xla")
    model = CubeNET(hsi_depth=D, n_classes=1, first_depth=FD, bilinear=False,
                    pallas_train=(mode == "pallas"), dtype=jnp.bfloat16)
    rng = jax.random.key(0)
    # Params are spatial-size independent: init jitted at 64x64, run at full
    # res. Input cubes are generated on device — no half-GB host uploads.
    small = jnp.zeros((1, 64, 64, D), jnp.bfloat16)
    variables = jax.jit(lambda r, s: model.init(r, s, train=False))(rng, small)
    if mode.startswith("fold"):
        from hyperpri_tpu.ops.fold_bn import fold_batch_norm

        folded = fold_batch_norm(variables["params"], variables["batch_stats"])
        model = CubeNET(hsi_depth=D, n_classes=1, first_depth=FD, bilinear=False,
                        fused_bn=True, use_pallas=(mode == "fold"), dtype=jnp.bfloat16)
        variables = {"params": folded}

    # Inputs are PRE-STAGED on device, outside the timed region — matching
    # the reference protocol, which times net(x) on an already-built tensor
    # (test_models.ipynb cell 11). Generating a fresh cube per iteration
    # inside the timed scan (the previous protocol) measured 4.71 ms/step of
    # pure RNG fusion in the serving trace — 29% of the headline was input
    # synthesis, not the model. Cycling a pool of distinct staged cubes by
    # dynamic index still defeats CSE/hoisting (the applied input differs
    # every iteration and is not loop-invariant).
    n_staged = 8
    xs = jax.random.normal(rng, (n_staged, H, W, D), jnp.bfloat16)

    # AUTO entry layouts (r5): let XLA choose the on-device layout of the
    # staged pool and the params, then RE-STAGE both in exactly those
    # formats outside the timed region. Without this the timed graph pays a
    # ~4.7 ms relayout of every applied cube (trace: bf16[608,1,968,238]
    # {0,3,2,1} copy at 55 GiB/s) — pure input formatting the reference
    # protocol never times (its `net(x)` consumes an already-contiguous
    # tensor, test_models.ipynb cell 11).
    from jax.experimental.layout import Format, Layout

    def make_forward(k_inner):
        @functools.partial(jax.jit, in_shardings=Format(Layout.AUTO))
        def forward_k(variables, xs, start):
            def body(carry, k):
                # keepdims: the indexed dim becomes the batch-1 dim
                x = jax.lax.dynamic_index_in_dim(xs, (start + k) % n_staged, 0)
                y = model.apply(variables, x, train=False)
                # consume EVERY logit (defeats DCE) but squeeze the size-1
                # channel first: reducing the raw (1,H,W,1) tensor runs at
                # 100 GiB/s in its pathological T(2,128) single-channel
                # layout (0.71 ms/cube traced) vs a plain 2-D-tiled reduce.
                return carry + jnp.sum(y[..., 0].astype(jnp.float32)), None

            acc, _ = jax.lax.scan(body, 0.0, jnp.arange(k_inner))
            return acc

        return forward_k

    f_lo, f_hi = make_forward(k_lo), make_forward(k_hi)
    # AUTO-layout jits are lowered on avals and invoked as compiled
    # executables; the pool/params are then RE-STAGED in the chosen formats
    # (all outside the timed region). Shared helper: utils/staging.py —
    # scripts/trace_infer.py uses the same protocol so the trace and the
    # headline measure the same graph.
    from hyperpri_tpu.utils.staging import compile_with_auto_formats, stage_in_formats

    start0 = jnp.zeros((), jnp.int32)
    c_hi, fmt_hi = compile_with_auto_formats(f_hi, variables, xs, start0)
    c_lo, fmt_lo = compile_with_auto_formats(f_lo, variables, xs, start0)
    variables, xs, _ = stage_in_formats((variables, xs, start0), fmt_hi)
    if str(fmt_lo[:2]) == str(fmt_hi[:2]):
        vars_lo, xs_lo = variables, xs
    else:  # same model/graph shape normally agree; stage separately if not
        print("note: k_lo chose different entry layouts; staging both",
              file=sys.stderr)
        vars_lo, xs_lo, _ = stage_in_formats(
            (jax.device_get(variables), jax.device_get(xs), start0), fmt_lo
        )

    def run_lo(i):
        return c_lo(vars_lo, xs_lo, jnp.asarray(i, jnp.int32))

    def run_hi(i):
        return c_hi(variables, xs, jnp.asarray(i, jnp.int32))

    float(run_lo(0))  # warm (fetch forces completion)
    float(run_hi(0))

    def timed(fn, n):
        times = []
        for i in range(n):
            t0 = time.perf_counter()
            float(fn(i))
            times.append(time.perf_counter() - t0)
        return min(times)

    t_lo, t_hi = timed(run_lo, n_runs), timed(run_hi, n_runs)
    per_cube = (t_hi - t_lo) / (k_hi - k_lo)
    if per_cube <= 0:  # pathological host-load noise: fall back conservatively
        per_cube = max(t_hi - rtt, 0.0) / k_hi or t_hi / k_hi
    return 1.0 / per_cube


def torch_cubenet():
    """Architecture-equivalent CubeNET-64 in torch for the CPU baseline
    (built from the layer spec in SURVEY.md §2; no reference code)."""
    import torch
    import torch.nn as nn

    def double_conv(cin, cout):
        return nn.Sequential(
            nn.Conv2d(cin, cout, 3, padding=1), nn.BatchNorm2d(cout), nn.ReLU(True),
            nn.Conv2d(cout, cout, 3, padding=1), nn.BatchNorm2d(cout), nn.ReLU(True),
        )

    class TorchCube(nn.Module):
        def __init__(self):
            super().__init__()
            C = 128
            self.inc = nn.Sequential(
                nn.Conv3d(1, FD, (D, 3, 3), padding=(0, 1, 1)), nn.BatchNorm3d(FD), nn.ReLU(True)
            )
            self.inc2 = nn.Sequential(
                nn.Conv2d(FD, FD, 3, padding=1), nn.BatchNorm2d(FD), nn.ReLU(True)
            )
            self.downs = nn.ModuleList(
                [double_conv(cin, cout) for cin, cout in [(FD, C), (C, 2 * C), (2 * C, 4 * C), (4 * C, 8 * C)]]
            )
            self.ups = nn.ModuleList(
                [nn.ConvTranspose2d(cin, cin // 2, 2, 2) for cin in [8 * C, 4 * C, 2 * C, C]]
            )
            self.upconvs = nn.ModuleList(
                [double_conv(cin, cout) for cin, cout in [(8 * C, 4 * C), (4 * C, 2 * C), (2 * C, C), (C, 64)]]
            )
            self.outc = nn.Conv2d(64, 1, 1)
            self.pool = nn.MaxPool2d(2)

        def forward(self, x):
            import torch
            import torch.nn.functional as F

            x1 = self.inc(x).squeeze(2)
            x1 = self.inc2(x1)
            skips = [x1]
            h = x1
            for dc in self.downs:
                h = dc(self.pool(h))
                skips.append(h)
            for i, (up, uc) in enumerate(zip(self.ups, self.upconvs)):
                h = up(h)
                skip = skips[-2 - i]
                dy, dx = skip.shape[2] - h.shape[2], skip.shape[3] - h.shape[3]
                h = F.pad(h, [dx // 2, dx - dx // 2, dy // 2, dy - dy // 2])
                h = uc(torch.cat([skip, h], 1))
            return self.outc(h)

    return TorchCube()


def measure_torch_cpu(n_runs: int = 2) -> float:
    import torch

    model = torch_cubenet().eval()
    x = torch.randn(1, 1, D, H, W)
    with torch.no_grad():
        model(x)  # warmup
        times = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            model(x)
            times.append(time.perf_counter() - t0)
    return 1.0 / (sum(times) / len(times))


def get_baseline() -> float:
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)["cubes_per_sec"]
    try:
        cps = measure_torch_cpu()
        with open(BASELINE_CACHE, "w") as f:
            json.dump(
                {
                    "cubes_per_sec": cps,
                    "protocol": "torch CPU fp32 no_grad batch=1 CubeNET-64 608x968x238 "
                    "(reference test_models.ipynb cell 11 protocol)",
                },
                f,
                indent=2,
            )
        return cps
    except Exception as e:  # baseline failure must not sink the benchmark
        print(f"baseline measurement failed: {e}", file=sys.stderr)
        return 0.0


def main():
    value = measure_tpu()
    baseline = get_baseline()
    result = {
        "metric": "CubeNET-64 HSI inference throughput (608x968x238, batch 1, bf16, TPU)",
        "value": round(value, 4),
        "unit": "cubes/sec",
        "vs_baseline": round(value / baseline, 2) if baseline > 0 else 0.0,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
