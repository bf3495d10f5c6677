#!/usr/bin/env python
"""Hardware-validate the packed-kernel contract at ragged H (h % 8 != 0).

Every production HyperPRI shape has h % 8 == 0, so the ragged-H legs —
packed fwd stats masking, the bwd residual zero-pad fallback
(conv3x3_packed.py), and the wgrad's padded-g path — were validated in
interpret mode only (TODO.md quality note). This probe runs them on the real
chip at ragged shapes and checks numerics against XLA computed on-chip.

Done criterion (VERDICT r3 #6): max deviations recorded in BENCHMARKS.md and
the TODO caveat deleted.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hyperpri_tpu.ops.pallas.conv3x3_packed import conv3x3_packed
    from hyperpri_tpu.ops.pallas.conv3x3_grad import conv3x3_wgrad

    rng = np.random.default_rng(0)

    def conv_ref(x, w, b):
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.float32), w.astype(jnp.float32), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + b

    # ragged H (and ragged W) at realistic widths/channels
    shapes = [
        (1, 301, 484, 96, 64),   # h % 8 = 5
        (2, 299, 488, 64, 64),   # h % 8 = 3
        (1, 605, 968, 128, 64),  # full-res-adjacent, h % 8 = 5
    ]
    for n, h, w, c, o in shapes:
        x = jnp.asarray(rng.normal(size=(n, h, w, c)).astype(np.float32)).astype(jnp.bfloat16)
        wk = jnp.asarray((rng.normal(size=(3, 3, c, o)) * 0.1).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(o,)).astype(np.float32))
        g = jnp.asarray(rng.normal(size=(n, h, w, o)).astype(np.float32)).astype(jnp.bfloat16)
        tag = f"({n},{h},{w},{c}->{o})"

        # fwd + stats (masked ragged tail)
        y, (s, ss) = conv3x3_packed(
            x.astype(jnp.bfloat16), wk.astype(jnp.bfloat16), b, relu=False,
            with_stats=True, lane_stride=64, out_dtype=jnp.float32,
        )
        yr = conv_ref(x, wk, b)
        dev_y = float(jnp.max(jnp.abs(y - yr)))
        sr = jnp.sum(yr, axis=(0, 1, 2))
        ssr = jnp.sum(yr * yr, axis=(0, 1, 2))
        dev_s = float(jnp.max(jnp.abs(s - sr) / (jnp.abs(sr) + 1)))
        dev_ss = float(jnp.max(jnp.abs(ss - ssr) / (jnp.abs(ssr) + 1)))
        print(f"{tag} fwd+stats  dev_y={dev_y:.2e} dev_s={dev_s:.2e} dev_ss={dev_ss:.2e}",
              flush=True)

        # bwd epilogue mode (residual read takes the ragged-H zero-pad
        # fallback). The boundary here is bc->o with bc <= 64 (the production
        # gate, conv_train._bnact_bwd): the residual and the affine carry the
        # boundary's INPUT channel count bc.
        bc = min(c, 64)
        res = jnp.asarray(rng.normal(size=(n, h, w, bc)).astype(np.float32)).astype(jnp.bfloat16)
        pa = jnp.asarray(rng.normal(size=(bc,)).astype(np.float32))
        pb = jnp.asarray((rng.normal(size=(bc,)) * 0.1).astype(np.float32))
        wb_ = jnp.asarray((rng.normal(size=(3, 3, bc, o)) * 0.1).astype(np.float32))
        wt = jnp.transpose(wb_[::-1, ::-1], (0, 1, 3, 2))  # (3,3,o,bc)
        zb = jnp.zeros((o,), jnp.float32)
        dx, (dpa, dpb) = conv3x3_packed(
            g, wt.astype(jnp.bfloat16), zb, pa, pb, res, relu=False,
            lane_stride=64, out_dtype=jnp.bfloat16,
        )
        dz = conv_ref(g, wt, jnp.zeros((bc,)))
        m = (res.astype(jnp.float32) * pa + pb) > 0
        mdz = jnp.where(m, dz, 0.0)
        dx_r = mdz * pa
        dev_dx = float(jnp.max(jnp.abs(dx.astype(jnp.float32) - dx_r.astype(jnp.bfloat16).astype(jnp.float32))))
        dpa_r = jnp.sum(mdz * res.astype(jnp.float32), axis=(0, 1, 2))
        dpb_r = jnp.sum(mdz, axis=(0, 1, 2))
        dev_dpa = float(jnp.max(jnp.abs(dpa - dpa_r) / (jnp.abs(dpa_r) + 1)))
        dev_dpb = float(jnp.max(jnp.abs(dpb - dpb_r) / (jnp.abs(dpb_r) + 1)))
        print(f"{tag} bwd-epi bc={bc} dev_dx={dev_dx:.2e} dev_dpa={dev_dpa:.2e} dev_dpb={dev_dpb:.2e}",
              flush=True)

        # wgrad (ragged H pads g internally)
        dw = conv3x3_wgrad(x.astype(jnp.bfloat16), g)
        xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (1, 1), (1, 1), (0, 0)))
        dw_r = jax.lax.conv_general_dilated(
            jnp.transpose(xp, (3, 1, 2, 0)),
            jnp.transpose(g.astype(jnp.float32), (1, 2, 0, 3)),
            (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        dw_r = jnp.transpose(dw_r, (1, 2, 0, 3))
        scale = float(jnp.max(jnp.abs(dw_r))) + 1e-6
        dev_dw = float(jnp.max(jnp.abs(dw - dw_r))) / scale
        print(f"{tag} wgrad      rel_dw={dev_dw:.2e}", flush=True)


if __name__ == "__main__":
    main()
