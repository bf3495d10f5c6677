"""Live-torch mirrors of the reference architectures + its exact train step.

These modules reproduce the reference's architecture and training semantics
(spec: SURVEY.md §2-3; /root/reference/src/Experiments/models.py,
model_parts.py, and PLTrainer.py:79-98 training_step /:164-183
configure_optimizers) so the training-trajectory parity harness
(scripts/parity_train_torch.py, tests/test_torch_train_parity.py) can run
the SAME initial weights and the SAME batches through both frameworks and
compare per-step losses, BN running statistics, and final parameters.

State-dict keys intentionally match the reference layout (inc.double_conv.*,
down{k}.maxpool_conv.1.double_conv.*, up{k}.up/conv.double_conv.*, outc.*,
first_conv/inc.1/inc2.* for CubeNET, tail/down*/up*/outc for SpectralUNET) so
train/torch_import.py and train/torch_export.py bridge them unchanged.

torch is imported lazily; this module is validation-only and never runs on
the TPU compute path.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Tuple

import numpy as np


def _torch():
    import torch

    return torch


# ---------------------------------------------------------------- building blocks


def _double_conv(cin: int, cout: int, cmid: int | None = None):
    """Conv3x3 -> BN -> ReLU twice (reference model_parts.py:14-31)."""
    torch = _torch()
    nn = torch.nn
    cmid = cmid or cout
    return nn.Sequential(
        nn.Conv2d(cin, cmid, 3, padding=1),
        nn.BatchNorm2d(cmid),
        nn.ReLU(inplace=True),
        nn.Conv2d(cmid, cout, 3, padding=1),
        nn.BatchNorm2d(cout),
        nn.ReLU(inplace=True),
    )


def _make_down(cin: int, cout: int):
    """MaxPool2 then DoubleConv (reference model_parts.py:34-45)."""
    torch = _torch()
    nn = torch.nn

    class Down(nn.Module):
        def __init__(self):
            super().__init__()
            self.maxpool_conv = nn.Sequential(
                nn.MaxPool2d(2), _DoubleConvHolder(cin, cout)
            )

        def forward(self, x):
            return self.maxpool_conv(x)

    return Down()


class _DoubleConvHolder:
    """Factory returning a torch Module whose state-dict prefix is
    `double_conv.*`, matching the reference's DoubleConv wrapper; defined as
    a lazy factory so importing this file never imports torch."""

    def __new__(cls, cin, cout, cmid=None):
        torch = _torch()
        nn = torch.nn

        class DoubleConv(nn.Module):
            def __init__(self):
                super().__init__()
                self.double_conv = _double_conv(cin, cout, cmid)

            def forward(self, x):
                return self.double_conv(x)

        return DoubleConv()


def _center_pad_cat(up_x, skip):
    """Center-pad the upsampled map to the skip's extent, concat channelwise
    (reference model_parts.py:71-87; floor/ceil split of the difference)."""
    torch = _torch()
    F = torch.nn.functional
    dy = skip.size(2) - up_x.size(2)
    dx = skip.size(3) - up_x.size(3)
    up_x = F.pad(up_x, [dx // 2, dx - dx // 2, dy // 2, dy - dy // 2])
    return torch.cat([skip, up_x], dim=1)


def _make_up(cin: int, cout: int):
    """ConvTranspose2d(k2 s2) halving channels, center-pad, concat, DoubleConv
    (reference model_parts.py:48-90 at bilinear=False, no attention)."""
    torch = _torch()
    nn = torch.nn

    class Up(nn.Module):
        def __init__(self):
            super().__init__()
            self.up = nn.ConvTranspose2d(cin, cin // 2, kernel_size=2, stride=2)
            self.conv = _DoubleConvHolder(cin, cout)

        def forward(self, x, skip):
            return self.conv(_center_pad_cat(self.up(x), skip))

    return Up()


def _make_outc(cin: int, n_classes: int):
    torch = _torch()
    nn = torch.nn

    class OutConv(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = nn.Conv2d(cin, n_classes, kernel_size=1)

        def forward(self, x):
            return self.conv(x)

    return OutConv()


# ---------------------------------------------------------------- full models


def make_torch_unet(n_channels: int = 3, n_classes: int = 1):
    """Reference UNet at bilinear=False (models.py:23-68): widths
    64->128->256->512->1024 down, ConvTranspose ups, 1x1 head."""
    torch = _torch()
    nn = torch.nn
    c = 64

    class TorchUNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.inc = _DoubleConvHolder(n_channels, c)
            self.down1 = _make_down(c, c * 2)
            self.down2 = _make_down(c * 2, c * 4)
            self.down3 = _make_down(c * 4, c * 8)
            self.down4 = _make_down(c * 8, c * 16)
            self.up1 = _make_up(c * 16, c * 8)
            self.up2 = _make_up(c * 8, c * 4)
            self.up3 = _make_up(c * 4, c * 2)
            self.up4 = _make_up(c * 2, c)
            self.outc = _make_outc(c, n_classes)

        def forward(self, x):
            x1 = self.inc(x)
            x2 = self.down1(x1)
            x3 = self.down2(x2)
            x4 = self.down3(x3)
            x5 = self.down4(x4)
            y = self.up1(x5, x4)
            y = self.up2(y, x3)
            y = self.up3(y, x2)
            y = self.up4(y, x1)
            return self.outc(y)

    return TorchUNet()


def make_torch_cubenet(hsi_depth: int = 238, n_classes: int = 1, first_depth: int = 64):
    """Reference CubeNET at bilinear=False (models.py:148-247): Conv3d
    spectral collapse (registered both standalone and inside the `inc`
    Sequential, as the reference does), inc2 Conv+BN+ReLU, U-body at C=128."""
    torch = _torch()
    nn = torch.nn
    C = 128

    class TorchCubeNET(nn.Module):
        def __init__(self):
            super().__init__()
            self.first_conv = nn.Conv3d(
                1, first_depth, kernel_size=(hsi_depth, 3, 3), padding=(0, 1, 1)
            )
            self.inc = nn.Sequential(
                self.first_conv, nn.BatchNorm3d(first_depth), nn.ReLU(inplace=True)
            )
            self.inc2 = nn.Sequential(
                nn.Conv2d(first_depth, first_depth, 3, padding=1),
                nn.BatchNorm2d(first_depth),
                nn.ReLU(inplace=True),
            )
            self.down1 = _make_down(first_depth, C)
            self.down2 = _make_down(C, C * 2)
            self.down3 = _make_down(C * 2, C * 4)
            self.down4 = _make_down(C * 4, C * 8)
            self.up1 = _make_up(C * 8, C * 4)
            self.up2 = _make_up(C * 4, C * 2)
            self.up3 = _make_up(C * 2, C)
            if first_depth == 64:
                self.up4 = _make_up(C, 64)
            else:
                self.upsample4 = nn.ConvTranspose2d(C, 64, kernel_size=2, stride=2)
                self.upconv4 = _DoubleConvHolder(64 + first_depth, 64)
            self.first_depth = first_depth
            self.outc = _make_outc(64, n_classes)

        def forward(self, x):  # x: (N, 1, D, H, W)
            n, h, w = x.shape[0], x.shape[-2], x.shape[-1]
            x1 = self.inc(x).reshape(n, self.first_conv.out_channels, h, w)
            x1 = self.inc2(x1)
            x2 = self.down1(x1)
            x3 = self.down2(x2)
            x4 = self.down3(x3)
            x5 = self.down4(x4)
            y = self.up1(x5, x4)
            y = self.up2(y, x3)
            y = self.up3(y, x2)
            if self.first_depth == 64:
                y = self.up4(y, x1)
            else:
                y = self.upsample4(y)
                # alt-head concat order is [skip, up] too (models.py:240)
                y = self.upconv4(_center_pad_cat(y, x1))
            return self.outc(y)

    return TorchCubeNET()


def make_torch_spectral_unet(hsi_depth: int = 238, n_classes: int = 1, bn_feats: int = 16):
    """Reference SpectralUNET (models.py:71-145): 5 down + 4 up
    Linear+BN1d+ReLU all bn_feats wide, skip concats (skip first), python
    loop over batch images — BN1d train statistics are PER IMAGE."""
    torch = _torch()
    nn = torch.nn

    def block(cin, cout):
        return nn.Sequential(nn.Linear(cin, cout), nn.BatchNorm1d(cout), nn.ReLU())

    class TorchSpectralUNET(nn.Module):
        def __init__(self):
            super().__init__()
            self.tail = block(hsi_depth, bn_feats)
            self.down1 = block(bn_feats, bn_feats)
            self.down2 = block(bn_feats, bn_feats)
            self.down3 = block(bn_feats, bn_feats)
            self.down4 = block(bn_feats, bn_feats)
            self.up1 = block(bn_feats, bn_feats)
            self.up2 = block(2 * bn_feats, bn_feats)
            self.up3 = block(2 * bn_feats, bn_feats)
            self.up4 = block(2 * bn_feats, bn_feats)
            self.outc = nn.Linear(2 * bn_feats, n_classes)

        def forward(self, x):  # x: (N, D, H, W)
            n, d, h, w = x.shape
            rast = x.reshape(n, d, h * w).permute(0, 2, 1)
            out = torch.zeros((n, n_classes, h, w), device=x.device)
            for i, p in enumerate(rast):  # per-image loop == per-image BN stats
                x0 = self.tail(p)
                x1 = self.down1(x0)
                x2 = self.down2(x1)
                x3 = self.down3(x2)
                x4 = self.down4(x3)
                u = self.up1(x4)
                u = self.up2(torch.cat((x3, u), dim=-1))
                u = self.up3(torch.cat((x2, u), dim=-1))
                u = self.up4(torch.cat((x1, u), dim=-1))
                u = self.outc(torch.cat((x0, u), dim=-1))
                out[i] = u.reshape(n_classes, h, w)
            return out

    return TorchSpectralUNET()


# ---------------------------------------------------------------- train loop


def run_reference_training(
    model,
    batches: Iterable[Tuple[np.ndarray, np.ndarray]],
    lr: float = 1e-3,
) -> List[float]:
    """Run the reference's exact training-step semantics over `batches`.

    Per PLTrainer.py:79-98 + :164-183: fp32, model.train(), loss =
    BCEWithLogitsLoss (mean over all elements), Adam(lr, weight_decay=0,
    torch defaults betas/eps), zero_grad -> backward -> step, no clipping,
    no scheduler. Returns the per-step losses.

    batches yield (image, mask) in torch layout: image (N, C, H, W) or
    (N, 1, D, H, W) / (N, D, H, W); mask (N, 1, H, W) float32.
    """
    torch = _torch()
    opt = torch.optim.Adam(model.parameters(), lr=lr, weight_decay=0.0)
    crit = torch.nn.BCEWithLogitsLoss()
    model.train()
    losses = []
    for img, mask in batches:
        img_t = torch.from_numpy(np.ascontiguousarray(img))
        mask_t = torch.from_numpy(np.ascontiguousarray(mask))
        opt.zero_grad()
        loss = crit(model(img_t), mask_t)
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
    return losses


def bn_running_stats(model) -> Dict[str, np.ndarray]:
    """All BN running_mean/running_var buffers keyed by state-dict name."""
    out = {}
    for k, v in model.state_dict().items():
        if k.endswith("running_mean") or k.endswith("running_var"):
            out[k] = v.detach().cpu().numpy().copy()
    return out
