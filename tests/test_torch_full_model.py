"""Full-model numerical parity: a torch SpectralUNET (architecture from
SURVEY.md §2 C3) is imported via the checkpoint bridge and must produce the
same eval-mode logits as the flax model, pixel for pixel."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from flax import serialization  # noqa: E402

from hyperpri_tpu.models import SpectralUNET  # noqa: E402
from hyperpri_tpu.train.torch_import import convert_state_dict  # noqa: E402

DEPTH, FEATS = 12, 16


class TorchSpectralUNET(torch.nn.Module):
    """Per-pixel MLP U-Net: 5 down + 4 up Linear+BN1d+ReLU blocks with skip
    concats and a Linear(2*feats -> 1) head (spec: SURVEY.md §2 C3)."""

    def __init__(self):
        super().__init__()

        def block(cin, cout):
            return torch.nn.Sequential(
                torch.nn.Linear(cin, cout), torch.nn.BatchNorm1d(cout), torch.nn.ReLU()
            )

        self.tail = block(DEPTH, FEATS)
        self.down1 = block(FEATS, FEATS)
        self.down2 = block(FEATS, FEATS)
        self.down3 = block(FEATS, FEATS)
        self.down4 = block(FEATS, FEATS)
        self.up1 = block(FEATS, FEATS)
        self.up2 = block(2 * FEATS, FEATS)
        self.up3 = block(2 * FEATS, FEATS)
        self.up4 = block(2 * FEATS, FEATS)
        self.outc = torch.nn.Linear(2 * FEATS, 1)

    def forward(self, p):  # p: (P, DEPTH) pixel rows
        x0 = self.tail(p)
        x1 = self.down1(x0)
        x2 = self.down2(x1)
        x3 = self.down3(x2)
        x4 = self.down4(x3)
        u = self.up1(x4)
        u = self.up2(torch.cat([x3, u], -1))
        u = self.up3(torch.cat([x2, u], -1))
        u = self.up4(torch.cat([x1, u], -1))
        return self.outc(torch.cat([x0, u], -1))


def test_spectral_unet_full_forward_parity(rng):
    tmodel = TorchSpectralUNET().eval()
    # randomize running stats so eval-mode BN is non-trivial
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.copy_(torch.tensor(rng.normal(0, 0.3, FEATS).astype(np.float32)))
                m.running_var.copy_(torch.tensor(rng.uniform(0.5, 2, FEATS).astype(np.float32)))

    h, w = 5, 6
    x = rng.normal(size=(2, h, w, DEPTH)).astype(np.float32)
    pixels = torch.tensor(x.reshape(-1, DEPTH))
    with torch.no_grad():
        ref = tmodel(pixels).numpy().reshape(2, h, w, 1)

    params, batch_stats = convert_state_dict(tmodel.state_dict(), "SpectralUNET")
    model = SpectralUNET(hsi_depth=DEPTH, n_classes=1, bn_feats=FEATS)
    variables = model.init(jax.random.key(0), jnp.asarray(x), train=False)
    new_params = serialization.from_state_dict(variables["params"], params)
    new_stats = serialization.from_state_dict(variables["batch_stats"], batch_stats)
    ours = model.apply(
        {"params": new_params, "batch_stats": new_stats}, jnp.asarray(x), train=False
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-5)
