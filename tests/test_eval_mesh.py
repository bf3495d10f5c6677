"""validate_net / test_net under an SPMD mesh: checkpoint restore must
re-place state onto the mesh and prediction must shard batches."""

import numpy as np

from hyperpri_tpu.config import ExpHyperspectralPRI
from hyperpri_tpu.data.synthetic import make_experiment_tree
from hyperpri_tpu.train import train_net, validate_net


def test_validate_under_mesh(tmp_path):
    make_experiment_tree(str(tmp_path), n_boxes=2, dates_per_box=2, size_hw=(16, 16), bands=8)
    cfg = ExpHyperspectralPRI(calling_path=str(tmp_path), split_no=1)
    cfg.hsi_lo, cfg.hsi_hi = 0, 8
    cfg.channels = 8
    cfg.cube_featmaps = 8
    cfg.mesh_shape = {"data": 2, "spatial": 4}
    cfg.zero_shard_opt = True
    train_net(cfg, max_epochs=1, progress=False)

    prec, rec, thr = validate_net(cfg.get_val_data(), cfg, verbose=False, n_thresholds=50)
    assert prec.shape == (51,)
    assert np.all(np.isfinite(prec))
