"""Experiment drivers: 5-fold train / validate / segmap CLIs.

Parity targets (loop semantics, path templates, defaults):
  - kfold_train     /root/reference/kfold_train.py     (5 splits x n_seeds,
    MODEL_SHARD / LOAD_CKPT / DATA_AUG globals, HSI default)
  - kfold_validate  /root/reference/kfold_validate.py  (per split x {UNET,
    SpectralUNET, CubeNET} threshold sweeps, combined PR plot)
  - kfold_segmaps   /root/reference/kfold_segmaps.py   (test-set eval at the
    published per-model-per-split best thresholds, segmap export,
    test.json override)

The reference configures these by editing module-level globals; here the
same knobs are argparse flags with matching names and defaults.
"""

from __future__ import annotations

import argparse
import os
from typing import List, Optional

# Published best validation thresholds (BASELINE.md; reproduced 05/2024).
REFERENCE_THRESHOLDS = {
    "UNET": [0.36, 0.41, 0.42, 0.56, 0.38],
    "SpectralUNET": [0.45, 0.39, 0.48, 0.36, 0.28],
    "CubeNET": [0.33, 0.46, 0.39, 0.46, 0.27],
}

KFOLD_MODELS = ["UNET", "SpectralUNET", "CubeNET"]
KFOLD_DATASETS = ["RGB", "HSI", "HSI"]
PLT_COLORS = ["tab:blue", "tab:orange", "tab:green", "tab:red", "tab:purple"]


def _make_config(dataset: str, calling_path: str, split_no: int, seed_num: int, augment: bool):
    from hyperpri_tpu.config import ExpHyperspectralPRI, ExpRedGreenBluePRI

    if dataset.lower() == "rgb":
        return ExpRedGreenBluePRI(
            calling_path=calling_path, split_no=split_no, seed_num=seed_num, augment=augment
        )
    return ExpHyperspectralPRI(
        calling_path=calling_path, split_no=split_no, seed_num=seed_num, augment=augment
    )


def rename_folder(save_path: str) -> Optional[str]:
    """Archive an existing run directory with a timestamp suffix (reference
    kfold_train.py:32-45; defined there but commented out at the call site —
    exposed here behind --archive-existing)."""
    import datetime

    if not os.path.exists(save_path):
        return None
    now = datetime.datetime.now()
    suffix = f"_{now.year}{now.month}{now.day}_{now.hour}{now.minute}{now.second}"
    target = save_path.rstrip("/") + suffix + "/"
    os.rename(save_path, target)
    return target


def _add_model_overrides(p):
    p.add_argument("--model", default=None,
                   choices=["UNET", "UNET+", "SpectralUNET", "CubeNET"],
                   help="override the config's default model "
                        "(reference: MODEL_NAME in params_HyperPRI.py)")
    p.add_argument("--hsi-lo", type=int, default=None)
    p.add_argument("--hsi-hi", type=int, default=None)
    p.add_argument("--cube-featmaps", type=int, default=None)
    p.add_argument("--spectral-bn-size", type=int, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--decoded-cache", default=None, metavar="DIR",
                   help="on-disk decoded-cube cache dir: cold epochs read the "
                        "decoded band window instead of re-paying the ENVI gather")
    p.add_argument("--chunks", type=int, default=None, metavar="N",
                   help="chunked-pixel gradient accumulation (train/chunked.py): "
                        "the single-chip path for SpectralUNET's full paper "
                        "protocol; BN stats per chunk — at N == batch size this "
                        "is the reference's own per-image BN semantics")
    p.add_argument("--offload", action="store_true",
                   help="SpectralUNET host-offloaded remat: residuals cross the "
                        "fwd->bwd gap in pinned host memory (numerics identical "
                        "to the plain step)")


def _apply_model_overrides(cfg, args):
    if getattr(args, "model", None):
        cfg.model_name = args.model
    # --chunks / --offload are SpectralUNET training modes (train/chunked.py,
    # spectral_offload_policy); a silent no-op on other models would record
    # misleading hparams, so fail early instead.
    for flag in ("chunks", "offload"):
        if getattr(args, flag, None) and cfg.model_name.lower() != "spectralunet":
            raise SystemExit(
                f"--{flag} is a SpectralUNET training mode (per-pixel model); "
                f"current model is {cfg.model_name}"
            )
    for attr, val in [("hsi_lo", args.hsi_lo), ("hsi_hi", args.hsi_hi),
                      ("cube_featmaps", args.cube_featmaps),
                      ("spectral_bn_size", args.spectral_bn_size),
                      ("epochs", args.epochs),
                      ("decoded_cache_dir", args.decoded_cache),
                      ("grad_accum_chunks", getattr(args, "chunks", None)),
                      ("offload", getattr(args, "offload", None) or None)]:
        if val is not None:
            setattr(cfg, attr, val)
    if args.hsi_lo is not None or args.hsi_hi is not None:
        cfg.channels = cfg.hsi_hi - cfg.hsi_lo
    cfg._refresh_paths()
    return cfg


def kfold_train(argv: Optional[List[str]] = None) -> None:
    p = argparse.ArgumentParser(description="5-split cross-validation training")
    p.add_argument("--calling-path", default=os.getcwd())
    p.add_argument("--dataset", default="HSI", choices=["RGB", "HSI"])
    p.add_argument("--model-shard", action="store_true",
                   help="SPMD model sharding (MODEL_SHARD=True equivalent: bf16 + "
                        "ZeRO opt-state + spatial sharding)")
    p.add_argument("--load-ckpt", action="store_true",
                   help="resume the start split from its newest last.ckpt")
    p.add_argument("--augment", action="store_true", help="random-crop augmentation")
    p.add_argument("--n-seeds", type=int, default=1)
    p.add_argument("--start-split", type=int, default=0)
    p.add_argument("--num-splits", type=int, default=5)
    p.add_argument("--max-epochs", type=int, default=None)
    p.add_argument("--validate", action="store_true",
                   help="run the threshold sweep after each training run")
    p.add_argument("--archive-existing", action="store_true",
                   help="timestamp-rename an existing run dir instead of resuming into it")
    _add_model_overrides(p)
    args = p.parse_args(argv)

    from hyperpri_tpu.train import train_net, validate_net

    print("\n ~~~~~~~~~~ 5-SPLIT CYCLES ~~~~~~~~~~\n")
    load_ckpt = args.load_ckpt
    for run in range(args.start_split, args.num_splits):
        print(f" ********** Split {run + 1} **********")
        for seed_idx in range(args.n_seeds):
            print(f"        Seed {seed_idx + 1} / {args.n_seeds}.....")
            cfg = _make_config(args.dataset, args.calling_path, run + 1, seed_idx, args.augment)
            _apply_model_overrides(cfg, args)
            if args.archive_existing:
                archived = rename_folder(cfg.save_path)
                if archived:
                    print(f"archived previous run to {archived}")
            train_net(cfg, checkpoint=load_ckpt, model_parallel=args.model_shard,
                      max_epochs=args.max_epochs)
            if args.n_seeds > 1 or args.validate:
                print(f"   Model: {cfg.model_param_str}")
                print(f"   Validation JSON: {cfg.json_dir['val']}")
                validate_net(cfg.get_val_data(), cfg, save_segmaps=False)
        load_ckpt = False  # only the start split resumes (kfold_train.py:92)


def kfold_validate(argv: Optional[List[str]] = None) -> None:
    p = argparse.ArgumentParser(description="per-split threshold sweeps for all models")
    p.add_argument("--calling-path", default=os.getcwd())
    p.add_argument("--models", nargs="+", default=KFOLD_MODELS)
    p.add_argument("--datasets", nargs="+", default=None,
                   help="per-model dataset (default RGB for UNET, HSI otherwise)")
    p.add_argument("--start-split", type=int, default=0)
    p.add_argument("--num-splits", type=int, default=5)
    p.add_argument("--save-segmaps", action="store_true")
    _add_model_overrides(p)
    args = p.parse_args(argv)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from hyperpri_tpu.train import validate_net

    datasets = args.datasets or ["RGB" if m.upper() == "UNET" else "HSI" for m in args.models]

    print("\n ~~~~~~~~~~ 5-SPLIT CYCLES ~~~~~~~~~~\n")
    plt.figure(dpi=150)
    dset = "HSI"
    for run in range(args.start_split, args.num_splits):
        print(f" ********** Split {run + 1} **********")
        for m_idx, (m, dset) in enumerate(zip(args.models, datasets)):
            cfg = _make_config(dset, args.calling_path, run + 1, 0, False)
            cfg.change_network_param(m, args.calling_path, run + 1)
            _apply_model_overrides(cfg, args)
            print(f"   Model: {cfg.model_param_str}")
            print(f"   Validation JSON: {cfg.json_dir['val']}")
            precision, recall, _ = validate_net(
                cfg.get_val_data(), cfg, save_segmaps=args.save_segmaps
            )
            label = m if run == args.start_split else None
            plt.plot(recall, precision, alpha=0.7, color=PLT_COLORS[m_idx % len(PLT_COLORS)],
                     label=label)

    curve_str = "_".join(args.models)
    plt.xlabel("Recall", fontsize=14)
    plt.ylabel("Precision", fontsize=14)
    plt.legend()
    out = f"{args.calling_path}/Saved_Models/{dset}/{curve_str}_pr.png"
    os.makedirs(os.path.dirname(out), exist_ok=True)
    plt.savefig(out)
    print(f"saved {out}")


def kfold_segmaps(argv: Optional[List[str]] = None) -> None:
    p = argparse.ArgumentParser(description="test-set metrics + segmaps at fixed thresholds")
    p.add_argument("--calling-path", default=os.getcwd())
    p.add_argument("--models", nargs="+", default=KFOLD_MODELS)
    p.add_argument("--datasets", nargs="+", default=None)
    p.add_argument("--start-split", type=int, default=0)
    p.add_argument("--num-splits", type=int, default=5)
    p.add_argument("--testing-set", default="test", choices=["train", "val", "test"])
    p.add_argument("--test-json", default=None,
                   help="override test split JSON (default data_splits/test.json)")
    p.add_argument("--no-segmaps", action="store_true")
    p.add_argument("--thresholds", nargs="+", type=float, default=None,
                   help="flat per-model thresholds (default: published table)")
    _add_model_overrides(p)
    args = p.parse_args(argv)

    from hyperpri_tpu.train import test_net

    datasets = args.datasets or ["RGB" if m.upper() == "UNET" else "HSI" for m in args.models]

    print("\n ~~~~~~~~~~ 5-SPLIT CYCLES ~~~~~~~~~~\n")
    for run in range(args.start_split, args.num_splits):
        print(f" ********** Split {run + 1} **********")
        for m_idx, (m, dset) in enumerate(zip(args.models, datasets)):
            cfg = _make_config(dset, args.calling_path, run + 1, 0, False)
            cfg.change_network_param(m, args.calling_path, run + 1)
            _apply_model_overrides(cfg, args)
            cfg.json_dir["test"] = args.test_json or os.path.join(
                cfg.data_dir, "data_splits", "test.json"
            )
            print(f"   Model: {cfg.model_param_str}")
            print(f"   Test JSON: {cfg.json_dir['test']}")
            data = {
                "train": cfg.get_train_data,
                "val": cfg.get_val_data,
                "test": cfg.get_test_data,
            }[args.testing_set]()
            if args.thresholds is not None:
                thr = args.thresholds[m_idx]
            else:
                thr = REFERENCE_THRESHOLDS.get(m, [0.5] * 5)[run]
            test_net(data, cfg, best_threshold=thr, save_segmaps=not args.no_segmaps)
