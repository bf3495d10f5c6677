"""Golden-file test: the literal reference split JSONs/CSVs parse to the
published fold sizes.

Pins the parser (data/splits.py) against the actual shipped files in
/root/reference/Datasets/HyperPRI/data_splits (C20). Reference data facts
verified here:
  - fold sizes (train/val): 45/14, 44/15, 45/14, 44/15, 43/16 — 59 each
  - splits 1/2/4 are box-disjoint; split 3 shares box64 and split 5 shares
    box49 between train and val (quirks of the shipped data itself: those
    folds have 59 entries but only 58 unique image names)
The split files are shipped with this repo (Datasets/HyperPRI/data_splits —
small public data definitions, so a standalone checkout runs the 5-fold
protocol); when the reference checkout is also present, a byte-identity
cross-check pins the in-repo copies against it."""

import filecmp
import os

import pytest

from hyperpri_tpu.data.splits import parse_split_csv, parse_split_json

REPO_SPLITS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "Datasets", "HyperPRI", "data_splits",
)
REF_SPLITS = "/root/reference/Datasets/HyperPRI/data_splits"


@pytest.mark.skipif(
    not os.path.isdir(REF_SPLITS), reason="reference data_splits not present"
)
def test_repo_splits_byte_identical_to_reference():
    names = sorted(os.listdir(REF_SPLITS))
    assert sorted(os.listdir(REPO_SPLITS)) == names
    match, mismatch, errors = filecmp.cmpfiles(
        REPO_SPLITS, REF_SPLITS, names, shallow=False
    )
    assert not mismatch and not errors


def _fold(split, which, **kw):
    return parse_split_json(
        os.path.join(REPO_SPLITS, f"{which}{split}.json"), root="/x",
        require_exists=False, **kw
    )


@pytest.mark.parametrize(
    "split,n_train,n_val", [(1, 45, 14), (2, 44, 15), (3, 45, 14), (4, 44, 15), (5, 43, 16)]
)
def test_fold_sizes(split, n_train, n_val):
    assert len(_fold(split, "train")) == n_train
    assert len(_fold(split, "val")) == n_val


@pytest.mark.parametrize("split", [1, 2, 3, 4, 5])
def test_box_disjointness_matches_shipped_data(split):
    train, val = _fold(split, "train"), _fold(split, "val")
    overlap = {e.box for e in train.entries} & {e.box for e in val.entries}
    names = {e.name for e in train.entries} | {e.name for e in val.entries}
    shipped_overlaps = {3: {"box64"}, 5: {"box49"}}
    if split in shipped_overlaps:
        # shipped quirk: one box appears in both folds, one duplicated image
        assert overlap == shipped_overlaps[split]
        assert len(names) == 58
    else:
        assert not overlap
        assert len(names) == 59
    assert len(train) + len(val) == 59


@pytest.mark.parametrize("which", ["train1", "val3"])
def test_csv_mirrors_match_json(which, tmp_path):
    jindex = parse_split_json(
        os.path.join(REPO_SPLITS, f"{which}.json"), root="/x", require_exists=False
    )
    # CSV basenames carry no plant/resolution: the parser locates them by
    # scanning {root}/{Plant}_{WxH}/ dirs, so materialize those dir names.
    for e in jindex.entries:
        os.makedirs(tmp_path / os.path.basename(os.path.dirname(os.path.dirname(e.img))), exist_ok=True)
    cindex = parse_split_csv(
        os.path.join(REPO_SPLITS, f"{which}.csv"), root=str(tmp_path), require_exists=False
    )
    assert {e.name for e in jindex.entries} == {e.name for e in cindex.entries}


def test_hsi_mode_resolves_dat_paths():
    idx = _fold(1, "val", mode="hsi")
    assert all(e.dat and e.dat.endswith(".dat") for e in idx.entries)
    assert all(e.hdr and e.hdr.endswith("hinalea_hsi.hdr") for e in idx.entries)
