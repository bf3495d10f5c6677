"""Data-layer tests: ENVI round-trip, split parsing, dataset semantics,
pipeline padding/prefetch."""

import json
import os

import numpy as np
import pytest

from hyperpri_tpu.data import (
    DataLoader,
    HyperpriDataset,
    collate,
    make_synthetic_dataset,
    paired_random_crop,
    parse_envi_header,
    parse_split_json,
    read_cube,
    write_envi,
)


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("hyperpri"))
    info = make_synthetic_dataset(root, n_boxes=3, dates_per_box=2, size_hw=(24, 32), bands=20)
    return info


@pytest.mark.parametrize("interleave", ["bil", "bip", "bsq"])
def test_envi_roundtrip_all_interleaves(tmp_path, rng, interleave):
    cube = rng.normal(size=(7, 11, 5)).astype(np.float32)
    hdr = str(tmp_path / f"c_{interleave}.hdr")
    dat = str(tmp_path / f"c_{interleave}.dat")
    write_envi(hdr, dat, cube, interleave=interleave)
    h = parse_envi_header(hdr)
    assert (h.lines, h.samples, h.bands) == (7, 11, 5)
    assert h.interleave == interleave
    out = read_cube(hdr, dat)
    np.testing.assert_array_equal(out, cube)


def test_envi_band_slice(tmp_path, rng):
    cube = rng.normal(size=(6, 8, 10)).astype(np.float32)
    hdr, dat = str(tmp_path / "c.hdr"), str(tmp_path / "c.dat")
    write_envi(hdr, dat, cube, interleave="bil")
    out = read_cube(hdr, dat, band_lo=2, band_hi=7)
    np.testing.assert_array_equal(out, cube[:, :, 2:7])


def test_envi_uint16(tmp_path, rng):
    cube = rng.integers(0, 4095, size=(4, 6, 3)).astype(np.uint16)
    hdr, dat = str(tmp_path / "u.hdr"), str(tmp_path / "u.dat")
    write_envi(hdr, dat, cube, interleave="bsq")
    out = read_cube(hdr, dat)
    np.testing.assert_array_equal(out, cube.astype(np.float32))


def test_envi_rejects_truncated(tmp_path, rng):
    cube = rng.normal(size=(4, 4, 4)).astype(np.float32)
    hdr, dat = str(tmp_path / "t.hdr"), str(tmp_path / "t.dat")
    write_envi(hdr, dat, cube)
    with open(dat, "r+b") as f:
        f.truncate(100)
    with pytest.raises(ValueError, match="too small"):
        read_cube(hdr, dat)


def test_parse_reference_split_schema(tmp_path):
    # Golden-schema test: the exact key layout shipped by the reference
    # (Datasets/HyperPRI/data_splits/train1.json).
    spec = {
        "img_dir": "rgb_files",
        "hsi_dir": "hsi_files",
        "mask_dir": "mask_files",
        "box33": {
            "plant_folder": "Peanut",
            "resolution": "968x608",
            "box_no": 33,
            "phenotype": 1,
            "dates": ["20220624", "20220701"],
            "weights": None,
        },
        "box99": {
            "plant_folder": "SweetCorn",
            "resolution": "968x608",
            "box_no": 99,
            "phenotype": 2,
            "dates": [],
            "weights": None,
        },
    }
    p = tmp_path / "train1.json"
    p.write_text(json.dumps(spec))
    idx = parse_split_json(str(p), str(tmp_path), mode="rgb", require_exists=False)
    # box99 skipped (no dates); box33 contributes 2 entries
    assert len(idx) == 2
    assert idx.entries[0].name == "20220624_box33_ref"
    assert idx.entries[0].img.endswith("Peanut_968x608/rgb_files/20220624_box33_ref.png")
    assert idx.entries[0].label.endswith("Peanut_968x608/mask_files/20220624_box33_ref_mask.png")
    assert idx.class_count == {"Peanut": 2, "SweetCorn": 0}


def test_split_skips_missing_files(synth):
    idx = parse_split_json(synth["splits"]["train"], synth["root"], mode="rgb")
    assert len(idx) == 4  # 2 boxes x 2 dates
    idx_hsi = parse_split_json(synth["splits"]["train"], synth["root"], mode="hsi")
    assert len(idx_hsi) == 4


def test_dataset_rgb(synth):
    ds = HyperpriDataset(synth["root"], mode="RGB", json_file=synth["splits"]["train"])
    assert len(ds) == 4
    item = ds[0]
    # 24x32 portrait in numpy is landscape in PIL terms; W(32) > H(24): no rotation
    assert item["image"].shape == (24, 32, 3)
    assert item["mask"].shape == (24, 32, 1)
    assert item["image"].dtype == np.float32
    assert set(np.unique(item["mask"])) <= {0.0, 1.0}
    assert item["image"].max() <= 1.0


def test_dataset_rgb_rotates_portrait(tmp_path):
    info = make_synthetic_dataset(
        str(tmp_path), n_boxes=1, dates_per_box=1, size_hw=(40, 20), bands=4
    )
    ds = HyperpriDataset(str(tmp_path), mode="RGB", json_file=info["splits"]["train"])
    item = ds[0]
    # stored 40x20 (H>W) -> rotated to 20x40
    assert item["image"].shape == (20, 40, 3)
    assert item["mask"].shape == (20, 40, 1)
    # HSI must NOT rotate (dataset.py:277-279)
    ds_hsi = HyperpriDataset(
        str(tmp_path), mode="HSI", json_file=info["splits"]["train"], hsi_lo=0, hsi_hi=4
    )
    assert ds_hsi[0]["image"].shape == (40, 20, 4)


def test_dataset_hsi_band_window(synth):
    ds = HyperpriDataset(
        synth["root"], mode="HSI", json_file=synth["splits"]["train"], hsi_lo=3, hsi_hi=17
    )
    item = ds[0]
    assert item["image"].shape == (24, 32, 14)
    assert ds.n_channels == 14


def test_hsi_hi_nonpositive_means_299_plus(synth):
    ds = HyperpriDataset(
        synth["root"], mode="HSI", json_file=synth["splits"]["train"], hsi_lo=0, hsi_hi=-280
    )
    assert ds.hsi_hi == 19  # 299 - 280 (dataset.py:55-57)


def test_dataset_gray_replicates_channels(synth):
    ds = HyperpriDataset(synth["root"], mode="gray", json_file=synth["splits"]["train"])
    img = ds[0]["image"]
    assert img.shape[-1] == 3
    np.testing.assert_array_equal(img[..., 0], img[..., 1])


def test_paired_random_crop_alignment(rng):
    img = rng.normal(size=(20, 30, 5)).astype(np.float32)
    label = np.zeros((20, 30), np.uint8)
    label[7, 13] = 1
    for _ in range(10):
        ci, cl = paired_random_crop(img, label, (10, 12), rng)
        assert ci.shape == (10, 12, 5) and cl.shape == (10, 12)
        ys, xs = np.nonzero(cl)
        if len(ys):
            # the marked pixel must carry the same image content
            np.testing.assert_array_equal(ci[ys[0], xs[0]], img[7, 13])


def test_dataset_crop_and_determinism(synth):
    ds = HyperpriDataset(
        synth["root"], mode="RGB", json_file=synth["splits"]["train"], crop_size=(16, 16)
    )
    r1 = ds.__getitem__(0, rng=np.random.default_rng(7))
    r2 = ds.__getitem__(0, rng=np.random.default_rng(7))
    np.testing.assert_array_equal(r1["image"], r2["image"])
    assert r1["image"].shape == (16, 16, 3)


def test_sample_weights_inverse_frequency(tmp_path):
    # 2 Peanut boxes + 1 SweetCorn box x 1 date each
    info = make_synthetic_dataset(
        str(tmp_path), n_boxes=2, dates_per_box=1, size_hw=(8, 8), bands=4
    )
    from hyperpri_tpu.data.synthetic import make_box
    from hyperpri_tpu.data.splits import write_split_json

    rng = np.random.default_rng(0)
    make_box(str(tmp_path), "SweetCorn", "8x8", "box50", ["20220701"], (8, 8), 4, rng)
    boxes = dict(info["boxes"])
    boxes["box50"] = {
        "plant_folder": "SweetCorn",
        "resolution": "8x8",
        "box_no": 50,
        "phenotype": 1,
        "dates": ["20220701"],
        "weights": None,
    }
    split = str(tmp_path / "data_splits" / "mix.json")
    write_split_json(split, boxes)
    ds = HyperpriDataset(str(tmp_path), mode="RGB", json_file=split)
    # Peanut count 2, SweetCorn count 1 -> weights 1.0 for peanut, 2.0 for corn
    w = ds.sample_weights
    assert sorted(set(w.tolist())) == [1.0, 2.0]


def test_collate_pads_and_masks():
    samples = [
        {"image": np.ones((4, 4, 3), np.float32), "mask": np.ones((4, 4, 1), np.float32), "index": "a"},
    ]
    b = collate(samples, 2)
    assert b["image"].shape == (2, 4, 4, 3)
    np.testing.assert_array_equal(b["valid"], [1.0, 0.0])
    assert b["names"] == ["a", ""]


def test_dataloader_epoch_determinism_and_prefetch(synth):
    ds = HyperpriDataset(synth["root"], mode="RGB", json_file=synth["splits"]["train"])
    dl = DataLoader(ds, batch_size=3, shuffle=True, seed=3, device_put=False)
    dl.set_epoch(5)
    e1 = [b["names"] for b in dl]
    dl2 = DataLoader(ds, batch_size=3, shuffle=True, seed=3, device_put=False)
    dl2.set_epoch(5)
    e2 = [b["names"] for b in dl2]
    assert e1 == e2
    assert len(e1) == 2  # 4 samples, batch 3 -> 2 batches (last padded)
    dl.set_epoch(6)
    assert [b["names"] for b in dl] != e1

    # device_put path returns jax arrays
    dl3 = DataLoader(ds, batch_size=2, shuffle=False, device_put=True)
    batch = next(iter(dl3))
    import jax

    assert isinstance(batch["image"], jax.Array)


def test_parse_split_csv(synth, tmp_path):
    from hyperpri_tpu.data.splits import parse_split_csv

    csv_path = tmp_path / "train1.csv"
    csv_path.write_text("20220701_box33_ref\n20220702_box33_ref\nmissing_box99_ref\n")
    idx = parse_split_csv(str(csv_path), synth["root"], mode="rgb")
    assert len(idx) == 2
    assert idx.entries[0].name == "20220701_box33_ref"
    assert idx.entries[0].plant_folder == "Peanut"
    idx_hsi = parse_split_csv(str(csv_path), synth["root"], mode="hsi")
    assert len(idx_hsi) == 2 and idx_hsi.entries[0].dat.endswith(".dat")


def test_weighted_sampler_oversamples_minority(tmp_path):
    from hyperpri_tpu.data.splits import write_split_json
    from hyperpri_tpu.data.synthetic import make_box, make_synthetic_dataset

    info = make_synthetic_dataset(str(tmp_path), n_boxes=3, dates_per_box=2,
                                  size_hw=(8, 8), bands=4)
    rng = np.random.default_rng(0)
    make_box(str(tmp_path), "SweetCorn", "8x8", "box50", ["20220701"], (8, 8), 4, rng)
    boxes = dict(info["boxes"])
    boxes["box50"] = {"plant_folder": "SweetCorn", "resolution": "8x8", "box_no": 50,
                      "phenotype": 1, "dates": ["20220701"], "weights": None}
    split = str(tmp_path / "data_splits" / "mix.json")
    write_split_json(split, boxes)
    ds = HyperpriDataset(str(tmp_path), mode="RGB", json_file=split)
    dl = DataLoader(ds, batch_size=7, shuffle=True, weighted=True, device_put=False, seed=1)
    names = []
    for epoch in range(30):
        dl.set_epoch(epoch)
        for b in dl:
            names += [n for n in b["names"] if n]
    corn = sum("box50" in n for n in names) / len(names)
    # 1 corn of 7 images unweighted ~14%; inverse-frequency weighting -> ~50%
    assert corn > 0.3


def test_native_reader_matches_numpy(tmp_path, rng):
    from hyperpri_tpu.data.native_io import get_library

    if get_library() is None:
        pytest.skip("native IO library not built (make -C runtime)")
    for il in ["bil", "bip", "bsq"]:
        cube = (rng.random((19, 23, 11)) * 50).astype(np.float32)
        hdr, dat = str(tmp_path / f"n_{il}.hdr"), str(tmp_path / f"n_{il}.dat")
        write_envi(hdr, dat, cube, interleave=il)
        a = read_cube(hdr, dat, 2, 9, use_native=True)
        b = read_cube(hdr, dat, 2, 9, use_native=False)
        np.testing.assert_array_equal(a, b)


def test_dataset_lru_cache(synth, monkeypatch):
    import hyperpri_tpu.data.dataset as dsmod

    ds = HyperpriDataset(synth["root"], mode="RGB", json_file=synth["splits"]["train"],
                         cache_items=2)
    calls = {"n": 0}
    orig = dsmod.HyperpriDataset._load_raw

    def counting(self, i):
        calls["n"] += 1
        return orig(self, i)

    monkeypatch.setattr(dsmod.HyperpriDataset, "_load_raw", counting)
    a1 = ds[0]; a2 = ds[1]; a3 = ds[0]  # hit
    assert calls["n"] == 2
    np.testing.assert_array_equal(a1["image"], a3["image"])
    ds[2]  # evicts LRU (item 1)
    ds[1]  # miss again
    assert calls["n"] == 4
    # uncached dataset loads every time
    ds0 = HyperpriDataset(synth["root"], mode="RGB", json_file=synth["splits"]["train"])
    monkeypatch.setattr(dsmod.HyperpriDataset, "_load_raw", counting)
    ds0[0]; ds0[0]
    assert calls["n"] == 6


def test_collate_cyclic_pad_keeps_bn_stats_on_distribution():
    # Pad rows must be copies of real samples, not zeros: BatchNorm batch
    # statistics see the whole fixed-shape batch (ADVICE r1).
    samples = [
        {"image": np.full((4, 4, 3), 7.0, np.float32),
         "mask": np.ones((4, 4, 1), np.float32), "index": "a"},
        {"image": np.full((4, 4, 3), 3.0, np.float32),
         "mask": np.zeros((4, 4, 1), np.float32), "index": "b"},
    ]
    b = collate(samples, 5)
    np.testing.assert_array_equal(b["valid"], [1, 1, 0, 0, 0])
    # wrap-around: a, b, a, b, a
    np.testing.assert_array_equal(b["image"][2], b["image"][0])
    np.testing.assert_array_equal(b["image"][3], b["image"][1])
    np.testing.assert_array_equal(b["image"][4], b["image"][0])
    assert b["names"] == ["a", "b", "", "", ""]


def test_loader_probe_is_host_side_and_threadless(synth):
    import threading

    ds = HyperpriDataset(synth["root"], mode="RGB", json_file=synth["splits"]["train"])
    dl = DataLoader(ds, batch_size=3, shuffle=True, seed=3)
    n_threads = threading.active_count()
    b = dl.probe()
    assert isinstance(b["image"], np.ndarray) and b["image"].shape[0] == 1
    assert threading.active_count() == n_threads  # no prefetch producer leaked


def test_dataset_image_dtype_cache_and_loader_pushdown(synth):
    import ml_dtypes

    ds = HyperpriDataset(
        synth["root"], mode="HSI", json_file=synth["splits"]["train"],
        hsi_lo=2, hsi_hi=18, cache_items=8,
    )
    ref = np.asarray(ds[0]["image"], np.float32)
    assert ds[0]["image"].dtype == np.float32

    # Loader pushes its image_dtype into the dataset: decoded cubes are
    # cached already-cast, batches come out bf16 with no loader-side astype.
    dl = DataLoader(
        ds, batch_size=2, shuffle=False, device_put=False,
        image_dtype=ml_dtypes.bfloat16,
    )
    assert ds.image_dtype == np.dtype(ml_dtypes.bfloat16)
    assert ds._cache == {}  # stale f32 cache entries dropped on dtype change
    b = next(iter(dl))
    assert b["image"].dtype == ml_dtypes.bfloat16
    assert b["mask"].dtype == np.float32
    np.testing.assert_allclose(
        np.asarray(b["image"][0], np.float32), ref, rtol=0.01, atol=1e-3
    )
    # cache now holds bf16 decodes; switching back clears again
    assert len(ds._cache) > 0
    ds.set_image_dtype(np.float32)
    assert ds._cache == {}


def test_dataloader_parallel_fetch_matches_sequential(synth):
    ds = HyperpriDataset(
        synth["root"], mode="RGB", json_file=synth["splits"]["train"],
        crop_size=(8, 10),
    )
    seq = DataLoader(ds, batch_size=3, shuffle=True, seed=11, device_put=False,
                     fetch_workers=1)
    par = DataLoader(ds, batch_size=3, shuffle=True, seed=11, device_put=False,
                     fetch_workers=4)
    seq.set_epoch(2)
    par.set_epoch(2)
    for b1, b2 in zip(seq, par):
        assert b1["names"] == b2["names"]
        np.testing.assert_array_equal(b1["image"], b2["image"])
        np.testing.assert_array_equal(b1["mask"], b2["mask"])


def test_native_reader_bf16_matches_numpy(tmp_path, rng):
    """envi_read_slice_bf16 == numpy decode + RNE cast, for every interleave.

    Skips when runtime/build/libhyperpri_io.so is not built."""
    import ml_dtypes

    from hyperpri_tpu.data import native_io

    if native_io.get_library() is None or not hasattr(
        native_io.get_library(), "envi_read_slice_bf16"
    ):
        import pytest as _pytest

        _pytest.skip("native reader not built")
    for interleave in ("bil", "bip", "bsq"):
        cube = rng.normal(size=(9, 13, 7)).astype(np.float32)
        hdr = str(tmp_path / f"b_{interleave}.hdr")
        dat = str(tmp_path / f"b_{interleave}.dat")
        write_envi(hdr, dat, cube, interleave=interleave)
        out = read_cube(hdr, dat, 1, 6, dtype=ml_dtypes.bfloat16)
        assert out.dtype == ml_dtypes.bfloat16
        ref = cube[:, :, 1:6].astype(ml_dtypes.bfloat16)  # numpy RNE
        np.testing.assert_array_equal(
            out.view(np.uint16), ref.view(np.uint16)
        )
    # int16 source (the non-fast gather path)
    cube16 = (rng.normal(size=(6, 8, 5)) * 1000).astype(np.int16)
    hdr = str(tmp_path / "b_i16.hdr")
    dat = str(tmp_path / "b_i16.dat")
    write_envi(hdr, dat, cube16, interleave="bil")
    out = read_cube(hdr, dat, 0, 5, dtype=ml_dtypes.bfloat16)
    ref = cube16[:, :, 0:5].astype(np.float32).astype(ml_dtypes.bfloat16)
    np.testing.assert_array_equal(out.view(np.uint16), ref.view(np.uint16))


def test_disk_cache_golden_vs_envi(tmp_path, rng):
    """On-disk decoded-cube cache: cold write + warm read both match the
    pure-numpy ENVI oracle, byte for byte, for f32 and bf16 windows."""
    import ml_dtypes

    from hyperpri_tpu.data.disk_cache import read_cube_cached

    cube = rng.normal(size=(12, 10, 20)).astype(np.float32)
    hdr, dat = str(tmp_path / "c.hdr"), str(tmp_path / "c.dat")
    write_envi(hdr, dat, cube, interleave="bil")
    cdir = str(tmp_path / "cache")

    for dtype in (np.float32, ml_dtypes.bfloat16):
        ref = read_cube(hdr, dat, 3, 17, dtype=dtype)
        cold = read_cube_cached(hdr, dat, 3, 17, dtype=dtype, cache_dir=cdir)
        np.testing.assert_array_equal(np.asarray(cold), np.asarray(ref))
        warm = read_cube_cached(hdr, dat, 3, 17, dtype=dtype, cache_dir=cdir)
        np.testing.assert_array_equal(np.asarray(warm), np.asarray(ref))
    # two dtypes x one window -> two .bin entries
    assert len([n for n in os.listdir(cdir) if n.endswith(".bin")]) == 2


def test_disk_cache_invalidation_and_damage(tmp_path, rng):
    """Source edits (mtime/size) miss cleanly; truncated entries re-decode."""
    import time as _time

    from hyperpri_tpu.data.disk_cache import cache_key, read_cube_cached

    cube = rng.normal(size=(8, 6, 10)).astype(np.float32)
    hdr, dat = str(tmp_path / "c.hdr"), str(tmp_path / "c.dat")
    write_envi(hdr, dat, cube, interleave="bsq")
    cdir = str(tmp_path / "cache")

    out1 = read_cube_cached(hdr, dat, 0, 10, cache_dir=cdir)
    key1 = cache_key(hdr, dat, 0, 10, np.float32)

    # damage the entry: a truncated .bin must be ignored and re-decoded
    bin1 = os.path.join(cdir, key1 + ".bin")
    with open(bin1, "wb") as f:
        f.write(b"xx")
    np.testing.assert_array_equal(read_cube_cached(hdr, dat, 0, 10, cache_dir=cdir), out1)
    assert os.path.getsize(bin1) == out1.nbytes  # rewritten

    # editing the source changes the key (no stale hit)
    cube2 = cube + 1.0
    _time.sleep(0.01)
    write_envi(hdr, dat, cube2, interleave="bsq")
    assert cache_key(hdr, dat, 0, 10, np.float32) != key1
    np.testing.assert_allclose(
        read_cube_cached(hdr, dat, 0, 10, cache_dir=cdir), cube2, rtol=0, atol=0
    )


def test_disk_cache_sweep_evicts_to_cap(tmp_path, rng):
    from hyperpri_tpu.data.disk_cache import read_cube_cached, sweep_cache

    cdir = str(tmp_path / "cache")
    sizes = []
    for i in range(3):
        cube = rng.normal(size=(6, 5, 4 + i)).astype(np.float32)
        hdr, dat = str(tmp_path / f"c{i}.hdr"), str(tmp_path / f"c{i}.dat")
        write_envi(hdr, dat, cube)
        out = read_cube_cached(hdr, dat, cache_dir=cdir)
        sizes.append(out.nbytes)
    total = sum(sizes)
    freed = sweep_cache(cdir, total - 1)  # must evict at least the oldest
    assert freed >= sizes[0]
    remaining = sum(
        os.path.getsize(os.path.join(cdir, n))
        for n in os.listdir(cdir) if n.endswith(".bin")
    )
    assert remaining <= total - 1


def test_dataset_uses_disk_cache(synth, tmp_path):
    """HyperpriDataset(decoded_cache_dir=...) serves identical items and
    populates the cache once per cube."""
    root, json_file = synth["root"], synth["splits"]["train"]
    cdir = str(tmp_path / "dcache")
    plain = HyperpriDataset(root=root, mode="HSI", hsi_lo=2, hsi_hi=9, json_file=json_file)
    cached = HyperpriDataset(
        root=root, mode="HSI", hsi_lo=2, hsi_hi=9, json_file=json_file,
        decoded_cache_dir=cdir,
    )
    for i in range(len(plain)):
        a, b = plain[i], cached[i]
        np.testing.assert_array_equal(a["image"], b["image"])
        np.testing.assert_array_equal(a["mask"], b["mask"])
    n_bins = len([n for n in os.listdir(cdir) if n.endswith(".bin")])
    assert n_bins == len(plain)
    # second pass is served from disk, still identical
    for i in range(len(plain)):
        np.testing.assert_array_equal(plain[i]["image"], cached[i]["image"])
