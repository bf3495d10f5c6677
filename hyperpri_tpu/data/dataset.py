"""HyperPRI dataset: (RGB PNG | gray | ENVI HSI cube) + mask PNG pairs.

Behavioral parity target: /root/reference/src/dataset.py (HyperpriDataset):
  - modes 'rgb' / 'gray' / 'hsi' (dataset.py:256-271); gray loads L and
    replicates to 3 channels (dataset.py:259-260)
  - RGB images rotated 90 deg when W < H to normalize orientation; HSI cubes
    are NOT rotated (dataset.py:277-279)
  - band window [hsi_lo, hsi_hi), with hsi_hi <= 0 meaning 299 + hsi_hi
    (dataset.py:55-57)
  - paired random crop: image and mask get the identical crop. The reference
    saves/restores torch RNG state around the two transforms
    (dataset.py:283-293); here one numpy Generator draws one offset used for
    both — same guarantee, no global state.
  - post-transform normalization: if img.max() > 10, divide by 255
    (dataset.py:288-289). RGB is pre-scaled to [0,1] so this hits exactly
    when the reference's ToTensor would have; un-augmented HSI reflectance
    passes through untouched (the reference skips img_transform entirely).
  - labels binarized with (value > 0): nodules/pegs merged into the root
    class (dataset.py:294-295)
  - inverse-frequency sample_weights computed (dataset.py:76-82) — and, like
    the reference, not used by the default loader.

TPU-first: everything is channel-last numpy float32 ((H, W, C) images,
(H, W, 1) masks), so batches device-put with zero layout shuffling.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from hyperpri_tpu.data.splits import DEFAULT_CLASS_LIST, SplitIndex, parse_split_json

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


def _load_png(path: str, mode: str) -> np.ndarray:
    if Image is None:
        raise RuntimeError("PIL is required for PNG I/O")
    img = Image.open(path)
    return np.asarray(img.convert(mode))


class HyperpriDataset:
    """Map-style dataset over a resolved split index.

    Items are dicts {'image', 'mask', 'index', 'label'} mirroring the
    reference's __getitem__ contract (dataset.py:249-298), with 'image'
    (H, W, C) channel-last in `image_dtype` (float32 default; bf16 for the
    TPU ingest path) and 'mask' (H, W, 1) float32 in {0, 1}.
    """

    def __init__(
        self,
        root: str,
        mode: str = "RGB",
        crop_size: Optional[Tuple[int, int]] = None,
        subset: Optional[List[str]] = None,
        hsi_lo: int = 0,
        hsi_hi: int = 0,
        json_file: Optional[str] = None,
        json_verb: bool = False,
        unsqueeze_img: bool = False,  # accepted for API parity; NHWC needs no axis
        seed: int = 0,
        cache_items: int = 0,
        image_dtype=np.float32,
        decoded_cache_dir: Optional[str] = None,
    ):
        if json_file is None:
            raise ValueError("hyperpri_tpu requires a split JSON (the reference's "
                             "directory-walk path is legacy/dead, dataset.py:84)")
        assert hsi_lo >= 0
        if hsi_hi <= 0:
            hsi_hi = 299 + hsi_hi  # dataset.py:55-57
        assert hsi_lo < hsi_hi

        self.root = root
        self.mode = mode.lower()
        self.crop_size = tuple(crop_size) if crop_size else None
        self.class_list = subset if subset is not None else list(DEFAULT_CLASS_LIST)
        self.hsi_lo = hsi_lo
        self.hsi_hi = hsi_hi
        self.unsqueeze_img = unsqueeze_img
        self.index: SplitIndex = parse_split_json(
            json_file, root, mode=self.mode, class_list=self.class_list, verbose=json_verb
        )
        self.files = self.index.entries
        self.sample_weights = np.asarray(self.index.sample_weights(self.class_list))
        self._rng = np.random.default_rng(seed)
        # Decoded-image LRU: the reference re-reads every ~267 MB cube every
        # epoch (SURVEY.md §3.1); with cache_items > 0 decoded (image, label)
        # pairs are kept in host RAM (pre-crop, so augmentation stays fresh).
        self._cache_items = cache_items
        self._cache: "dict[int, tuple]" = {}
        # On-disk decoded-cube cache (data/disk_cache.py): cold processes
        # re-read the decoded (H, W, B) window sequentially instead of
        # re-paying the reference's per-epoch ENVI gather (dataset.py:265-268).
        self.decoded_cache_dir = decoded_cache_dir
        # Returned/cached image dtype. ml_dtypes.bfloat16 moves the f32->bf16
        # cast to decode time (once per cube, amortized by the LRU) instead of
        # once per epoch in the loader: warm-epoch collate touches half the
        # bytes and the per-batch 1.1 GB astype disappears.
        self.image_dtype = np.dtype(image_dtype)

    def set_cache_items(self, n: int) -> int:
        """Resize the decoded-image LRU; returns the previous size (evicting
        oldest entries if shrinking, clearing entirely at n <= 0)."""
        old = self._cache_items
        self._cache_items = n
        if n <= 0:
            self._cache.clear()
        else:
            while len(self._cache) > n:
                self._cache.pop(next(iter(self._cache)))
        return old

    def set_image_dtype(self, dtype) -> None:
        """Change the returned image dtype; drops cache entries of the old
        dtype so the cache never serves stale-dtype arrays."""
        dtype = np.dtype(dtype)
        if dtype != self.image_dtype:
            self.image_dtype = dtype
            self._cache.clear()

    def __len__(self) -> int:
        return len(self.files)

    @property
    def n_channels(self) -> int:
        if self.mode == "hsi":
            return self.hsi_hi - self.hsi_lo
        return 3

    def image_shape(self) -> Optional[Tuple[int, int]]:
        if self.crop_size:
            return self.crop_size
        return None

    def _load_raw(self, i: int):
        entry = self.files[i]
        if self.mode == "hsi":
            # Decode straight into the target dtype: the native reader emits
            # bf16 in-gather (runtime/envi_reader.cc envi_read_slice_bf16),
            # the numpy fallback casts in its final ascontiguousarray. With a
            # decoded_cache_dir the result persists on disk across processes.
            from hyperpri_tpu.data.disk_cache import read_cube_cached

            img = read_cube_cached(
                entry.hdr, entry.dat, self.hsi_lo, self.hsi_hi,
                dtype=self.image_dtype, cache_dir=self.decoded_cache_dir,
            )
        elif self.mode == "gray":
            g = _load_png(entry.img, "L").astype(np.float32) / 255.0
            img = np.repeat(g[..., None], 3, axis=-1)
        else:  # rgb
            img = _load_png(entry.img, "RGB").astype(np.float32) / 255.0

        label = _load_png(entry.label, "L")

        # Orientation: RGB/gray rotated when wider than tall in PIL terms
        # (W < H after the PIL size convention), HSI untouched
        # (dataset.py:277-279). PIL ROTATE_90 == np.rot90 counter-clockwise.
        if self.mode != "hsi" and img.shape[1] < img.shape[0]:
            img = np.rot90(img, 1, axes=(0, 1))
            label = np.rot90(label, 1, axes=(0, 1))
        return img, label

    def __getitem__(self, i: int, rng: Optional[np.random.Generator] = None) -> Dict:
        entry = self.files[i]
        rng = rng or self._rng

        if self._cache_items > 0:
            if i in self._cache:
                img, label = self._cache.pop(i)  # re-insert: LRU order
            else:
                img, label = self._load_raw(i)
                while len(self._cache) >= self._cache_items:
                    self._cache.pop(next(iter(self._cache)))
            self._cache[i] = (img, label)
        else:
            img, label = self._load_raw(i)

        if self.crop_size is not None:
            img, label = paired_random_crop(img, label, self.crop_size, rng)

        # Reference's defensive rescale after the transform (dataset.py:288-289).
        if self.crop_size is not None and img.max() > 10:
            img = img / 255.0

        mask = (np.asarray(label) > 0).astype(np.float32)[..., None]
        return {
            "image": np.ascontiguousarray(img, dtype=self.image_dtype),
            "mask": mask,
            "index": entry.name,
            "label": entry.label,
        }


def paired_random_crop(
    img: np.ndarray, label: np.ndarray, size: Tuple[int, int], rng: np.random.Generator
):
    """Crop image and mask with one shared offset (the reference's RNG
    save/restore trick, dataset.py:283-293, without global RNG state).

    Pads symmetrically if the image is smaller than the crop (torchvision
    RandomCrop would raise; HyperPRI images are always >= patch size)."""
    th, tw = size
    h, w = img.shape[:2]
    if h < th or w < tw:
        ph, pw = max(0, th - h), max(0, tw - w)
        img = np.pad(img, ((0, ph), (0, pw), (0, 0)))
        label = np.pad(label, ((0, ph), (0, pw)))
        h, w = img.shape[:2]
    top = int(rng.integers(0, h - th + 1))
    left = int(rng.integers(0, w - tw + 1))
    return img[top : top + th, left : left + tw], label[top : top + th, left : left + tw]
