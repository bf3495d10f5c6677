"""Property-based robustness tests for the ENVI parser and the torch-import
key normalizer (TODO.md quality items).

The ENVI reader replaces the reference's `spectral` dependency
(reference dataset.py:17,265-268) and is the first thing a user's real data
hits — malformed headers must produce clear Python exceptions, never
crashes, silent garbage, or OS-level faults. The torch-import normalizer
must strip every wrapper-prefix combination the reference's checkpoints can
carry (PLTrainer.py:203-211, 315-327).
"""

import os

import numpy as np
import pytest

from hyperpri_tpu.data.envi import (
    open_memmap,
    parse_envi_header,
    read_cube,
    write_envi,
)
from hyperpri_tpu.train.torch_import import normalize_torch_keys


def write_hdr(tmp_path, text, name="cube.hdr"):
    p = os.path.join(tmp_path, name)
    with open(p, "w") as f:
        f.write(text)
    return p


GOOD = """ENVI
samples = 4
lines = 3
bands = 2
data type = 4
interleave = bil
byte order = 0
header offset = 0
"""


def test_good_header_roundtrip(tmp_path):
    hdr = parse_envi_header(write_hdr(tmp_path, GOOD))
    assert hdr.shape_hwb == (3, 4, 2)
    assert hdr.interleave == "bil"
    assert hdr.dtype == np.float32


@pytest.mark.parametrize(
    "mutation,exc",
    [
        ("no_magic", ValueError),
        ("drop_samples", KeyError),
        ("drop_lines", KeyError),
        ("drop_bands", KeyError),
        ("drop_data type", KeyError),
        ("bad_dtype", ValueError),
        ("bad_interleave", ValueError),
        ("garbage_value", ValueError),
    ],
)
def test_malformed_headers_raise_cleanly(tmp_path, mutation, exc):
    text = GOOD
    if mutation == "no_magic":
        text = text.replace("ENVI\n", "NOPE\n")
    elif mutation.startswith("drop_"):
        field = mutation[len("drop_"):]
        text = "\n".join(
            l for l in text.splitlines() if not l.startswith(field)
        ) + "\n"
    elif mutation == "bad_dtype":
        text = text.replace("data type = 4", "data type = 99")
    elif mutation == "bad_interleave":
        text = text.replace("interleave = bil", "interleave = zzz")
    elif mutation == "garbage_value":
        text = text.replace("samples = 4", "samples = banana")
    with pytest.raises(exc):
        parse_envi_header(write_hdr(tmp_path, text))


def test_header_tolerates_weird_formatting(tmp_path):
    """Case-insensitive keys, extra whitespace, multi-line { } blocks,
    comment-ish junk lines — all within what spectral-written files show."""
    text = (
        "ENVI\n"
        "description = {\n  some multi-line\n  description text }\n"
        "SAMPLES=4\n"
        "Lines   =  3\n"
        "bands\t= 2\n"
        "DATA TYPE = 4\n"
        "interleave = BIL\n"
        "wavelength = {400.0,\n 500.0}\n"
        "this line has no equals sign\n"
    )
    hdr = parse_envi_header(write_hdr(tmp_path, text))
    assert hdr.shape_hwb == (3, 4, 2)


def test_truncated_dat_raises(tmp_path):
    hdr_path = write_hdr(tmp_path, GOOD)
    dat_path = hdr_path.replace(".hdr", ".dat")
    with open(dat_path, "wb") as f:
        f.write(b"\x00" * 7)  # far less than 3*4*2*4 bytes
    hdr = parse_envi_header(hdr_path)
    with pytest.raises(ValueError, match="too small"):
        open_memmap(hdr, dat_path)


def test_band_window_validation(tmp_path):
    cube = np.arange(3 * 4 * 2, dtype=np.float32).reshape(3, 4, 2)
    hdr_path = os.path.join(tmp_path, "c.hdr")
    dat_path = os.path.join(tmp_path, "c.dat")
    write_envi(hdr_path, dat_path, cube, interleave="bil")
    with pytest.raises(ValueError, match="band window"):
        read_cube(hdr_path, dat_path, band_lo=0, band_hi=99)


def test_fuzz_random_headers_never_crash(tmp_path, rng):
    """Random header soup: any outcome is fine except a non-Python crash or
    a successful parse that then produces an inconsistent shape."""
    fields = ["samples", "lines", "bands", "data type", "interleave",
              "byte order", "header offset"]
    values = ["4", "0", "-1", "2.5", "banana", "{1,2}", "", "bil", "bsq", "99"]
    r = np.random.default_rng(0)
    for trial in range(200):
        lines = ["ENVI"]
        for f in fields:
            if r.random() < 0.8:
                lines.append(f"{f} = {values[r.integers(len(values))]}")
        p = write_hdr(tmp_path, "\n".join(lines) + "\n", name=f"f{trial}.hdr")
        try:
            hdr = parse_envi_header(p)
        except (ValueError, KeyError):
            continue
        h, w, b = hdr.shape_hwb
        assert all(isinstance(v, int) for v in (h, w, b))


# ---- torch-import key remapping fuzz ----


def test_normalize_torch_keys_prefix_matrix():
    """Every wrapper-prefix the reference's checkpoints can carry
    (PLTrainer.py:203-211, 315-327) must strip to the same bare key."""
    bare = "inc.double_conv.0.weight"
    prefixes = ["", "m_network.", "module.", "_forward_module.m_network."]
    for pref in prefixes:
        out = normalize_torch_keys({pref + bare: 1})
        assert list(out) == [bare], (pref, list(out))


def test_normalize_torch_keys_lightning_payload():
    raw = {
        "pytorch-lightning_version": "1.9",
        "state_dict": {"m_network.outc.conv.weight": 7},
        "optimizer_states": [{"ignored": True}],
    }
    out = normalize_torch_keys(raw)
    assert out == {"outc.conv.weight": 7}


def test_normalize_torch_keys_drops_feat_ext_and_keeps_rest():
    raw = {
        "m_network.feat_ext.backbone.weight": 0,
        "m_network.down1.maxpool_conv.1.double_conv.0.weight": 1,
    }
    out = normalize_torch_keys(raw)
    assert list(out) == ["down1.maxpool_conv.1.double_conv.0.weight"]


def test_normalize_torch_keys_fuzz_generated_variants(rng):
    """Random compositions of known prefixes + arbitrary suffixes: output
    keys must never retain a known wrapper prefix, and values must survive."""
    r = np.random.default_rng(1)
    prefixes = ["m_network.", "module.", "_forward_module.m_network."]
    stems = ["inc.double_conv.0", "down3.maxpool_conv.1.double_conv.3",
             "up2.up", "outc.conv", "first_layer.0", "bn_e5.1"]
    leaves = ["weight", "bias", "running_mean", "running_var",
              "num_batches_tracked"]
    for _ in range(300):
        pref = prefixes[r.integers(len(prefixes))] if r.random() < 0.7 else ""
        key = f"{stems[r.integers(len(stems))]}.{leaves[r.integers(len(leaves))]}"
        val = float(r.random())
        out = normalize_torch_keys({pref + key: val})
        assert list(out.values()) == [val]
        (ok,) = out.keys()
        assert ok == key
