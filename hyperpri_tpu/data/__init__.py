from hyperpri_tpu.data.dataset import HyperpriDataset, paired_random_crop
from hyperpri_tpu.data.envi import EnviHeader, parse_envi_header, read_cube, write_envi
from hyperpri_tpu.data.pipeline import DataLoader, collate
from hyperpri_tpu.data.splits import SplitEntry, SplitIndex, parse_split_json, write_split_json
from hyperpri_tpu.data.synthetic import make_synthetic_dataset

__all__ = [
    "HyperpriDataset",
    "paired_random_crop",
    "EnviHeader",
    "parse_envi_header",
    "read_cube",
    "write_envi",
    "DataLoader",
    "collate",
    "SplitEntry",
    "SplitIndex",
    "parse_split_json",
    "write_split_json",
    "make_synthetic_dataset",
]
