#!/usr/bin/env python
"""5-fold segmaps driver — see hyperpri_tpu/cli.py (reference: kfold_segmaps.py)."""
from hyperpri_tpu.cli import kfold_segmaps

if __name__ == "__main__":
    kfold_segmaps()
