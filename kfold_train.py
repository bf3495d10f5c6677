#!/usr/bin/env python
"""5-fold train driver — see hyperpri_tpu/cli.py (reference: kfold_train.py)."""
from hyperpri_tpu.cli import kfold_train

if __name__ == "__main__":
    kfold_train()
