#!/usr/bin/env python
"""5-fold validate driver — see hyperpri_tpu/cli.py (reference: kfold_validate.py)."""
from hyperpri_tpu.cli import kfold_validate

if __name__ == "__main__":
    kfold_validate()
