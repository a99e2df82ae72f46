#!/usr/bin/env python
"""Numbered entry point: the bioclinicalbert pipeline with the shared CLI
(see fairmultimodal_tpu/cli/main.py; reference script FinalCode/New/Final/02_BioClinicalBERT*)."""

import sys

from fairmultimodal_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main(default_pipeline="bioclinicalbert"))
