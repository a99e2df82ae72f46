#!/usr/bin/env python
"""Numbered entry point: the fairehrclp pipeline with the shared CLI
(see fairmultimodal_tpu/cli/main.py; reference script FinalCode/New/Final/06_FairEHR-CLP*)."""

import sys

from fairmultimodal_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main(default_pipeline="fairehrclp"))
