#!/usr/bin/env python
"""Numbered entry point: the behrt pipeline with the shared CLI
(see fairmultimodal_tpu/cli/main.py; reference script FinalCode/New/Final/01_BEHRT*)."""

import sys

from fairmultimodal_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main(default_pipeline="behrt"))
