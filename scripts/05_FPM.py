#!/usr/bin/env python
"""Numbered entry point: the fpm pipeline with the shared CLI
(see fairmultimodal_tpu/cli/main.py; reference script FinalCode/New/Final/05_FPM*)."""

import sys

from fairmultimodal_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main(default_pipeline="fpm"))
