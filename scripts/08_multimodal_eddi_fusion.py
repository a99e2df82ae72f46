#!/usr/bin/env python
"""Numbered entry point: the eddi pipeline with the shared CLI
(see fairmultimodal_tpu/cli/main.py; reference script FinalCode/New/Final/08_multimodal_eddi_fusion*)."""

import sys

from fairmultimodal_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main(default_pipeline="eddi"))
