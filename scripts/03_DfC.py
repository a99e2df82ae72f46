#!/usr/bin/env python
"""Numbered entry point: the dfc pipeline with the shared CLI
(see fairmultimodal_tpu/cli/main.py; reference script FinalCode/New/Final/03_DfC*)."""

import sys

from fairmultimodal_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main(default_pipeline="dfc"))
