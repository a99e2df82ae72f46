"""Shared CLI for all numbered entry points.

The reference README documents a common CLI (``--task --epochs --bsz --lr
--lambda --beta --seed`` plus data/output dirs, README.md:145-189) that the
scripts never actually implement (argparse imported, never used — SURVEY.md
§0).  This package provides that promised surface for real: one parser, one
dispatch table, numbered wrappers under ``scripts/``.
"""

from fairmultimodal_tpu.cli.main import build_parser, main, run_pipeline

__all__ = ["build_parser", "main", "run_pipeline"]
