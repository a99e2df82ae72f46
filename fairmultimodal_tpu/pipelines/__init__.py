"""End-to-end experiment pipelines: the engines behind the numbered scripts
(00_data .. 10_FAME) and the CLI.
"""

from fairmultimodal_tpu.pipelines.fame import run_fame_experiment, FAMEPipelineConfig

__all__ = ["run_fame_experiment", "FAMEPipelineConfig"]
