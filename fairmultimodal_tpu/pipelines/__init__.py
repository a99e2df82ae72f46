"""End-to-end experiment pipelines: the engines behind the numbered scripts
(00_data .. 10_FAME) and the CLI.

Mapping to the reference scripts (FinalCode/New/Final/):

========  =====================================  ==============================
script    pipeline                               engine
========  =====================================  ==============================
00_data   fairmultimodal_tpu.data.etl            host ETL
01        run_behrt_experiment                   structured-only BEHRT
02        run_text_only_experiment               frozen BioClinicalBERT + MLP
03        run_dfc_experiment                     demographics-free fusion
04        run_adv_debias_experiment              2-stage adversarial debiasing
05        run_fame_experiment(head=1000, λ=1.0)  FAME variant (05_FPM)
06        run_fairehr_clp_experiment             FairEHR-CLP (ref-behavior avg)
07        run_average_fusion_experiment          concat fusion + extraction
08        run_eddi_fusion_experiment             batch-EDDI logit weighting
09        run_sigmoid_fusion_experiment          sigmoid-gate fusion
10        run_fame_experiment                    full FAME
==========================================================================
"""

from fairmultimodal_tpu.pipelines.adv_debias import (
    AdvDebiasPipelineConfig,
    run_adv_debias_experiment,
)
from fairmultimodal_tpu.pipelines.average_fusion import (
    AverageFusionPipelineConfig,
    run_average_fusion_experiment,
)
from fairmultimodal_tpu.pipelines.behrt import (
    BEHRTPipelineConfig,
    run_behrt_experiment,
)
from fairmultimodal_tpu.pipelines.dfc import DfCPipelineConfig, run_dfc_experiment
from fairmultimodal_tpu.pipelines.eddi_fusion import (
    EDDIFusionPipelineConfig,
    run_eddi_fusion_experiment,
)
from fairmultimodal_tpu.pipelines.fairehr_clp import (
    FairEHRCLPPipelineConfig,
    run_fairehr_clp_experiment,
)
from fairmultimodal_tpu.pipelines.fame import FAMEPipelineConfig, run_fame_experiment
from fairmultimodal_tpu.pipelines.legacy import (
    LegacyBEHRTPipelineConfig,
    LegacyEDDIPipelineConfig,
    run_legacy_behrt_experiment,
    run_legacy_eddi_experiment,
)
from fairmultimodal_tpu.pipelines.sigmoid_fusion import (
    SigmoidFusionPipelineConfig,
    run_sigmoid_fusion_experiment,
)
from fairmultimodal_tpu.pipelines.text_only import (
    TextOnlyPipelineConfig,
    run_text_only_experiment,
)

__all__ = [
    "FAMEPipelineConfig", "run_fame_experiment",
    "BEHRTPipelineConfig", "run_behrt_experiment",
    "TextOnlyPipelineConfig", "run_text_only_experiment",
    "DfCPipelineConfig", "run_dfc_experiment",
    "AdvDebiasPipelineConfig", "run_adv_debias_experiment",
    "FairEHRCLPPipelineConfig", "run_fairehr_clp_experiment",
    "AverageFusionPipelineConfig", "run_average_fusion_experiment",
    "EDDIFusionPipelineConfig", "run_eddi_fusion_experiment",
    "SigmoidFusionPipelineConfig", "run_sigmoid_fusion_experiment",
    "LegacyBEHRTPipelineConfig", "run_legacy_behrt_experiment",
    "LegacyEDDIPipelineConfig", "run_legacy_eddi_experiment",
]
