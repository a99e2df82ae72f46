"""Model zoo: Flax encoders and fusion heads mirroring the reference's
model families (BEHRT-Demo, BEHRT-Lab, BioClinicalBERT, fusion variants).
"""

from fairmultimodal_tpu.models.bert import BertConfig, BertEncoderModel
from fairmultimodal_tpu.models.behrt import (
    BEHRTDemo,
    BEHRTLab,
    BEHRTCombined,
)
from fairmultimodal_tpu.models.fusion import (
    FAMEFusion,
    FAMEModel,
    AverageFusionModel,
    SigmoidFusionModel,
    DfCModel,
    EDDIFusionModel,
)
from fairmultimodal_tpu.models.text import (
    TextEncoder,
    encode_note_chunks,
)
from fairmultimodal_tpu.models.baselines import (
    BEHRTFull,
    StructTextModel,
    TextOnlyClassifier,
    SigmoidFusionFull,
    EDDIFusionFull,
    BEHRTLabOnlyModel,
)
from fairmultimodal_tpu.models.fairehr import (
    FairEHRCLP,
    contrastive_loss,
)
from fairmultimodal_tpu.models.legacy import (
    BEHRTSequence,
    EDDIDotFusion,
    EDDIEnhancementLayer,
)

__all__ = [
    "BertConfig",
    "BertEncoderModel",
    "BEHRTDemo",
    "BEHRTLab",
    "BEHRTCombined",
    "FAMEFusion",
    "FAMEModel",
    "AverageFusionModel",
    "SigmoidFusionModel",
    "DfCModel",
    "EDDIFusionModel",
    "TextEncoder",
    "encode_note_chunks",
    "BEHRTFull",
    "StructTextModel",
    "TextOnlyClassifier",
    "SigmoidFusionFull",
    "EDDIFusionFull",
    "BEHRTLabOnlyModel",
    "FairEHRCLP",
    "contrastive_loss",
    "BEHRTSequence",
    "EDDIDotFusion",
    "EDDIEnhancementLayer",
]
