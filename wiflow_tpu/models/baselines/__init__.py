from wiflow_tpu.models.baselines.hpeli import HPELiMMFi, HPELiNet, SKConv, SKUnit
from wiflow_tpu.models.baselines.performer import Performer, PerformerAttention
from wiflow_tpu.models.baselines.perunet import PerUnet, PerUnetMMFi
from wiflow_tpu.models.baselines.wisppn import (
    WiSPPN, convert_csi_format, extract_keypoints_from_pam,
)
from wiflow_tpu.models.baselines.sknet_trans import (
    AdditiveAttention, DSKNetTrans, GlobalContextAttention,
    MultiAxisAttention, MultiHeadAttention, RegressionHead, SelfAttention,
)
from wiflow_tpu.models.baselines.wpformer import (
    ChannelTransformer, WPformer, wpformer_mmfi,
)
from wiflow_tpu.models.baselines.hpeli_zoo import (
    BasicCnnHPE, DSKNetTransMMFi, DSKNetTransWipose, HPEWiPoseModel,
    OriginalHPE, SKConvSelective, SKConvTrans, SKConvV2, SKUnitSelective,
    SKUnitTrans, SKUnitV2,
)
