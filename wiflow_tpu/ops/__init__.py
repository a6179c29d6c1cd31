from wiflow_tpu.ops.conv import (
    causal_grouped_conv1d, conv1x1_2d, conv1xk_w, conv3x3_2d,
    pointwise_conv1d,
)
from wiflow_tpu.ops.norm import (
    batch_norm_eval, batch_norm_train, dropout, dropout2d,
)
