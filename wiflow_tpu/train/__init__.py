from wiflow_tpu.train.loop import TrainResult, train_pose_model
from wiflow_tpu.train.optim import (
    EarlyStopping, ReduceLROnPlateau, get_learning_rate, make_optimizer,
    set_learning_rate,
)
from wiflow_tpu.train.steps import (
    TEST_THRESHOLDS, TrainState, create_train_state, make_batch_indices,
    make_step_fns,
)
