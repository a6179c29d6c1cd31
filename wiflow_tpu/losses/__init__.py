from wiflow_tpu.losses.pose_loss import pose_loss, bone_lengths, smooth_l1
