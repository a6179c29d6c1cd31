from wiflow_tpu.data.augment import (add_noise, apply_mask_spans, augment_batch, random_scaling, subcarrier_masking, time_masking)
from wiflow_tpu.data.dataset import CSIKeypointsDataset
from wiflow_tpu.data.preprocess import (
    clean_single_frame_zeros, clean_zero_keypoints_temporal,
    load_keypoints_csv, preprocess_csi_data, window_csi,
)
from wiflow_tpu.data.splits import expand_to_samples, file_level_split, infer_subject, loso_split
from wiflow_tpu.data.synthetic import generate_raw_dataset, make_preprocessed_dataset
