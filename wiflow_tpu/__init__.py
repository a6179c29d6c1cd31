"""wiflow_tpu — TPU-native WiFi pose-estimation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
repo ``DY2434/WiFlow-WiFi-Pose-Estimation-with-Spatio-Temporal-Decoupling``
(WiFlow: 2-D human pose regression from 540x20 WiFi-CSI windows, plus the
baseline suite and the MM-Fi cross-dataset benchmark).

Design stance (not a port):
  * channel-last activations everywhere; convs lowered to tap-wise matmuls
    that tile cleanly onto the TPU MXU,
  * bf16 compute / fp32 params (replaces CUDA AMP + GradScaler),
  * data-parallel scaling via ``jax.sharding`` GSPMD over an ICI mesh
    (replaces ``nn.DataParallel`` / the reference's dead NCCL code),
  * whole dataset staged in HBM; epochs run as ``lax.scan`` (replaces
    the reference's single-process ``DataLoader`` bottleneck).
"""

__version__ = "0.1.0"
