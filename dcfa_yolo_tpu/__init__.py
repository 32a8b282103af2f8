"""dcfa_yolo_tpu — a TPU-native (JAX/XLA/Pallas/pjit) dual-modal anchor-free detector
framework with the capabilities of heitieya/DCFA-YOLO.

This is a from-scratch rebuild, not a port: the compute path is functional JAX in NHWC
layout compiled by XLA onto the TPU MXU, inference is one jit program (preprocess →
dual-backbone forward → DFL decode → fixed-shape NMS) with no host round-trips, and
data parallelism is expressed with `jax.sharding` meshes instead of process-group
wrappers. See SURVEY.md for the structural map of the reference this mirrors.
"""

__version__ = "0.1.0"

from dcfa_yolo_tpu.config import ModelConfig, TrainConfig, DataConfig, EvalConfig

__all__ = ["ModelConfig", "TrainConfig", "DataConfig", "EvalConfig", "__version__"]
