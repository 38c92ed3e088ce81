from fall_multimodal_tpu.models.fusion import (
    STGCANClassifier,
    ThreeStreamGSTCAN,
    TwoStreamSTGCAN,
)
from fall_multimodal_tpu.models.registry import (
    build_model,
    model_names,
    register,
    uses_sensor,
)
from fall_multimodal_tpu.models.sensors import (
    BiLSTMHead,
    Cnn1d,
    CnnBiLSTMHead,
    build_sensor_encoder,
)
from fall_multimodal_tpu.models.stgcan import (
    STGCANBackbone,
    STGCANBlock,
    motion_stream,
)

__all__ = [
    "BiLSTMHead",
    "Cnn1d",
    "CnnBiLSTMHead",
    "STGCANBackbone",
    "STGCANBlock",
    "STGCANClassifier",
    "ThreeStreamGSTCAN",
    "TwoStreamSTGCAN",
    "build_model",
    "build_sensor_encoder",
    "model_names",
    "motion_stream",
    "register",
    "uses_sensor",
]
