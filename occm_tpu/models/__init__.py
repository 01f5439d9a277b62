from occm_tpu.models.cnn import (
    CNNNet,
    CNNNetBasic,
    CNNNetComplex,
    CNNNetWithAttention,
    SpatialAttention,
)
from occm_tpu.models.lcnn import LCNN, AngleLinear
from occm_tpu.models.senet import SEResNet, se_resnet34, se_resnet12
from occm_tpu.models.xlsr import XLSREncoder
from occm_tpu.models.aasist import AASISTBackend, AModel
from occm_tpu.models.combined import SSLResNet34, SSLLCNN, TotalCNNNet, OCCM

__all__ = [
    "CNNNet",
    "CNNNetBasic",
    "CNNNetComplex",
    "CNNNetWithAttention",
    "SpatialAttention",
    "LCNN",
    "AngleLinear",
    "SEResNet",
    "se_resnet34",
    "se_resnet12",
    "XLSREncoder",
    "AASISTBackend",
    "AModel",
    "SSLResNet34",
    "SSLLCNN",
    "TotalCNNNet",
    "OCCM",
]
