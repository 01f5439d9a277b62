"""Fused XLSR-frontend + backend models.

Parity targets:
- ssl_resnet34 (reference: models/senet.py:162-185): wave -> XLSR features
  -> SE-ResNet34 -> (com, des).
- ssl_lcnn (reference: models/lcnn.py:244-267): wave -> XLSR -> LCNN
  (asoftmax=False) -> logits.
- total_cnn_net (reference: models/cnn.py:191-208): wave -> XLSR -> cnn_net.
- OCCM dual branch (reference: models/occm.py:48-67): wave -> XLSR ->
  (SE-ResNet34 branch, LCNN branch) -> ((com, des), lcnn_logits).

The reference inserts a channel dim on NCHW ([B,1,frames,1024]); here the
backends are NHWC so the channel goes last ([B,frames,1024,1]).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn

from occm_tpu.config import XLSRConfig
from occm_tpu.models.cnn import CNNNet
from occm_tpu.models.lcnn import LCNN
from occm_tpu.models.senet import SEResNet
from occm_tpu.models.xlsr import XLSREncoder


def _features_nhwc(feats):
    return feats[..., None]  # [B, frames, feat] -> [B, frames, feat, 1]


class SSLResNet34(nn.Module):
    """reference: models/senet.py:162-185."""

    xlsr_cfg: Optional[XLSRConfig] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.xlsr_cfg or XLSRConfig()
        feats = XLSREncoder(cfg, name="frontend")(x, train=train)
        return SEResNet(layers=(3, 4, 6, 3), name="resnet34")(
            _features_nhwc(feats), train=train
        )


class SSLLCNN(nn.Module):
    """reference: models/lcnn.py:244-267 (asoftmax=False by default;
    asoftmax=True gives the AngleLinear head used with AngleLoss,
    reference: oc_training.py:334-335)."""

    xlsr_cfg: Optional[XLSRConfig] = None
    asoftmax: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, eval_mode: bool = False):
        cfg = self.xlsr_cfg or XLSRConfig()
        feats = XLSREncoder(cfg, name="frontend")(x, train=train)
        return LCNN(asoftmax=self.asoftmax, name="lcnn")(
            _features_nhwc(feats), train=train, eval_mode=eval_mode
        )


class TotalCNNNet(nn.Module):
    """reference: models/cnn.py:191-208."""

    xlsr_cfg: Optional[XLSRConfig] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.xlsr_cfg or XLSRConfig()
        feats = XLSREncoder(cfg, name="frontend")(x, train=train)
        return CNNNet(name="cnn_net")(_features_nhwc(feats), train=train)


class OCCM(nn.Module):
    """Dual-branch OCCM (reference: models/occm.py:48-67)."""

    xlsr_cfg: Optional[XLSRConfig] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.xlsr_cfg or XLSRConfig()
        feats = XLSREncoder(cfg, name="frontend")(x, train=train)
        nhwc = _features_nhwc(feats)
        senet_out = SEResNet(layers=(3, 4, 6, 3), name="senet34_branch")(
            nhwc, train=train
        )
        lcnn_out = LCNN(asoftmax=False, name="lcnn_branch")(
            nhwc, train=train
        )
        return senet_out, lcnn_out
