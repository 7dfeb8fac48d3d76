"""API-parity alias: ``openset_imagenet_tpu.losses`` == reference
``openset_imagenet.losses`` (``losses.py:7-94``)."""

from .ops.losses import (  # noqa: F401
    AverageMeter,
    EarlyStopping,
    entropic_openset_loss,
    garbage_loss,
    softmax_loss,
)
