"""openset_imagenet_tpu — TPU-native open-set ImageNet framework.

A ground-up JAX/XLA/Pallas/pjit re-design with the capabilities of
AIML-IfI/openset-imagenet (WACV 2023, arXiv 2210.06789): WordNet-derived
open-set protocols, a two-head ResNet-50 trained under three loss regimes
(softmax / garbage / entropic open-set), on-device confidence validation,
feature/score extraction, and the full OSCR evaluation + plotting stack.
"""

__version__ = "0.1.0"

# Optional platform override (e.g. OSI_JAX_PLATFORM=cpu for CI/verification
# on hosts where a site hook pins another platform before user code runs).
import os as _os

if _os.environ.get("OSI_JAX_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["OSI_JAX_PLATFORM"])

from . import config as util_config  # noqa: F401
from .config import NameSpace, load_yaml  # noqa: F401
from .dataset import ImagenetDataset  # noqa: F401
from .models.resnet import ResNet50  # noqa: F401
from .ops.losses import (  # noqa: F401
    AverageMeter,
    EarlyStopping,
    entropic_openset_loss,
    garbage_loss,
    softmax_loss,
)
from .ops.metrics import confidence  # noqa: F401
from .ops.oscr import calculate_oscr  # noqa: F401
from .protocol import OpenSetProtocol  # noqa: F401

# Subpackages commonly used as `openset_imagenet_tpu.X`
from . import dataset, logger  # noqa: F401
from . import util  # noqa: F401
from . import checkpoint, events, pipeline, transforms, wordnet  # noqa: F401
from . import metrics, losses  # noqa: F401  (reference-style aliases)
# The reference's bare `import openset_imagenet` exposes `.train`
# (reference __init__.py:5) — keep that contract so `osi.train.worker(cfg)`
# works without an explicit submodule import.
from . import train  # noqa: F401
