"""Model zoo. Importing this package populates the MODELS registry
(role of models/__init__.py + models/build.py in the reference)."""
from ..utils.registry import MODELS
from . import dae_dgcnn      # noqa: F401
from . import transformer    # noqa: F401
from . import dae_pointnet   # noqa: F401
from . import dae_pointnet2  # noqa: F401
from . import point_mae      # noqa: F401
from . import masksurf       # noqa: F401
from . import partseg        # noqa: F401
from . import m2ae           # noqa: F401
from . import maskfeat       # noqa: F401
from . import mlmae          # noqa: F401
from . import detr3          # noqa: F401
from . import dvae           # noqa: F401


def build_model_from_cfg(cfg):
    """MODELS.build equivalent: cfg.NAME selects the constructor; the whole
    model config is passed through (reference models/build.py)."""
    return MODELS.build(cfg)
