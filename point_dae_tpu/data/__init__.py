from . import corruptions
from . import corruptions_patch

__all__ = ["corruptions", "corruptions_patch"]
