"""``irtpu`` — ergonomic alias for the full package name.

``import irtpu`` (or ``import irtpu.ops.pooling``) resolves to
``image_retrieval_for_image_based_localization_tpu``; this module simply
shares that package's ``__path__`` so all submodules are importable under
both names.
"""

import image_retrieval_for_image_based_localization_tpu as _pkg
from image_retrieval_for_image_based_localization_tpu import *  # noqa: F401,F403
from image_retrieval_for_image_based_localization_tpu import __version__  # noqa: F401

__path__ = _pkg.__path__
