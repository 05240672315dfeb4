"""``irtpu`` — ergonomic alias for the full package name.

``import irtpu`` / ``import irtpu.ops.pooling`` resolve to the *same module
objects* as ``image_retrieval_for_image_based_localization_tpu``: every
submodule is imported once and registered in ``sys.modules`` under both
names. (Sharing ``__path__`` instead would re-execute modules into distinct
objects and break ``isinstance`` across the two import spellings.)
"""

import importlib
import pkgutil
import sys

import image_retrieval_for_image_based_localization_tpu as _pkg
from image_retrieval_for_image_based_localization_tpu import *  # noqa: F401,F403
from image_retrieval_for_image_based_localization_tpu import __version__  # noqa: F401

_PREFIX = _pkg.__name__ + "."
for _info in pkgutil.walk_packages(_pkg.__path__, prefix=_PREFIX):
    try:
        _mod = importlib.import_module(_info.name)
    except Exception:  # optional deps (e.g. torch-only helpers) stay lazy
        continue
    sys.modules["irtpu." + _info.name[len(_PREFIX):]] = _mod
