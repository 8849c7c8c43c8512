"""Import-satisfying stub for ``torchvision`` (not installed in this image).

The reference imports it at module scope (`utils/utils.py:21`,
`networks/ResNet.py:23`) but the measured baseline path never calls it:
transforms are unused, and `load_state_dict_from_url` is only reached with
``pretrained=True`` which no shipped config sets.
"""

from . import transforms  # noqa: F401
from . import models  # noqa: F401
