"""Common configuration, constants and exceptions.

TPU-native counterpart of the reference's ``mxfusion/common`` layer
(see /root/reference/mxfusion/common/config.py:18-51).
"""
from . import config
from . import exceptions
from .config import get_default_dtype, set_default_dtype
from .exceptions import (
    ModelSpecificationError,
    InferenceError,
    SerializationError,
)
