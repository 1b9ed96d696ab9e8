"""Framework exceptions (reference: mxfusion/common/exceptions.py:16-24)."""


class ModelSpecificationError(Exception):
    """Raised for malformed model definitions (bad factor wiring, shapes)."""


class InferenceError(Exception):
    """Raised for invalid inference configuration or runtime failures."""


class SerializationError(Exception):
    """Raised when saving/loading or graph reconciliation fails."""
