from . import checkpoint
from . import inference
from . import profiling
from . import serialization
from . import special
from . import util
from .checkpoint import CheckpointCallback, save_params, load_params
