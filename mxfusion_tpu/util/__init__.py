from . import inference
from . import serialization
from . import special
from . import util
