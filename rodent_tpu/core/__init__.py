from . import math  # noqa: F401
from . import rng  # noqa: F401
from . import sampling  # noqa: F401
