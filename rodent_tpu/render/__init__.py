from . import bsdf  # noqa: F401
from . import camera  # noqa: F401
from . import film  # noqa: F401
from . import light  # noqa: F401
