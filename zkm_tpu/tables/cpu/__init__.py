from .columns import *  # noqa: F401,F403
from .stark import CpuStark  # noqa: F401
from . import ctl  # noqa: F401
