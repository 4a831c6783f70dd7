from .hulls import HullsModel  # noqa: F401
from .motion import MotionModel  # noqa: F401
from .md17 import MD17Model  # noqa: F401
from .nba import NBAModel  # noqa: F401
