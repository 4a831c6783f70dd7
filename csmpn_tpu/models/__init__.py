from .hulls import HullsModel  # noqa: F401
