from . import color, dct, tiles, metrics  # noqa: F401
