from . import video, export  # noqa: F401
