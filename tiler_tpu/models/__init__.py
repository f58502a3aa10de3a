from .state import EncodeState, KeyFrameInfo, TileMapSoA  # noqa: F401
