"""tiler_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of the GTM video encoder.

A from-scratch reimplementation of the capabilities of gligli/tiler
("GliGli's TileMotion"): a lossy video codec where each frame is a tilemap
of 8x8 palettized tiles with H/V mirrors and motion-predicted offsets,
packed into an LZMA-compressed command stream playable by the unchanged
~550-line JavaScript reference decoder.

Architecture (TPU-first, not a port):
  - ops/       pure-JAX batched tile math (colorspaces, DCT features, mirrors)
  - kernels/   Pallas TPU kernels for the hot paths
  - cluster/   HBM-resident weighted k-means (replaces yakmo/BICO/ANN DLLs)
  - parallel/  jax.sharding mesh + shard_map helpers (ICI-sharded corpus math)
  - models/    encoder state dataclasses (frames, tilemaps, corpus, palettes)
  - pipeline/  the 8 encoder stages as pure functions over the state
  - bitstream/ host-side GTM command stream writer/reader + LZMA codec
  - io/        video ingest (image sequences / y4m / ffmpeg) and exports
  - utils/     golden-ratio search, Powell, progress/tracing
"""

__version__ = "0.1.0"

TILE_W = 8  # cTileWidth (reference utils.pas:37)
COLOR_CPNS = 3  # cColorCpns (reference utils.pas:38)
TILE_DCT_SIZE = COLOR_CPNS * TILE_W * TILE_W  # 192 (utils.pas:39)
