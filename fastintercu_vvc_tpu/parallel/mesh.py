"""Mesh construction helpers.

Axis conventions (the scaling recipe for this framework):
  "tile"  — CTU-column tiles within a frame (context parallelism with
            halo exchange over ICI; SURVEY.md §5.7)
  "gop"   — frames/GOPs across hosts (pipeline-ish, reference pictures
            over DCN)
  "data"  — batch axis for CNN training / multi-sequence encoding
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh

tile_axis = "tile"


def make_mesh(n_tile: int | None = None, n_data: int = 1,
              devices=None) -> Mesh:
    """1-D or 2-D mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    if n_tile is None:
        n_tile = len(devices) // n_data
    devs = np.asarray(devices[:n_tile * n_data]).reshape(n_data, n_tile)
    if n_data == 1:
        return Mesh(devs.reshape(-1), (tile_axis,))
    return Mesh(devs, ("data", tile_axis))
