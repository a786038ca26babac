"""Device-mesh construction for the block/marker/sample parallel axes.

The engine's parallel axes map the problem, not a transformer:

- ``block``  — data parallelism over LD blocks (the reference runs one
  process per block and merges files, `ci-gwas.py:100-104`; here blocks are
  a sharded batch axis),
- ``marker`` — tensor parallelism over the marker axis of a correlation
  panel (column shards of the contingency matmuls, all-gathered over ICI),
- ``sample`` — reduction parallelism over individuals: each device
  accumulates partial contingency counts over its sample shard and a psum
  finishes the correlation (the analog of sequence/context parallelism).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(
    n_devices: int | None = None,
    block: int = 1,
    marker: int = 1,
    sample: int | None = None,
    devices=None,
) -> Mesh:
    """Mesh with axes (block, marker, sample); sample absorbs the remainder."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if sample is None:
        if n_devices % (block * marker) != 0:
            raise ValueError(
                f"{n_devices} devices not divisible by block*marker={block * marker}"
            )
        sample = n_devices // (block * marker)
    arr = np.array(devices).reshape(block, marker, sample)
    return Mesh(arr, ("block", "marker", "sample"))
