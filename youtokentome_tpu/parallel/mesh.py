"""Device mesh helpers.

The reference's only parallelism is shared-memory data parallelism over
<=8 threads (corpus segments for training, bpe.cpp:864-873; sentence
blocks for encoding, bpe.cpp:1718-1733).  The TPU equivalent is a 1-D
``data`` mesh over all chips: corpus/word shards per device, merge table
replicated, integer pair counts combined with collectives over ICI —
order-independent and therefore bit-deterministic at any device count.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"


def data_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))
