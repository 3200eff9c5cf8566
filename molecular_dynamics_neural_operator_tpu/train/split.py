"""Train/valid splits (``/root/reference/graph_kernel.py:38-72`` parity).

Returns index arrays instead of loaders; ``data.batch_iterator`` streams
batches from them. "random" = uniform shuffle split, "partition" =
contiguous prefix/suffix (the method the reference's main() actually uses,
``graph_kernel.py:511``).
"""

from __future__ import annotations

import numpy as np


def train_valid_split(
    num_examples: int,
    split_pct: float = 0.8,
    method: str = "partition",
    seed: int = 0,
):
    train_len = int(num_examples * split_pct)
    indices = np.arange(num_examples)
    if method == "random":
        rng = np.random.default_rng(seed)
        indices = rng.permutation(indices)
        return indices[:train_len], indices[train_len:]
    if method == "partition":
        return indices[:train_len], indices[train_len:]
    raise ValueError(f"Invalid method: {method}.")
