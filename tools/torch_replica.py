"""Plain-torch replica of the reference KernelNN + its rollout loop.

A faithful re-implementation (no torch_geometric) of the reference
architecture (``/root/reference/graph_kernel.py:245-309``) and its
free-running inference loop ``recursive_propagation``
(``graph_kernel.py:396-413``) with the host-side graph rebuild
``construct_pairdata`` (``:362-393``): scipy contact map of the window's
LAST frame at 8 A (self-loops included), COO edge order, edge_attr
``[pos_src ; pos_dst]``, drop-oldest/append-prediction window slide.

Used as the *reference-model oracle* for the accuracy loop
(tools/reference_parity.py): a JAX-trained checkpoint is exported into
this model (utils/torch_export.py) and the two implementations are
compared rollout-vs-rollout on identical weights.
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path

# run-by-path support: `python tools/x.py` puts tools/ (not the repo
# root) on sys.path; the package and `tools.` imports need the root
_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


class TorchDenseNet(nn.Module):
    """DenseNet layout parity: Linear at even indices, ReLU odd
    (graph_kernel.py:217-242)."""

    def __init__(self, sizes):
        super().__init__()
        layers = []
        for j in range(len(sizes) - 1):
            layers.append(nn.Linear(sizes[j], sizes[j + 1]))
            if j != len(sizes) - 2:
                layers.append(nn.ReLU())
        self.layers = nn.ModuleList(layers)

    def forward(self, x):
        for layer in self.layers:
            x = layer(x)
        return x


class TorchNNConv(nn.Module):
    """NNConv_old math (graph_kernel.py:194-209) with mean aggregation,
    plain torch (scatter via index_add)."""

    def __init__(self, width, net):
        super().__init__()
        self.width = width
        self.net = net
        self.root = nn.Parameter(torch.empty(width, width).uniform_(-0.1, 0.1))
        self.bias = nn.Parameter(torch.empty(width).uniform_(-0.1, 0.1))

    def forward(self, x, edge_index, edge_attr):
        src, dst = edge_index[0], edge_index[1]
        weight = self.net(edge_attr).view(-1, self.width, self.width)
        msgs = torch.bmm(x[src].unsqueeze(1), weight).squeeze(1)
        r = x.shape[0]
        agg = torch.zeros(r, self.width).index_add_(0, dst, msgs)
        deg = torch.zeros(r).index_add_(
            0, dst, torch.ones_like(dst, dtype=torch.float32)
        )
        agg = agg / deg.clamp(min=1.0).unsqueeze(1)
        return agg + torch.mm(x, self.root) + self.bias


class TorchKernelNN(nn.Module):
    """Reference KernelNN replica; attribute names produce the reference's
    state_dict keys (graph_kernel.py:245-275)."""

    def __init__(self, width, ker_width, depth, window_size, num_residues,
                 predict_delta: bool = False):
        super().__init__()
        self.depth = depth
        self.window_size = window_size
        self.num_residues = num_residues
        self.predict_delta = predict_delta
        self.lstm = nn.LSTM(3, 3)
        self.lstm_fc = nn.Linear(3, 3)
        self.emb = nn.Embedding(20, 4)
        self.fc1 = nn.Linear(7, width)
        kernel = TorchDenseNet([6, ker_width, ker_width, width**2])
        self.conv1 = TorchNNConv(width, kernel)
        self.conv2 = TorchNNConv(width, kernel)  # shared net, as reference
        self.fc2 = nn.Linear(width, 3)

    def forward(self, window, aa, edge_index, edge_attr):
        # window: (T, R, 3). Reference single-example path: feed each frame
        # as (1, R, 3) with carried hidden state (graph_kernel.py:279-288).
        hidden = (torch.zeros(1, self.num_residues, 3),
                  torch.zeros(1, self.num_residues, 3))
        for frame in window:
            x, hidden = self.lstm(frame.unsqueeze(0), hidden)
        x = self.lstm_fc(x.squeeze(0))  # (R, 3)
        emb = self.emb(aa)
        x = torch.cat((emb, x), dim=1)
        x = F.relu(self.fc1(x))
        for _ in range(self.depth):
            x = F.relu(self.conv1(x, edge_index, edge_attr))
        for _ in range(self.depth):
            x = F.relu(self.conv2(x, edge_index, edge_attr))
        out = self.fc2(x)
        if self.predict_delta:
            out = out + window[-1]
        return out


class TorchLegacyKernelNN(nn.Module):
    """The OLDER reference KernelNN the analysis notebook loads
    (bba_analysis.ipynb cell 8): Embedding + fc1 + a single weight-tied
    NNConv_old stack + fc2 — no LSTM, window_size=1 semantics (node
    features = [emb ; coordinates]). Attribute names produce that
    checkpoint's state_dict keys."""

    def __init__(self, width, ker_width, depth):
        super().__init__()
        self.depth = depth
        self.emb = nn.Embedding(20, 4)
        self.fc1 = nn.Linear(7, width)
        kernel = TorchDenseNet([6, ker_width, ker_width, width**2])
        self.conv1 = TorchNNConv(width, kernel)
        self.fc2 = nn.Linear(width, 3)

    def forward(self, frame, aa, edge_index, edge_attr):
        # frame: (R, 3) — the dataset item shape the notebook shows
        # (x_position=[28, 3], cell 32)
        x = torch.cat((self.emb(aa), frame), dim=1)
        x = F.relu(self.fc1(x))
        for _ in range(self.depth):
            x = F.relu(self.conv1(x, edge_index, edge_attr))
        return self.fc2(x)


def construct_graph(frame: np.ndarray, threshold: float = 8.0):
    """Reference construct_pairdata graph build (graph_kernel.py:362-379):
    scipy distance matrix < threshold on ONE frame, COO edge order,
    edge_attr = [pos_src ; pos_dst]. Self-loops included."""
    from scipy.sparse import coo_matrix
    from scipy.spatial import distance_matrix

    contact = (distance_matrix(frame, frame) < threshold).astype(np.float32)
    coo = coo_matrix(contact)
    edge_index = np.vstack((coo.row, coo.col)).astype(np.int64)
    edge_attr = np.concatenate(
        [frame[coo.row], frame[coo.col]], axis=1
    ).astype(np.float32)
    return edge_index, edge_attr


@torch.no_grad()
def torch_recursive_propagation(model, window0: np.ndarray, aa: np.ndarray,
                                num_steps: int, threshold: float = 8.0):
    """The reference rollout loop (graph_kernel.py:396-413): forward,
    drop-oldest/append-prediction, host graph rebuild from the new LAST
    frame, repeat. Returns (num_steps, R, 3) predictions."""
    model.eval()
    window = np.asarray(window0, np.float32).copy()
    aa_t = torch.tensor(np.asarray(aa, np.int64))
    outs = []
    for _ in range(num_steps):
        edge_index, edge_attr = construct_graph(window[-1], threshold)
        out = model(
            torch.tensor(window), aa_t,
            torch.tensor(edge_index), torch.tensor(edge_attr),
        ).numpy()
        window = np.concatenate([window[1:], out[None]], axis=0)
        outs.append(out)
    return np.stack(outs)
