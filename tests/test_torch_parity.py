"""Checkpoint-level behavioral parity with the reference architecture.

Builds a plain-torch replica of the reference ``KernelNN``
(``graph_kernel.py:245-309``: LSTM window encoder, embedding, shared-kernel
NNConv stacks with mean aggregation, implemented here without
torch_geometric), runs it on a tiny example, imports its state_dict through
``utils.torch_import``, and checks our JAX forward reproduces the output.

Single-example semantics are exact: with batch=1 the reference's quirky
LSTM indexing (scanning torch's seq axis over frames with residues as the
batch) coincides with our per-residue time scan.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from molecular_dynamics_neural_operator_tpu.configs import ModelConfig  # noqa: E402
from molecular_dynamics_neural_operator_tpu.geometry import (  # noqa: E402
    contact_map,
    dense_edge_features,
)
from molecular_dynamics_neural_operator_tpu.models import (  # noqa: E402
    DenseGraph,
    gkn_apply_single,
)
from molecular_dynamics_neural_operator_tpu.utils.torch_import import (  # noqa: E402
    import_reference_state_dict,
)


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
        deg = torch.zeros(r).index_add_(0, dst, torch.ones_like(dst, dtype=torch.float32))
        agg = agg / deg.clamp(min=1.0).unsqueeze(1)
        return agg + torch.mm(x, self.root) + self.bias


class TorchKernelNN(nn.Module):
    """Reference KernelNN replica; attribute names produce the reference's
    state_dict keys."""

    def __init__(self, width, ker_width, depth, window_size, num_residues):
        super().__init__()
        self.depth = depth
        self.window_size = window_size
        self.num_residues = num_residues
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
        return self.fc2(x)


def test_forward_parity_with_reference_architecture():
    torch.manual_seed(0)
    width, ker_width, depth, t, r = 16, 32, 2, 4, 10
    model = TorchKernelNN(width, ker_width, depth, t, r).eval()

    rng = np.random.default_rng(0)
    window = rng.normal(size=(t, r, 3)).astype(np.float32) * 4
    aa = (rng.integers(0, 20, r)).astype(np.int64)

    adj = np.asarray(contact_map(jnp.asarray(window[-1]), 8.0))
    src, dst = np.nonzero(adj)
    edge_index = np.stack([src, dst])
    edge_attr = np.concatenate(
        [window[-1][src], window[-1][dst]], axis=1
    ).astype(np.float32)

    with torch.no_grad():
        ref = model(
            torch.tensor(window), torch.tensor(aa),
            torch.tensor(edge_index), torch.tensor(edge_attr),
        ).numpy()

    cfg = ModelConfig(width=width, ker_width=ker_width, depth=depth,
                      window_size=t, num_residues=r,
                      compute_dtype="float32")
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = import_reference_state_dict(sd, cfg)
    params = jax.tree_util.tree_map(jnp.asarray, params)

    graph = DenseGraph(
        adj=jnp.asarray(adj),
        edge_feats=dense_edge_features(jnp.asarray(window[-1])),
    )
    ours = np.asarray(
        gkn_apply_single(params, cfg, jnp.asarray(aa), jnp.asarray(window),
                         graph)
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_import_reference_checkpoint_file(tmp_path):
    """Load a reference-style best.pt ({model_state_dict: ...} with the
    DataParallel 'module.' prefix, graph_kernel.py:633-639) from disk."""
    from molecular_dynamics_neural_operator_tpu.utils.torch_import import (
        import_reference_checkpoint,
    )

    torch.manual_seed(1)
    model = TorchKernelNN(16, 32, 2, 4, 10)
    sd = {f"module.{k}": v for k, v in model.state_dict().items()}
    path = tmp_path / "best.pt"
    torch.save({"epoch": 3, "model_state_dict": sd}, path)

    cfg = ModelConfig(width=16, ker_width=32, depth=2, window_size=4,
                      num_residues=10, compute_dtype="float32")
    params = import_reference_checkpoint(path, cfg)
    np.testing.assert_allclose(
        params["fc2"]["w"],
        model.state_dict()["fc2.weight"].numpy().T,
    )
    np.testing.assert_allclose(
        params["edge_kernel"]["layer_2"]["b"],
        model.state_dict()["conv1.net.layers.4.bias"].numpy(),
    )
