"""Import reference (PyTorch) KernelNN checkpoints into our param pytree.

Maps the reference's ``state_dict`` layout (``graph_kernel.py:245-275``,
optionally under DataParallel's ``module.`` prefix and the training
driver's ``model_state_dict`` wrapper, ``:633-639``) weight-for-weight:

- ``lstm.weight_ih_l0`` (4h, in) -> transposed ``lstm/w_ih`` (torch packs
  gates row-major [i, f, g, o]; our LSTM uses the same order),
- ``lstm_fc`` / ``fc1`` / ``fc2`` Linear weights transposed ((out, in) ->
  (in, out)),
- ``emb.weight`` as-is,
- ``convN.root`` as-is (the reference stores it (in, out) and applies
  ``torch.mm(x, root)``, graph_kernel.py:177,206 — same layout as ours),
- ``conv1.net.layers.{0,2,4}`` -> ``edge_kernel.layer_{0,1,2}`` (DenseNet
  interleaves ReLU modules at odd indices, graph_kernel.py:227-234). conv2
  shares the same net object in the reference (``:271-273``), so its
  duplicate entries are ignored under ``tie_edge_kernel=True`` and mapped
  to ``edge_kernel2`` otherwise.

This enables checkpoint-level behavioral comparison against the reference
model (SURVEY.md section 7.3).
"""

from __future__ import annotations

import numpy as np


def _strip_prefixes(sd: dict) -> dict:
    out = {}
    for k, v in sd.items():
        for prefix in ("module.",):
            if k.startswith(prefix):
                k = k[len(prefix):]
        out[k] = np.asarray(v)
    return out


def import_reference_state_dict(sd: dict, cfg) -> dict:
    """Convert a torch state_dict (numpy-convertible values) to GKN params."""
    sd = _strip_prefixes(sd)

    def lin(prefix):
        return {
            "w": sd[f"{prefix}.weight"].T.copy(),
            "b": sd[f"{prefix}.bias"].copy(),
        }

    def kernel_net(prefix):
        return {
            f"layer_{i}": {
                "w": sd[f"{prefix}.layers.{j}.weight"].T.copy(),
                "b": sd[f"{prefix}.layers.{j}.bias"].copy(),
            }
            for i, j in enumerate((0, 2, 4))
        }

    params = {
        "emb": sd["emb.weight"].copy(),
        "lstm": {
            "w_ih": sd["lstm.weight_ih_l0"].T.copy(),
            "w_hh": sd["lstm.weight_hh_l0"].T.copy(),
            "b_ih": sd["lstm.bias_ih_l0"].copy(),
            "b_hh": sd["lstm.bias_hh_l0"].copy(),
        },
        "lstm_fc": lin("lstm_fc"),
        "fc1": lin("fc1"),
        "fc2": lin("fc2"),
        "conv1": {"root": sd["conv1.root"].copy(),
                  "bias": sd["conv1.bias"].copy()},
        "conv2": {"root": sd["conv2.root"].copy(),
                  "bias": sd["conv2.bias"].copy()},
        "edge_kernel": kernel_net("conv1.net"),
    }
    if not cfg.tie_edge_kernel:
        params["edge_kernel2"] = kernel_net("conv2.net")
    return params


def is_legacy_state_dict(sd: dict) -> bool:
    """True for the OLDER reference KernelNN layout the analysis notebook
    loads (``bba_analysis.ipynb`` cell 8: ``Embedding + fc1 + a single
    NNConv_old + fc2`` — no LSTM, no second conv stack)."""
    keys = {k[len("module."):] if k.startswith("module.") else k
            for k in sd}
    return "conv1.root" in keys and "lstm.weight_ih_l0" not in keys


def import_legacy_state_dict(sd: dict, cfg) -> dict:
    """Convert an old no-LSTM KernelNN state_dict to GKN params for a
    ``ModelConfig(legacy_no_lstm=True)`` model: ``emb`` / ``fc1`` /
    ``fc2`` / ``conv1`` (+ its DenseNet) map as in
    ``import_reference_state_dict``; there is no lstm/lstm_fc/conv2."""
    if not getattr(cfg, "legacy_no_lstm", False):
        raise ValueError(
            "this checkpoint is the older no-LSTM KernelNN variant "
            "(bba_analysis.ipynb cell 8); build the model with "
            "ModelConfig(legacy_no_lstm=True, window_size=1)"
        )
    sd = _strip_prefixes(sd)

    def lin(prefix):
        return {
            "w": sd[f"{prefix}.weight"].T.copy(),
            "b": sd[f"{prefix}.bias"].copy(),
        }

    return {
        "emb": sd["emb.weight"].copy(),
        "fc1": lin("fc1"),
        "fc2": lin("fc2"),
        "conv1": {"root": sd["conv1.root"].copy(),
                  "bias": sd["conv1.bias"].copy()},
        "edge_kernel": {
            f"layer_{i}": {
                "w": sd[f"conv1.net.layers.{j}.weight"].T.copy(),
                "b": sd[f"conv1.net.layers.{j}.bias"].copy(),
            }
            for i, j in enumerate((0, 2, 4))
        },
    }


def import_reference_checkpoint(path, cfg) -> dict:
    """Load a reference ``best.pt`` (torch.save of {model_state_dict, ...}
    or a bare state_dict) and convert. Detects the older no-LSTM layout
    (the one ``bba_analysis.ipynb`` cells 6-8 load) and routes it to
    ``import_legacy_state_dict``."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model_state_dict" in obj:
        obj = obj["model_state_dict"]
    sd = {k: v.detach().numpy() for k, v in obj.items()}
    if is_legacy_state_dict(sd):
        return import_legacy_state_dict(sd, cfg)
    return import_reference_state_dict(sd, cfg)
