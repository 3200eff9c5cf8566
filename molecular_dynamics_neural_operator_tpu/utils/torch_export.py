"""Export our GKN params to the reference (PyTorch) state_dict layout.

Exact inverse of ``utils/torch_import.py``: produces the key set of the
reference ``KernelNN``'s ``state_dict()`` (``graph_kernel.py:245-275``) so
a trained JAX model can be loaded into a faithful torch replica and the two
implementations compared rollout-vs-rollout on identical weights (the
BASELINE north-star: contact-map RMSE within 1% of the reference model).

Layout notes mirror the import direction: Linear/LSTM/kernel-MLP weights
transpose (in, out) -> torch's (out, in); ``convN.root`` stays (in, out)
(the reference applies ``torch.mm(x, root)``, ``graph_kernel.py:206``);
``conv2.net.*`` duplicates ``conv1.net.*`` when the edge kernel is tied
(the reference shares ONE DenseNet between both conv stacks,
``graph_kernel.py:271-273``, so both key prefixes exist and alias).
"""

from __future__ import annotations

import numpy as np


def export_reference_state_dict(params, cfg) -> dict:
    """GKN param pytree -> numpy state_dict in the reference's key layout."""
    p = {k: np.asarray(v) if not isinstance(v, dict) else v
         for k, v in params.items()}

    def lin(prefix, node):
        return {
            f"{prefix}.weight": np.asarray(node["w"]).T.copy(),
            f"{prefix}.bias": np.asarray(node["b"]).copy(),
        }

    def kernel_net(prefix, node):
        out = {}
        for i, j in enumerate((0, 2, 4)):
            out[f"{prefix}.layers.{j}.weight"] = np.asarray(
                node[f"layer_{i}"]["w"]
            ).T.copy()
            out[f"{prefix}.layers.{j}.bias"] = np.asarray(
                node[f"layer_{i}"]["b"]
            ).copy()
        return out

    sd = {
        "emb.weight": np.asarray(p["emb"]).copy(),
        "lstm.weight_ih_l0": np.asarray(p["lstm"]["w_ih"]).T.copy(),
        "lstm.weight_hh_l0": np.asarray(p["lstm"]["w_hh"]).T.copy(),
        "lstm.bias_ih_l0": np.asarray(p["lstm"]["b_ih"]).copy(),
        "lstm.bias_hh_l0": np.asarray(p["lstm"]["b_hh"]).copy(),
        **lin("lstm_fc", p["lstm_fc"]),
        **lin("fc1", p["fc1"]),
        **lin("fc2", p["fc2"]),
        "conv1.root": np.asarray(p["conv1"]["root"]).copy(),
        "conv1.bias": np.asarray(p["conv1"]["bias"]).copy(),
        "conv2.root": np.asarray(p["conv2"]["root"]).copy(),
        "conv2.bias": np.asarray(p["conv2"]["bias"]).copy(),
        **kernel_net("conv1.net", p["edge_kernel"]),
    }
    kernel2 = p.get("edge_kernel2", p["edge_kernel"])
    sd.update(kernel_net("conv2.net", kernel2))
    return sd


def save_reference_checkpoint(path, params, cfg, epoch: int = 0) -> None:
    """Write a reference-compatible ``best.pt`` ({epoch, model_state_dict})
    loadable by the reference's notebook (``bba_analysis.ipynb`` cells
    6-7)."""
    import torch

    sd = {
        k: torch.tensor(v) for k, v in
        export_reference_state_dict(params, cfg).items()
    }
    torch.save({"epoch": epoch, "model_state_dict": sd}, path)
