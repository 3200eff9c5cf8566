"""AOT serving bundles: compile the rollout once, ship a portable artifact.

The reference has no serving story at all — inference is the notebook
re-importing the training module and re-building the model from an argparse
``Namespace`` before every rollout (``/root/reference/bba_analysis.ipynb``
cells 0-8). A production TPU deployment wants the opposite: trace + lower
ONCE at release time, then load a self-contained artifact on the serving
host — no model source, no retrace, no Python-side config drift between
exporter and server.

``jax.export`` gives exactly that: the jitted rollout lowers to a
serialized StableHLO module with a versioned calling convention, and the
artifact can be lowered FOR TPU from a CPU-only release host
(``platforms=["tpu", "cpu"]``) — the build machine never needs a chip.
A bundle is a directory:

    bundle/
      rollout.jaxexport   serialized jax.export.Exported (StableHLO)
      params.npz          weights (utils/checkpoint.py flat-npz format)
      bundle.json         ModelConfig + rollout signature + provenance

``load_bundle`` restores all three and returns a callable that runs the
deserialized module via ``Exported.call`` — weights are data, so the same
artifact serves hot-swapped checkpoints of the same shape.

Scope: the XLA scan rollout (single- and multi-stream, including
``stream_chunk``). The persistent Pallas kernel is deliberately NOT
exportable — Mosaic custom calls carry no cross-release compatibility
guarantee, so an artifact embedding one could stop deserializing on a
runtime upgrade; serving deployments that want the persistent kernel load
a checkpoint and trace in-process instead.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Optional, Sequence

import numpy as np

from molecular_dynamics_neural_operator_tpu.configs import ModelConfig

_MODULE_FILE = "rollout.jaxexport"
_PARAMS_FILE = "params.npz"
_META_FILE = "bundle.json"
_FORMAT_VERSION = 1


def _operator_name(cfg) -> str:
    from molecular_dynamics_neural_operator_tpu.configs import FNOConfig

    return "fno" if isinstance(cfg, FNOConfig) else "gkn"


def _rollout_kwargs(num_steps, threshold, graph_frame, collect, clip,
                    streams, stream_chunk) -> dict:
    return {
        "num_steps": int(num_steps),
        "threshold": float(threshold),
        "graph_frame": graph_frame,
        "collect": collect,
        "clip": None if clip is None else float(clip),
        "streams": int(streams),
        "stream_chunk": None if stream_chunk is None else int(stream_chunk),
    }


def _serving_fn(cfg, kw: dict):
    if _operator_name(cfg) == "fno":
        # FNO state is the (R, R, T) distance-channel window; the only
        # signature knob is num_steps (threshold/graph rebuild/clip are
        # GKN coordinate-space concepts).
        from molecular_dynamics_neural_operator_tpu.models.fno import (
            fno_rollout_scan,
        )

        n = kw["num_steps"]

        def fn(params, channels0):
            return fno_rollout_scan(params, cfg, channels0, n)

        return fn
    from molecular_dynamics_neural_operator_tpu.rollout import (
        make_rollout_fn,
    )

    return make_rollout_fn(
        cfg,
        num_steps=kw["num_steps"],
        threshold=kw["threshold"],
        graph_frame=kw["graph_frame"],
        collect=kw["collect"],
        batched=kw["streams"] > 0,
        clip=kw["clip"],
        stream_chunk=kw["stream_chunk"],
    )


def _input_avals(cfg, streams: int):
    import jax

    if _operator_name(cfg) == "fno":
        r = cfg.num_residues
        return (jax.ShapeDtypeStruct((r, r, cfg.in_channels), np.float32),)
    r, t = cfg.num_residues, cfg.window_size
    aa = jax.ShapeDtypeStruct((r,), np.int32)
    shape = (t, r, 3) if streams == 0 else (streams, t, r, 3)
    window = jax.ShapeDtypeStruct(shape, np.float32)
    return aa, window


def export_rollout(
    params,
    cfg: ModelConfig,
    num_steps: int,
    *,
    threshold: float = 8.0,
    graph_frame: str = "last",
    collect: str = "coords",
    clip: Optional[float] = None,
    streams: int = 0,
    stream_chunk: Optional[int] = None,
    platforms: Optional[Sequence[str]] = None,
):
    """Lower + export the jitted rollout. Returns ``jax.export.Exported``.

    ``streams=0`` exports the single-stream signature
    ``(params, aa (R,), window (T, R, 3))``; ``streams=S`` the batched one
    with ``window (S, T, R, 3)``. ``platforms`` lowers for those targets
    regardless of the host backend (e.g. ``["tpu", "cpu"]`` from a CPU
    release box); None = the current backend only.
    """
    import jax
    from jax import export as jax_export

    if _operator_name(cfg) == "fno" and streams:
        raise ValueError(
            "FNO bundles export the single-stream (R, R, T) signature; "
            "batch streams at the caller with vmap before exporting"
        )
    if getattr(cfg, "conv_impl", "xla") == "pallas":
        raise ValueError(
            "conv_impl='pallas' embeds Mosaic custom calls, which have no "
            "cross-release serialization guarantee; export with "
            "conv_impl='xla' (the persistent-Pallas rollout kernel is "
            "likewise serving-in-process only)"
        )
    kw = _rollout_kwargs(num_steps, threshold, graph_frame, collect, clip,
                         streams, stream_chunk)
    fn = _serving_fn(cfg, kw)
    avals = _input_avals(cfg, streams)
    params_avals = jax.tree_util.tree_map(
        lambda p: jax.ShapeDtypeStruct(np.shape(p), np.asarray(p).dtype),
        params,
    )
    exp = jax_export.export(
        jax.jit(fn),
        platforms=None if platforms is None else list(platforms),
    )(params_avals, *avals)
    return exp


def save_bundle(
    path,
    params,
    cfg: ModelConfig,
    num_steps: int,
    *,
    threshold: float = 8.0,
    graph_frame: str = "last",
    collect: str = "coords",
    clip: Optional[float] = None,
    streams: int = 0,
    stream_chunk: Optional[int] = None,
    platforms: Optional[Sequence[str]] = None,
    extra_meta: Optional[dict] = None,
) -> Path:
    """Export the rollout and write the three-file bundle directory."""
    import jax

    from molecular_dynamics_neural_operator_tpu.utils.checkpoint import (
        save_checkpoint,
    )

    exp = export_rollout(
        params, cfg, num_steps, threshold=threshold, graph_frame=graph_frame,
        collect=collect, clip=clip, streams=streams,
        stream_chunk=stream_chunk, platforms=platforms,
    )
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    (path / _MODULE_FILE).write_bytes(bytes(exp.serialize()))
    save_checkpoint(path / _PARAMS_FILE, params)
    meta = {
        "format_version": _FORMAT_VERSION,
        "operator": _operator_name(cfg),
        "model_config": dataclasses.asdict(cfg),
        "rollout": _rollout_kwargs(num_steps, threshold, graph_frame,
                                   collect, clip, streams, stream_chunk),
        "platforms": list(exp.platforms),
        "jax_version": jax.__version__,
    }
    if extra_meta:
        meta["extra"] = extra_meta
    (path / _META_FILE).write_text(json.dumps(meta, indent=2))
    return path


@dataclasses.dataclass(frozen=True)
class ServingBundle:
    """A loaded bundle: calling it runs the exported module with the
    bundled weights — ``bundle(aa, window)`` for GKN artifacts,
    ``bundle(channels0)`` for FNO ones (``bundle.operator`` says which).
    Pass ``params=`` to hot-swap a same-shape checkpoint without
    re-exporting."""

    exported: Any
    params: Any
    cfg: Any
    meta: dict

    def __call__(self, *args, params=None):
        return self.exported.call(
            self.params if params is None else params, *args
        )

    @property
    def operator(self) -> str:
        return self.meta.get("operator", "gkn")

    @property
    def platforms(self):
        return tuple(self.meta.get("platforms", ()))

    @property
    def rollout(self) -> dict:
        return dict(self.meta["rollout"])


def load_bundle(path) -> ServingBundle:
    """Read a bundle directory back into a runnable ``ServingBundle``.

    Needs no model source beyond this package: the module is deserialized
    StableHLO, the config reconstructs from JSON, and the weights restore
    against a freshly-initialized template (shape/dtype checked by
    ``restore_checkpoint``)."""
    import jax
    from jax import export as jax_export

    from molecular_dynamics_neural_operator_tpu.utils.checkpoint import (
        restore_checkpoint,
    )

    path = Path(path)
    meta = json.loads((path / _META_FILE).read_text())
    if meta.get("format_version") != _FORMAT_VERSION:
        raise ValueError(
            f"unsupported bundle format_version {meta.get('format_version')}"
            f" (this build reads {_FORMAT_VERSION})"
        )
    from molecular_dynamics_neural_operator_tpu.configs import (
        FNOConfig,
        _from_dict,
    )

    operator = meta.get("operator", "gkn")
    # _from_dict rather than ModelConfig(**...): it restores list->tuple
    # fields and ignores keys a newer exporter added, so older servers can
    # read forward-compatible bundles as long as format_version matches.
    if operator == "fno":
        from molecular_dynamics_neural_operator_tpu.models.fno import (
            fno_init,
        )

        cfg = _from_dict(FNOConfig, meta["model_config"])
        template = fno_init(jax.random.PRNGKey(0), cfg)
    else:
        cfg = _from_dict(ModelConfig, meta["model_config"])
        from molecular_dynamics_neural_operator_tpu.models import gkn_init

        template = gkn_init(jax.random.PRNGKey(0), cfg)
    params, _ = restore_checkpoint(path / _PARAMS_FILE, template)
    exported = jax_export.deserialize(
        bytearray((path / _MODULE_FILE).read_bytes())
    )
    return ServingBundle(exported=exported, params=params, cfg=cfg,
                         meta=meta)
