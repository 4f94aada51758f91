"""Orbax checkpointing with top-k-by-val-loss retention.

Replaces Lightning ModelCheckpoint + the EMA state hooks (reference
`train.py:40-45`, `model.py:197-201`): every checkpoint carries params,
EMA params, optimizer state, step counter, and the model config JSON, so
``load`` can rebuild the model with per-load overrides (the reference's
``load_from_checkpoint(..., num_steps=...)`` pattern, `generate.py:103-105`).
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Optional, Tuple, Union

import jax
import orbax.checkpoint as ocp

from ..config import ModelConfig
from ..parallel.train_step import TrainState


def make_manager(
    directory: Union[str, Path],
    top_k: int = 3,
    create: bool = True,
) -> ocp.CheckpointManager:
    """CheckpointManager keeping the top-k lowest val_loss plus the latest
    (Lightning's save_top_k=3 + save_last, `train.py:40-45`).

    The two retention rules must be COMBINED policies, not
    ``max_to_keep=top_k+1`` with a ``best_fn``: that variant ranks purely
    by val_loss, so the newest checkpoint is deleted whenever it is not
    top-k and a crash then resumes from the last top-k step instead of the
    last save (lost ~2200 steps in a real OOM-killed run)."""
    from orbax.checkpoint import checkpoint_managers as cm

    options = ocp.CheckpointManagerOptions(
        # best_fn no longer drives retention (the preservation policy
        # does); it powers manager.best_step() for prefer="best" loads.
        best_fn=lambda metrics: metrics.get("val_loss", float("inf")),
        best_mode="min",
        preservation_policy=cm.AnyPreservationPolicy([
            cm.BestN(
                get_metric_fn=lambda m: m.get("val_loss", float("inf")),
                n=top_k,
                # BestN keeps the n LARGEST metrics by default; val_loss
                # is lower-is-better.
                reverse=True,
                keep_checkpoints_without_metrics=True,
            ),
            cm.LatestN(1),
        ]),
        create=create,
    )
    return ocp.CheckpointManager(Path(directory).absolute(), options=options)


def save_checkpoint(
    manager: ocp.CheckpointManager,
    state: TrainState,
    cfg: ModelConfig,
    val_loss: Optional[float] = None,
) -> None:
    step = int(state.step)
    metrics = {"val_loss": float(val_loss)} if val_loss is not None else None
    manager.save(
        step,
        args=ocp.args.Composite(
            state=ocp.args.StandardSave(state),
            config=ocp.args.JsonSave(dataclasses.asdict(cfg)),
        ),
        metrics=metrics,
    )


def load_checkpoint(
    directory: Union[str, Path],
    step: Optional[int] = None,
    target_factory: Optional[Any] = None,
    prefer: str = "latest",
    **config_overrides: Any,
) -> Tuple[TrainState, ModelConfig]:
    """Restore (TrainState, ModelConfig); kwargs override config fields
    (e.g. ``num_steps=1000`` for generation).

    ``prefer`` selects the step when ``step`` is None: "latest" (resume
    semantics — continue from the most recent save) or "best" (inference
    semantics — lowest recorded val_loss, Lightning's ``best_model_path``;
    falls back to latest when no metrics are on record, e.g. after a
    manager restart).

    Without ``target_factory`` the state comes back with plain-dict leaves —
    fine for inference (params/ema_params are dicts anyway) but the optax
    ``opt_state`` loses its NamedTuple structure. For resuming training,
    pass ``target_factory(cfg) -> TrainState`` (a template with the right
    structure, e.g. a fresh ``make_train_state``)."""
    if prefer not in ("latest", "best"):
        raise ValueError(f"prefer must be 'latest' or 'best', got {prefer!r}")
    directory = Path(directory).absolute()
    if not directory.exists():
        # Probing a mistyped path must not leave an empty directory tree
        # behind (create=False below guards the same for subpaths).
        raise FileNotFoundError(f"No checkpoints under {directory}")
    manager = make_manager(directory, create=False)
    try:
        if step is None:
            if prefer == "best":
                step = manager.best_step()
            if step is None:
                step = manager.latest_step()
        if step is None:
            raise FileNotFoundError(f"No checkpoints under {directory}")
        cfg_restored = manager.restore(
            step, args=ocp.args.Composite(config=ocp.args.JsonRestore())
        )
        cfg_dict = dict(cfg_restored["config"])
        _default_absent_outer_factored(cfg_dict)
        cfg_dict.update(config_overrides)
        cfg = _build_model_config(cfg_dict)

        if target_factory is not None:
            template = target_factory(cfg)
            abstract = jax.tree_util.tree_map(
                ocp.utils.to_shape_dtype_struct, template
            )
            restored = manager.restore(
                step,
                args=ocp.args.Composite(
                    state=ocp.args.StandardRestore(abstract)
                ),
            )
            return restored["state"], cfg

        # No target: build an abstract tree from the checkpoint's own
        # metadata with CURRENT-device sharding, so checkpoints written on
        # one platform (e.g. the TPU chip) restore on another (e.g. the
        # CPU test mesh) instead of failing on stale saved device names.
        item_meta = manager.item_metadata(step)["state"]
        abstract = _abstract_from_metadata(item_meta)
        restored = manager.restore(
            step,
            args=ocp.args.Composite(state=ocp.args.StandardRestore(abstract)),
        )
        raw = restored["state"]
        state = TrainState(
            step=raw["step"],
            params=raw["params"],
            opt_state=raw["opt_state"],
            ema_params=raw["ema_params"],
            ema_updates=raw["ema_updates"],
        ) if isinstance(raw, dict) else raw
        return state, cfg
    finally:
        # This manager exists only for the load; close its background
        # machinery instead of leaking it alongside the caller's own
        # save manager.
        manager.close()


def save_params_only(
    directory: Union[str, Path], params: Any, cfg: ModelConfig
) -> None:
    """Standalone params export (for converted reference checkpoints)."""
    path = Path(directory).absolute()
    path.mkdir(parents=True, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path / "params", params)
    ckptr.wait_until_finished()
    (path / "config.json").write_text(json.dumps(dataclasses.asdict(cfg)))


def load_params_only(
    directory: Union[str, Path], **config_overrides: Any
) -> Tuple[Any, ModelConfig]:
    path = Path(directory).absolute()
    cfg_dict = json.loads((path / "config.json").read_text())
    _default_absent_outer_factored(cfg_dict)
    cfg_dict.update(config_overrides)
    ckptr = ocp.StandardCheckpointer()
    # Restore onto the current platform regardless of where the checkpoint
    # was written (see load_checkpoint).
    abstract = _abstract_from_metadata(ckptr.metadata(path / "params"))
    params = ckptr.restore(path / "params", abstract)
    return params, _build_model_config(cfg_dict)


def _default_absent_outer_factored(cfg_dict: dict) -> None:
    """Checkpoints written before the ``outer_factored`` field existed
    (pre-round-3) predate the factorization entirely: restoring them must
    reproduce their original (unfactored) numerics, not silently pick up
    the new default-True via ``ModelConfig(**cfg_dict)``. Field-present
    checkpoints keep their stored value; explicit overrides still win."""
    cfg_dict.setdefault("outer_factored", False)


def _build_model_config(cfg_dict: dict) -> ModelConfig:
    """Forward-tolerant config restore: a checkpoint written by a NEWER
    framework version may carry config keys this version does not know.
    Dropping them (with a warning) restores everything the current code
    can represent instead of crashing the load — new fields default to
    behavior-preserving values by convention (config.py)."""
    known = {f.name for f in dataclasses.fields(ModelConfig)}
    unknown = sorted(set(cfg_dict) - known)
    if unknown:
        import warnings

        warnings.warn(
            "Checkpoint config carries unknown keys (written by a newer "
            f"version?): {unknown} — ignored.",
        )
        cfg_dict = {k: v for k, v in cfg_dict.items() if k in known}
    return ModelConfig(**cfg_dict)


def _abstract_from_metadata(meta: Any) -> Any:
    """Checkpoint metadata tree -> ShapeDtypeStructs on the default device.

    Accepts the raw tree, a TreeMetadata, or a StepMetadata wrapper
    (StandardCheckpointer.metadata returns the latter)."""
    if hasattr(meta, "item_metadata"):  # StepMetadata
        meta = meta.item_metadata
    if hasattr(meta, "tree"):  # TreeMetadata
        meta = meta.tree
    sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])

    def leaf(m: Any) -> Any:
        if hasattr(m, "shape") and hasattr(m, "dtype"):
            return jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=sharding)
        return m

    return jax.tree_util.tree_map(leaf, meta)
