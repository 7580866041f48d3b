"""Checkpoint / resume / backbone transfer.

Replaces PL's ModelCheckpoint + `trainer.fit(ckpt_path=...)` resume
(reference `train.py:689-692`, `configs/callbacks/checkpoint.yaml`) and the
`load_backbone` pretrained-state hook (`long_conv_lm.py:853-911`).

Saved payload per step: TrainState (params, opt state, step, rng, ema) via
orbax + the data-loader state (epoch, step) + scalar metadata — so resume
restores the exact data stream position (the reference needs its
fault-tolerant samplers for this; here it is one small JSON).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import orbax.checkpoint as ocp

from dna_tpu.data.loader import LoaderState
from dna_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 2):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True),
        )

    def save(self, step: int, state: TrainState,
             loader_state: Optional[LoaderState] = None,
             extra: Optional[Dict[str, Any]] = None) -> None:
        meta = dict(extra or {})
        if loader_state is not None:
            meta["loader"] = loader_state.to_dict()
        self.manager.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state),
                meta=ocp.args.JsonSave(meta),
            ),
        )
        self.manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, abstract_state: TrainState, step: Optional[int] = None
                ) -> Tuple[TrainState, Optional[LoaderState], Dict[str, Any]]:
        step = step if step is not None else self.manager.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        restored = self.manager.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(abstract_state),
                meta=ocp.args.JsonRestore(),
            ),
        )
        meta = dict(restored["meta"] or {})
        loader = None
        if "loader" in meta:
            loader = LoaderState.from_dict(meta.pop("loader"))
        return restored["state"], loader, meta

    def close(self):
        self.manager.close()


def load_backbone(params: Any, pretrained_params: Any,
                  *, head_keys: Tuple[str, ...] = ("score", "decoder",
                                                   "lm_head", "cls_0", "cls_1",
                                                   "out"),
                  strict: bool = True) -> Any:
    """Transfer-learning hook (reference `load_backbone`,
    `long_conv_lm.py:853-911`): copy every pretrained leaf whose path exists
    in the new model, except head parameters, which stay at scratch init.

    Works on plain nested dicts of (possibly boxed) params.
    """
    import flax

    flat_new = flax.traverse_util.flatten_dict(flax.core.unfreeze(params))
    flat_old = flax.traverse_util.flatten_dict(
        flax.core.unfreeze(pretrained_params))
    transferred = 0
    for path, value in flat_old.items():
        if any(k in path for k in head_keys):
            continue
        if path in flat_new:
            new_leaf = flat_new[path]
            old_shape = getattr(value, "shape", None)
            new_shape = getattr(new_leaf, "shape", None)
            if old_shape == new_shape:
                flat_new[path] = value
                transferred += 1
            elif strict:
                raise ValueError(f"shape mismatch at {path}: "
                                 f"{old_shape} vs {new_shape}")
        elif strict:
            raise ValueError(f"pretrained param {path} missing in new model")
    if transferred == 0:
        raise ValueError("no parameters transferred — path mismatch?")
    return flax.traverse_util.unflatten_dict(flat_new)


def freeze_backbone_mask(params: Any,
                         head_keys: Tuple[str, ...] = ("score", "cls_0",
                                                       "cls_1", "out")) -> Any:
    """optax mask: True = trainable (head), False = frozen backbone
    (reference freeze option in `load_backbone`)."""
    import flax

    flat = flax.traverse_util.flatten_dict(flax.core.unfreeze(params))
    mask = {p: any(k in p for k in head_keys) for p in flat}
    return flax.traverse_util.unflatten_dict(mask)
