"""Orbax-backed checkpointing of the full TrainState.

Capability equivalent of the reference's torch .pth dicts
{scores, state_dict, ema, optimizer} (reference: DEX-TTS/src/train.py:112-122)
plus what the reference lacks: the RNG key is saved too, so resume is
bitwise-reproducible (the reference's RNG snapshot helpers exist but are
dead code — src/utils.py:75-92).
"""

from __future__ import annotations

import os

import jax
import orbax.checkpoint as ocp

from dex_tts_tpu.train.state import TrainState


class CheckpointManager:
    """``async_save=True`` makes ``save`` non-blocking: orbax's
    StandardCheckpointer is an AsyncCheckpointer underneath — it copies
    the arrays device→host synchronously (so buffer donation by the next
    train step cannot corrupt the snapshot) and persists to disk in a
    background thread. Training then overlaps disk IO instead of
    stalling an epoch boundary on it. Call ``wait()`` before process
    exit (the preemption path and ``Trainer.fit``'s return do)."""

    def __init__(self, root: str, async_save: bool = False):
        self.root = os.path.abspath(root)
        self.async_save = async_save
        os.makedirs(self.root, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def path(self, tag: str) -> str:
        return os.path.join(self.root, tag)

    def save(self, state: TrainState, tag: str) -> None:
        # serialize with any in-flight background save: orbax rejects
        # overlapping saves on one checkpointer
        self._ckptr.wait_until_finished()
        self._ckptr.save(self.path(tag), state, force=True)
        if not self.async_save:
            self._ckptr.wait_until_finished()

    def wait(self) -> None:
        """Block until any in-flight async save is durably on disk."""
        self._ckptr.wait_until_finished()

    def restore(self, template: TrainState, tag: str) -> TrainState:
        """Restore into the structure of ``template`` (an abstract or
        concrete TrainState built the same way as at save time)."""
        self.wait()  # a pending save of this tag must land first
        target = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
        return self._ckptr.restore(self.path(tag), target)

    def exists(self, tag: str) -> bool:
        self.wait()  # an in-flight save's directory is not committed yet
        return os.path.isdir(self.path(tag))
