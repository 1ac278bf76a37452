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
    def __init__(self, root: str):
        self.root = os.path.abspath(root)
        os.makedirs(self.root, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def path(self, tag: str) -> str:
        return os.path.join(self.root, tag)

    def save(self, state: TrainState, tag: str) -> None:
        self._ckptr.save(self.path(tag), state, force=True)
        self._ckptr.wait_until_finished()

    def restore(self, template: TrainState, tag: str) -> TrainState:
        """Restore into the structure of ``template`` (an abstract or
        concrete TrainState built the same way as at save time)."""
        target = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
        return self._ckptr.restore(self.path(tag), target)

    def exists(self, tag: str) -> bool:
        return os.path.isdir(self.path(tag))
