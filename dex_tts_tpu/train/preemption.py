"""Cooperative preemption handling for training loops.

The reference has no failure/preemption story (SURVEY §5: recovery is a
manual `--resume`). On TPU pods, maintenance events and spot reclamation
deliver SIGTERM with a grace window — a production trainer must turn
that into a checkpoint instead of losing the epoch. `PreemptionGuard`
converts SIGTERM/SIGINT into a flag the epoch loop polls between steps;
`Trainer.fit` and `train_vocoder.py` then save `last` (and a `preempt`
tag) and return cleanly, so `--resume` continues bitwise-exactly from
the interrupted step's checkpoint.

Multi-host note: pod runtimes deliver the signal to every worker;
because each process polls its own flag at the same step boundary (the
loops are lockstep by construction — same batch order on every host),
all processes reach the collective orbax save together.
"""

from __future__ import annotations

import signal


class PreemptionGuard:
    """Install handlers for `signals`; `triggered` flips on delivery.

    Handlers chain to any previous handler after setting the flag is NOT
    done (the whole point is to supersede the default kill); `restore()`
    reinstates the original handlers. Only usable from the main thread
    (CPython signal rule) — construct it in the CLI, not in workers.
    """

    def __init__(self, signals=(signal.SIGTERM, signal.SIGINT)):
        self.triggered = False
        self._prev = {}
        for s in signals:
            self._prev[s] = signal.signal(s, self._handle)

    def _handle(self, signum, frame):
        self.triggered = True

    def restore(self):
        for s, h in self._prev.items():
            signal.signal(s, h)
        self._prev = {}
