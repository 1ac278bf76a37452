"""Sampler benchmark sweep: EDM vs VE/VP discretizations at 10/25/50/100
steps (SURVEY §7.10; BASELINE config 3). Run on a TPU host.

Prints one JSON line per configuration:
  {"solver", "discretization", "steps", "rtf", "wall_s"}

NB: the reference leaves VE/VP *preconditioning* as an unfinished ToDo
(reference: README.md:36); what exists — and what this sweeps — are the
sampler's ve/vp discretizations/schedules (reference: model/edm.py:137-142)
over the EDM-preconditioned network.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from __graft_entry__ import _full_size_dex, _style_inputs
from dex_tts_tpu.models.edm import SamplerConfig
from dex_tts_tpu.models.tts import DeXTTS

SR, HOP = 22050, 256


def main():
    b, tx, ty, t_ref = 16, 96, 768, 256
    model = _full_size_dex()
    x = jnp.ones((b, tx), jnp.int32)
    xl = jnp.full((b,), tx, jnp.int32)
    style = _style_inputs(b, 80, t_ref)

    @jax.jit
    def _init():
        return model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            jax.random.PRNGKey(2), x, xl, y_max_length=ty,
            sampler=SamplerConfig(num_steps=2), **style,
            method=DeXTTS.synthesize,
        )

    variables = _init()
    audio_s = b * ty * HOP / SR

    configs = []
    for steps in (10, 25, 50, 100):
        configs.append(("euler", "edm", "linear", "none", steps))
    for disc, sched, scal in (("ve", "ve", "none"), ("vp", "vp", "vp")):
        configs.append(("euler", disc, sched, scal, 50))
    configs.append(("heun", "edm", "linear", "none", 25))
    for steps in (16, 25):
        configs.append(("dpmpp2m", "edm", "linear", "none", steps))

    for solver, disc, sched, scal, steps in configs:
        cfg = SamplerConfig(
            num_steps=steps, solver=solver, discretization=disc,
            schedule=sched, scaling=scal,
        )

        @jax.jit
        def synth(v, key, cfg=cfg):
            return model.apply(
                v, key, x, xl, y_max_length=ty, sampler=cfg,
                temperature=1.5, **style, method=DeXTTS.synthesize,
            )

        out = synth(variables, jax.random.PRNGKey(3))
        float(jnp.sum(out[1]))
        t0 = time.perf_counter()
        for i in range(2):
            out = synth(variables, jax.random.PRNGKey(4 + i))
            float(jnp.sum(out[1]))
        wall = (time.perf_counter() - t0) / 2
        print(
            json.dumps(
                {
                    "solver": solver,
                    "discretization": disc,
                    "schedule": sched,
                    "scaling": scal,
                    "steps": steps,
                    "wall_s": round(wall, 3),
                    "rtf": round(wall / audio_s, 6),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
