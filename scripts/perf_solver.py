"""TPU: interleaved A/B of euler vs DPM-Solver++(2M) sampling at bench
shapes (batch 16, 768 frames), plus mel deviation of each config from
the 50-step euler baseline. Params are perturbed first: at init the DiT
is adaLN-Zero (output exactly 0), which would flatten the ODE and make
the deviation numbers fiction.

Run on the TPU: python scripts/perf_solver.py
"""
import sys, time
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# CLI parse + validation FIRST — a bad arg after the ~1-2 min tunnel
# compile below would waste the whole run. Override configs as e.g.
# `euler:50 dpmpp2m:16`.
CONFIGS = [("euler", 50), ("euler", 25), ("dpmpp2m", 25), ("dpmpp2m", 16)]
KNOWN_SOLVERS = {"euler", "heun", "dpmpp2m"}
if len(sys.argv) > 1:
    CONFIGS = []
    for s in sys.argv[1:]:
        solver, sep, steps = s.partition(":")
        if not sep or solver not in KNOWN_SOLVERS or not steps.isdigit():
            sys.exit(
                f"bad config {s!r}; usage: perf_solver.py [solver:steps ...]"
                f" with solver in {sorted(KNOWN_SOLVERS)}"
            )
        CONFIGS.append((solver, int(steps)))

import jax, jax.numpy as jnp, numpy as np
from __graft_entry__ import _full_size_dex, _style_inputs
from dex_tts_tpu.models.edm import SamplerConfig
from dex_tts_tpu.models.tts import DeXTTS

b, tx, ty, t_ref = 16, 96, 768, 256
model = _full_size_dex()
x = jnp.asarray(np.random.default_rng(1).integers(1, 148, (b, tx)), jnp.int32)
xl = jnp.full((b,), tx, jnp.int32)
style = _style_inputs(b, 80, t_ref)

@jax.jit
def _init():
    return model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jax.random.PRNGKey(2), x, xl, y_max_length=ty,
        sampler=SamplerConfig(num_steps=2), **style,
        method=DeXTTS.synthesize)

variables = _init()
leaves, treedef = jax.tree.flatten(variables["params"])
ks = jax.random.split(jax.random.PRNGKey(9), len(leaves))
variables = {**variables, "params": jax.tree.unflatten(
    treedef, [p + 0.02 * jax.random.normal(k, p.shape, p.dtype)
              for p, k in zip(leaves, ks)])}
key = jax.random.PRNGKey(4)

def make(solver, steps):
    cfg = SamplerConfig(num_steps=steps, solver=solver)
    @jax.jit
    def f(variables, key):
        return model.apply(variables, key, x, xl, y_max_length=ty,
                           sampler=cfg, temperature=1.5, **style,
                           method=DeXTTS.synthesize)[1]
    return f

fns = {c: make(*c) for c in CONFIGS}
mels = {}
for c, f in fns.items():
    t0 = time.time()
    mels[c] = jax.device_get(f(variables, key))
    print(f"{c}: first call {time.time()-t0:.1f}s", flush=True)

base = mels.get(("euler", 50))
for c in [c for c in CONFIGS if c != ("euler", 50)] if base is not None else []:
    rel = np.linalg.norm(mels[c] - base) / np.linalg.norm(base)
    mae = np.abs(mels[c] - base).mean()
    print(f"{c}: vs euler@50  rel L2 {rel:.4f}  mel-MAE {mae:.4f} "
          f"(baseline mel std {base.std():.3f})", flush=True)

acc = {c: [] for c in fns}
for r in range(4):  # interleaved — tunnel throughput drifts ±25%
    for c, f in fns.items():
        t0 = time.time()
        float(jnp.sum(f(variables, key)))
        acc[c].append(time.time() - t0)
audio_s = b * ty * 256 / 22050
for c, ts in acc.items():
    m = min(ts)
    print(f"{c}: min {m*1e3:.1f} ms  RTF {m/audio_s:.5f}", flush=True)
