"""TPU: interleaved A/B of exact vs DiT-cache turbo sampling at bench
shapes (batch 16, 768 frames, 50 steps), plus the mel deviation of the
approximation. Params are perturbed first: at init the DiT is
adaLN-Zero (output exactly 0), which would make the cached path
trivially exact and the deviation numbers fiction.

Run on the TPU: python scripts/perf_turbo.py
"""
import sys, time
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
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
# perturb params: adaLN-Zero DiT outputs exactly 0 at init, which would
# make the cached path trivially exact
leaves, treedef = jax.tree.flatten(variables["params"])
ks = jax.random.split(jax.random.PRNGKey(9), len(leaves))
variables = {**variables, "params": jax.tree.unflatten(
    treedef, [p + 0.02 * jax.random.normal(k, p.shape, p.dtype)
              for p, k in zip(leaves, ks)])}
key = jax.random.PRNGKey(4)

def make(interval):
    cfg = SamplerConfig(num_steps=50, dit_cache_interval=interval)
    @jax.jit
    def f(variables, key):
        return model.apply(variables, key, x, xl, y_max_length=ty,
                           sampler=cfg, temperature=1.5, **style,
                           method=DeXTTS.synthesize)[1]
    return f

fns = {i: make(i) for i in (1, 2, 5)}
mels = {}
for i, f in fns.items():
    t0 = time.time()
    mels[i] = jax.device_get(f(variables, key))
    print(f"interval {i}: first call {time.time()-t0:.1f}s", flush=True)

for i in (2, 5):
    rel = np.linalg.norm(mels[i] - mels[1]) / np.linalg.norm(mels[1])
    mae = np.abs(mels[i] - mels[1]).mean()
    print(f"interval {i}: rel L2 {rel:.4f}  mel-MAE {mae:.4f} "
          f"(exact mel std {mels[1].std():.3f})", flush=True)

acc = {i: [] for i in fns}
for r in range(4):
    for i, f in fns.items():
        t0 = time.time()
        float(jnp.sum(f(variables, key)))
        acc[i].append(time.time() - t0)
audio_s = b * ty * 256 / 22050
for i, ts in acc.items():
    m = min(ts)
    print(f"interval {i}: min {m*1e3:.1f} ms  RTF {m/audio_s:.5f}", flush=True)
