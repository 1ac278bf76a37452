"""TPU-only: full-synthesis output parity, f32 vs bf16 denoiser."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from __graft_entry__ import _full_size_dex, _style_inputs
from dex_tts_tpu.models.edm import SamplerConfig
from dex_tts_tpu.models.tts import DeXTTS


b, tx, ty, t_ref = 2, 64, 256, 128
rng = np.random.default_rng(0)
x = jnp.asarray(rng.integers(1, 148, (b, tx)), jnp.int32)
xl = jnp.full((b,), tx, jnp.int32)
style = {k: (jnp.asarray(rng.standard_normal(v.shape) * 0.3, jnp.float32)
             if v.dtype == jnp.float32 else v)
         for k, v in _style_inputs(b, 80, t_ref).items()}

m32 = _full_size_dex().clone(compute_dtype="float32")
m16 = _full_size_dex().clone(compute_dtype="bfloat16")

@jax.jit
def _init():
    return m32.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                    jax.random.PRNGKey(2), x, xl, y_max_length=ty,
                    sampler=SamplerConfig(num_steps=2), **style, method=DeXTTS.synthesize)
v = _init()

def run(model):
    f = jax.jit(lambda v: model.apply(v, jax.random.PRNGKey(3), x, xl,
                y_max_length=ty, sampler=SamplerConfig(num_steps=50),
                temperature=1.5, **style, method=DeXTTS.synthesize))
    return np.asarray(f(v)[1])

a = run(m32); c = run(m16)
mae = np.abs(a - c).mean(); ref = np.abs(a).mean()
print(f"bf16-vs-f32 synthesis mel MAE: {mae:.5f} (mean |mel| {ref:.3f}, rel {mae/ref:.4f})")
