import time, jax, jax.numpy as jnp, numpy as np
from __graft_entry__ import _full_size_dex, _style_inputs
from dex_tts_tpu.models.dit import DiTConfig
from dex_tts_tpu.models.unet import DiffusionDenoiser
from dex_tts_tpu.models.edm import SamplerConfig, ablation_sampler
from dex_tts_tpu.models.tts import DeXTTS

b, ty, t_ref, N = 8, 1024, 256, 8
rng = np.random.default_rng(0)
r = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
mu_y = r(b, 80, ty); mask3 = jnp.ones((b, 1, ty))
sty_dec = r(b, t_ref, 128); rm, rs = r(b, 6, 128), r(b, 6, 128)
sl = jnp.full((b,), t_ref, jnp.int32)
key = jax.random.PRNGKey(0)

def bench(fn, *args, iters=3):
    out = fn(*args); float(jnp.sum(jax.tree.leaves(out)[0]))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args); float(jnp.sum(jax.tree.leaves(out)[0]))
        ts.append(time.perf_counter() - t0)
    return ts

dit_cfg = DiTConfig(patch_size=3, stride_size=2, hidden_size=256, depth=4,
                    num_heads=2, mlp_ratio=2.0, conv_pos=16, conv_pos_groups=8,
                    in_channels=128, grid_h=20)
den = DiffusionDenoiser(dim=64, dim_mults=(1,2), n_feats=80, dit_cfg=dit_cfg, use_style=True)
vd = jax.jit(lambda: den.init(key, mu_y, mask3, mu_y, jnp.zeros((b,)),
             ref=(rm, rs), sty=sty_dec, sty_lengths=sl))()

def fast(v, key, x, mask3_, mu_, rm_, rs_, sty_, sl_):
    def dfn(z, t):
        return den.apply(v, z, mask3_, mu_, t, ref=(rm_, rs_), sty=sty_, sty_lengths=sl_)
    return ablation_sampler(key, dfn, x, SamplerConfig(num_steps=N))

model = _full_size_dex()
x = jnp.ones((b, 96), jnp.int32); xl = jnp.full((b,), 96, jnp.int32)
style = _style_inputs(b, 80, t_ref)
@jax.jit
def _init():
    return model.init({"params": key, "dropout": key}, key, x, xl,
                      y_max_length=ty, sampler=SamplerConfig(num_steps=2),
                      **style, method=DeXTTS.synthesize)
v = _init()
def slow(v, key, x0, mask3_, mu_, rm_, rs_, sty_, sl_):
    def dfn(z, t):
        return model.apply(v, method=lambda m: m.decoder(
            z, mask3_, mu_, t, ref=(rm_, rs_), sty=sty_, sty_lengths=sl_, train=False))
    return ablation_sampler(key, dfn, x0, SamplerConfig(num_steps=N))

fj = jax.jit(fast); sj = jax.jit(slow)
a = (key, mu_y, mask3, mu_y, rm, rs, sty_dec, sl)
print("fast:", ["%.3f" % t for t in bench(fj, vd, *a)], flush=True)
print("slow:", ["%.3f" % t for t in bench(sj, v, *a)], flush=True)
print("fast again:", ["%.3f" % t for t in bench(fj, vd, *a)], flush=True)
print("slow again:", ["%.3f" % t for t in bench(sj, v, *a)], flush=True)
