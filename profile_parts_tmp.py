import time, jax, jax.numpy as jnp, numpy as np
from __graft_entry__ import _full_size_dex, _style_inputs
from dex_tts_tpu.models.edm import SamplerConfig, ablation_sampler
from dex_tts_tpu.models.tts import DeXTTS

b, tx, ty, t_ref = 8, 96, 1024, 256
model = _full_size_dex()
rng = np.random.default_rng(0)
x = jnp.asarray(rng.integers(1, 148, (b, tx)), jnp.int32)
xl = jnp.full((b,), tx, jnp.int32)
style = {k: (jnp.asarray(rng.standard_normal(v.shape), jnp.float32) if v.dtype == jnp.float32 else v)
         for k, v in _style_inputs(b, 80, t_ref).items()}

@jax.jit
def _init():
    return model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jax.random.PRNGKey(2), x, xl, y_max_length=ty,
        sampler=SamplerConfig(num_steps=2), **style, method=DeXTTS.synthesize)
v = _init()

def bench(fn, *args, iters=3):
    out = fn(*args); float(jnp.sum(jax.tree.leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args); float(jnp.sum(jax.tree.leaves(out)[0]))
    return (time.perf_counter() - t0) / iters

# phase 1: encoders → conditioning tensors
@jax.jit
def encode_phase(v, x, xl, ref, rl, sty, stl, lf0, ll):
    def run(mdl):
        cond = mdl._cond_from_inputs(train=False, ref=ref, ref_lengths=rl,
                                     sty=sty, sty_lengths=stl, lf0=lf0, lf0_lengths=ll)
        mu_x, logw, x_mask = mdl.encoder(x, xl, sty=cond["sty_enc"], train=False)
        return mu_x, logw, x_mask, cond["sty_dec"], cond["ref_stats"]
    return DeXTTS.apply(v, method=run) if False else model.apply(v, method=lambda m: run(m))

out1 = encode_phase(v, x, xl, style["ref"], style["ref_lengths"], style["sty"],
                    style["sty_lengths"], style["lf0"], style["lf0_lengths"])
mu_x, logw, x_mask, sty_dec, ref_stats = out1
print("phase1 ok", flush=True)

# build mu_y etc on host side shapes: do in a small jit
from dex_tts_tpu.ops import sequence_mask, generate_path
@jax.jit
def expand(mu_x, logw, x_mask):
    w = jnp.exp(logw[:, :, 0]) * x_mask[:, :, 0]
    w_ceil = jnp.ceil(w)
    y_lengths = jnp.minimum(jnp.maximum(jnp.sum(w_ceil, axis=1), 1.0), ty).astype(jnp.int32)
    y_mask = sequence_mask(y_lengths, ty).astype(mu_x.dtype)
    attn = generate_path(w_ceil, x_mask[:, :, 0][:, :, None] * y_mask[:, None, :])
    mu_y = jnp.einsum("bxt,bxf->bft", attn, mu_x)
    return mu_y, y_mask[:, None, :]
mu_y, mask3 = expand(mu_x, logw, x_mask)

# phase 2: sampler with all conditioning as ARGS
@jax.jit
def sample_phase(v, key, mu_y, mask3, sty_dec, rm, rs, stl):
    def denoise_fn(z, t):
        def run(mdl):
            return mdl.decoder(z, mask3, mu_y, t, ref=(rm, rs), sty=sty_dec,
                               sty_lengths=stl, train=False)
        return model.apply(v, method=lambda m: run(m))
    latents = jax.random.normal(key, mu_y.shape) / 1.5 + mu_y
    return ablation_sampler(key, denoise_fn, latents, SamplerConfig(num_steps=50))

t2 = bench(sample_phase, v, jax.random.PRNGKey(3), mu_y, mask3, sty_dec,
           ref_stats[0], ref_stats[1], style["sty_lengths"])
print(f"two-phase: 50-step sampler with real-arg conditioning: {t2:.3f}s", flush=True)
