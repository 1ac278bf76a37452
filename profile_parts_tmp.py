import time, jax, jax.numpy as jnp, numpy as np
from dex_tts_tpu.models.dit import DiT, DiTConfig
from dex_tts_tpu.models.unet import DiffusionDenoiser

B, F, W = 8, 80, 1024

def bench(fn, *args, iters=5):
    out = fn(*args); float(jnp.sum(jax.tree.leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args); float(jnp.sum(jax.tree.leaves(out)[0]))
    return (time.perf_counter() - t0) / iters

for dt in ("float32", "bfloat16"):
    dit_cfg = DiTConfig(patch_size=3, stride_size=2, hidden_size=256, depth=4,
                        num_heads=2, mlp_ratio=2.0, conv_pos=16, conv_pos_groups=8,
                        in_channels=128, grid_h=20, dtype=dt)
    den = DiffusionDenoiser(dim=64, dim_mults=(1,2), n_feats=80, dit_cfg=dit_cfg, dtype=dt)
    xx = jnp.zeros((B, F, W)); mask3 = jnp.ones((B, 1, W)); mu = jnp.zeros((B, F, W)); t = jnp.zeros((B,))
    vd = jax.jit(lambda: den.init(jax.random.PRNGKey(0), xx, mask3, mu, t))()
    den_fn = jax.jit(lambda v, x: den.apply(v, x, mask3, mu, t))
    print(f"denoiser step {dt}: %.4fs" % bench(den_fn, vd, xx), flush=True)

    # DiT alone
    dit = DiT(dit_cfg)
    x_mid = jnp.zeros((B, 40, 512, 128))
    mask_mid = jnp.ones((B, 1, 512, 1))
    v = jax.jit(lambda: dit.init(jax.random.PRNGKey(0), x_mid, mask_mid, t))()
    dit_fn = jax.jit(lambda v, x: dit.apply(v, x, mask_mid, t))
    print(f"  dit {dt}: %.4fs" % bench(dit_fn, v, x_mid), flush=True)
