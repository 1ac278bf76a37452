import time, jax, jax.numpy as jnp, numpy as np
import flax.linen as nn
from dex_tts_tpu.models.dit import DiTConfig, PatchEmbed2D, ConvTimePosEmbed, DiTBlock, FinalLayer

B = 8
cfg = DiTConfig(patch_size=3, stride_size=2, hidden_size=256, depth=4,
                num_heads=2, mlp_ratio=2.0, conv_pos=16, conv_pos_groups=8,
                in_channels=128, grid_h=20)

def bench(fn, *args, iters=5):
    out = fn(*args); float(jnp.sum(jax.tree.leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args); float(jnp.sum(jax.tree.leaves(out)[0]))
    return (time.perf_counter() - t0) / iters

x_mid = jnp.zeros((B, 40, 513, 128))  # padded W to mult of 3
pe = PatchEmbed2D(cfg)
v = jax.jit(lambda: pe.init(jax.random.PRNGKey(0), x_mid))()
f = jax.jit(lambda v, x: pe.apply(v, x))
print("patch_embed: %.4fs" % bench(f, v, x_mid), flush=True)

xe = jnp.zeros((B, 20, 257, 256))
cp = ConvTimePosEmbed(cfg)
v2 = jax.jit(lambda: cp.init(jax.random.PRNGKey(0), xe))()
f2 = jax.jit(lambda v, x: cp.apply(v, x))
print("pos_conv: %.4fs" % bench(f2, v2, xe), flush=True)

tokens = jnp.zeros((B, 20*257, 256))
c = jnp.zeros((B, 256))
blk = DiTBlock(cfg)
v3 = jax.jit(lambda: blk.init(jax.random.PRNGKey(0), tokens, c))()
f3 = jax.jit(lambda v, t: blk.apply(v, t, c))
print("dit_block (1 of 4): %.4fs" % bench(f3, v3, tokens), flush=True)

fl = FinalLayer(cfg)
v4 = jax.jit(lambda: fl.init(jax.random.PRNGKey(0), tokens, c))()
f4 = jax.jit(lambda v, t: fl.apply(v, t, c))
print("final_layer: %.4fs" % bench(f4, v4, tokens), flush=True)
