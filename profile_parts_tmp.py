import time, jax, jax.numpy as jnp, numpy as np
import flax.linen as nn
from dex_tts_tpu.models.unet import ResnetBlock, Block

B = 8
rng = np.random.default_rng(0)
r = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)

def bench(fn, *args, iters=5):
    out = fn(*args); float(jnp.sum(jax.tree.leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args); float(jnp.sum(jax.tree.leaves(out)[0]))
    return (time.perf_counter() - t0) / iters

triv = jax.jit(lambda x: x + 1.0)
OVER = bench(triv, r(8, 8), iters=10)
print("overhead %.4f" % OVER, flush=True)

# 4 conv3x3 at full res, chained (the raw matmul cost)
class Convs(nn.Module):
    @nn.compact
    def __call__(self, x):
        for i in range(4):
            x = nn.Conv(64, (3,3), padding=[(1,1),(1,1)])(x)
        return x
x = r(B, 80, 1024, 64)
m = Convs(); v = jax.jit(lambda: m.init(jax.random.PRNGKey(0), x))()
print("4x conv3x3 (80,1024,64): %.4f" % (bench(jax.jit(lambda v,x: m.apply(v,x)), v, x) - OVER), flush=True)

# 2 full ResnetBlocks at full res (8 elementwise-heavy stages)
class Blocks(nn.Module):
    @nn.compact
    def __call__(self, x, mask, t):
        x = ResnetBlock(64, name="a")(x, mask, t)
        x = ResnetBlock(64, name="b")(x, mask, t)
        return x
mask = jnp.ones((B,1,1024,1)); t = r(B, 64)
mb = Blocks(); vb = jax.jit(lambda: mb.init(jax.random.PRNGKey(0), x, mask, t))()
print("2x ResnetBlock (80,1024,64): %.4f" % (bench(jax.jit(lambda v,x: mb.apply(v,x,mask,t)), vb, x) - OVER), flush=True)
