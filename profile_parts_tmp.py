import time, jax, jax.numpy as jnp, numpy as np
import flax.linen as nn

B = 8
rng = np.random.default_rng(0)
def bench(fn, *args, iters=5):
    out = fn(*args); float(jnp.sum(jax.tree.leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args); float(jnp.sum(jax.tree.leaves(out)[0]))
    return (time.perf_counter() - t0) / iters
triv = jax.jit(lambda x: x + 1.0)
OVER = bench(triv, jnp.ones((8,8)), iters=10)

class Convs(nn.Module):
    dtype: str = "float32"
    @nn.compact
    def __call__(self, x):
        for i in range(4):
            x = nn.Conv(64, (3,3), padding=[(1,1),(1,1)], dtype=jnp.dtype(self.dtype))(x)
        return x

x32 = jnp.asarray(rng.standard_normal((B, 80, 1024, 64)), jnp.float32)
x16 = x32.astype(jnp.bfloat16)

m32 = Convs(); v32 = jax.jit(lambda: m32.init(jax.random.PRNGKey(0), x32))()
print("convs f32: %.4f" % (bench(jax.jit(lambda v,x: m32.apply(v,x)), v32, x32) - OVER), flush=True)

m16 = Convs(dtype="bfloat16")
v16 = jax.jit(lambda: m16.init(jax.random.PRNGKey(0), x16))()
print("convs bf16 (f32 params, bf16 compute): %.4f" % (bench(jax.jit(lambda v,x: m16.apply(v,x)), v16, x16) - OVER), flush=True)

v16b = jax.tree.map(lambda p: p.astype(jnp.bfloat16), v16)
print("convs bf16 (bf16 params+inputs): %.4f" % (bench(jax.jit(lambda v,x: m16.apply(v,x)), v16b, x16) - OVER), flush=True)

# lax-level conv with preferred_element_type
import jax.lax as lax
k = jnp.asarray(rng.standard_normal((3,3,64,64)), jnp.float32)
def raw(x, k):
    for _ in range(4):
        x = lax.conv_general_dilated(x, k, (1,1), [(1,1),(1,1)],
                                     dimension_numbers=("NHWC","HWIO","NHWC"))
    return x
print("raw conv f32: %.4f" % (bench(jax.jit(raw), x32, k) - OVER), flush=True)
k16 = k.astype(jnp.bfloat16)
def raw16(x, k):
    for _ in range(4):
        x = lax.conv_general_dilated(x, k, (1,1), [(1,1),(1,1)],
                                     dimension_numbers=("NHWC","HWIO","NHWC"),
                                     preferred_element_type=jnp.bfloat16)
    return x
print("raw conv bf16: %.4f" % (bench(jax.jit(raw16), x16, k16) - OVER), flush=True)
