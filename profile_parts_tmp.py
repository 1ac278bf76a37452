import time, jax, jax.numpy as jnp, numpy as np
from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention, BlockSizes, SegmentIds

B, H, T, D = 8, 2, 5140, 128
rng = np.random.default_rng(0)
r = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32) * 0.1
q, k, v = r(B,H,T,D), r(B,H,T,D), r(B,H,T,D)

def bench(fn, iters=5):
    out = fn(q, k, v); float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(q, k, v); float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters

def make(bq, bk, dtype, Tp):
    def f(q, k, v):
        pad = Tp - T
        qp = jnp.pad(q, ((0,0),(0,0),(0,pad),(0,0))).astype(dtype)
        kp = jnp.pad(k, ((0,0),(0,0),(0,pad),(0,0))).astype(dtype)
        vp = jnp.pad(v, ((0,0),(0,0),(0,pad),(0,0))).astype(dtype)
        seg = (jnp.arange(Tp) >= T).astype(jnp.int32)[None].repeat(B, 0)
        out = flash_attention(qp, kp, vp, segment_ids=SegmentIds(q=seg, kv=seg),
                              sm_scale=D ** -0.5,
                              block_sizes=BlockSizes(block_q=bq, block_k_major=bk, block_k=bk, block_b=1))
        return out[:, :, :T, :].astype(jnp.float32)
    return jax.jit(f)

for bq, bk, dt, tp in [(512,512,jnp.bfloat16,5632), (1024,1024,jnp.bfloat16,6144),
                        (2048,1024,jnp.bfloat16,6144), (1024,512,jnp.bfloat16,5632),
                        (2048,2048,jnp.bfloat16,6144), (512,1024,jnp.bfloat16,6144)]:
    try:
        t = bench(make(bq, bk, dt, tp))
        print(f"bq={bq} bk={bk} Tp={tp}: {t:.4f}s", flush=True)
    except Exception as e:
        print(f"bq={bq} bk={bk}: ERR {str(e)[:70]}", flush=True)
