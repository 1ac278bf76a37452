"""TPU microbench: per-stage breakdown of one denoiser step at bench shapes.

Times (a) the full denoiser, (b) U-Net without DiT/adaptors (einsum-free
variant via depth-0 DiT is not possible, so: DiT alone at mid shapes),
(c) LinearAttention blocks alone, (d) GroupNorm+conv Block alone — all as
separate jits with random jit-argument inputs, warm cache, scalar
materialization per iteration (axon remote semantics).

Run on the TPU: python scripts/profile_denoiser.py [--b 16] [--w 768]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dex_tts_tpu.models.dit import DiT, DiTConfig
from dex_tts_tpu.models.unet import (
    Block,
    DiffusionDenoiser,
    LinearAttention,
    ResnetBlock,
)

DT = "bfloat16"


from dex_tts_tpu.utils.timing import time_fn


def timeit(fn, *args, iters=5):
    return time_fn(fn, *args, iters=iters)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--b", type=int, default=16)
    p.add_argument("--w", type=int, default=768)
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args()
    b, w = args.b, args.w
    rng = np.random.default_rng(0)
    dt = jnp.dtype(DT)

    dit_cfg = DiTConfig(
        in_channels=128, patch_size=3, stride_size=2, hidden_size=256,
        depth=4, num_heads=2, mlp_ratio=2.0, conv_pos=16, conv_pos_groups=8,
        grid_h=20, dtype=DT, attention="flash_bf16",
    )
    model = DiffusionDenoiser(
        dim=64, dim_mults=(1, 2), n_feats=80, dit_cfg=dit_cfg,
        use_style=True, dtype=DT,
    )

    x = jnp.asarray(rng.standard_normal((b, 80, w)), jnp.float32)
    mu = jnp.asarray(rng.standard_normal((b, 80, w)), jnp.float32)
    mask = jnp.ones((b, 1, w), jnp.float32)
    t = jnp.asarray(rng.uniform(-1, 1, (b,)), jnp.float32)
    ref = (
        jnp.asarray(rng.standard_normal((b, 6, 128)), jnp.float32),
        jnp.asarray(rng.uniform(0.5, 2.0, (b, 6, 128)), jnp.float32),
    )
    sty = jnp.asarray(rng.standard_normal((b, 256, 128)), jnp.float32)
    sty_lengths = jnp.full((b,), 256, jnp.int32)

    variables = jax.jit(
        lambda: model.init(
            jax.random.PRNGKey(0), x, mask, mu, t, ref=ref, sty=sty,
            sty_lengths=sty_lengths,
        )
    )()

    @jax.jit
    def full(v, x, mask, mu, t, ref, sty):
        return model.apply(v, x, mask, mu, t, ref=ref, sty=sty,
                           sty_lengths=sty_lengths)

    print(f"full denoiser: {timeit(full, variables, x, mask, mu, t, ref, sty, iters=args.iters)*1e3:.2f} ms")

    # DiT alone at mid shapes (B, 40, w/2, 128)
    h_mid = jnp.asarray(rng.standard_normal((b, 40, w // 2, 128)), dt)
    m_mid = jnp.ones((b, 1, w // 2, 1), dt)
    dit = DiT(dit_cfg)
    dvars = jax.jit(lambda: dit.init(jax.random.PRNGKey(0), h_mid, m_mid, t))()

    @jax.jit
    def dit_f(v, h, m, t):
        return dit.apply(v, h, m, t)

    print(f"DiT alone:     {timeit(dit_f, dvars, h_mid, m_mid, t, iters=args.iters)*1e3:.2f} ms")

    # LinearAttention at level-0 shapes (B, 80, w, 64)
    h0 = jnp.asarray(rng.standard_normal((b, 80, w, 64)), dt)
    la = LinearAttention(dtype=DT)
    lvars = jax.jit(lambda: la.init(jax.random.PRNGKey(0), h0))()

    @jax.jit
    def la_f(v, h):
        return la.apply(v, h)

    print(f"LinearAttn L0: {timeit(la_f, lvars, h0, iters=args.iters)*1e3:.2f} ms")

    h1 = jnp.asarray(rng.standard_normal((b, 40, w // 2, 128)), dt)
    l1vars = jax.jit(lambda: la.init(jax.random.PRNGKey(0), h1))()
    print(f"LinearAttn L1: {timeit(la_f, l1vars, h1, iters=args.iters)*1e3:.2f} ms")

    # one conv Block (conv3x3 + GN + mish) at level-0 shapes
    blk = Block(64, dtype=DT)
    m0 = jnp.ones((b, 1, w, 1), dt)
    bvars = jax.jit(lambda: blk.init(jax.random.PRNGKey(0), h0, m0))()

    @jax.jit
    def blk_f(v, h, m):
        return blk.apply(v, h, m)

    print(f"Block L0:      {timeit(blk_f, bvars, h0, m0, iters=args.iters)*1e3:.2f} ms")

    # one ResnetBlock at level-0
    rb = ResnetBlock(64, dtype=DT)
    temb = jnp.asarray(rng.standard_normal((b, 64)), jnp.float32)
    rvars = jax.jit(lambda: rb.init(jax.random.PRNGKey(0), h0, m0, temb))()

    @jax.jit
    def rb_f(v, h, m, te):
        return rb.apply(v, h, m, te)

    print(f"ResnetBlk L0:  {timeit(rb_f, rvars, h0, m0, temb, iters=args.iters)*1e3:.2f} ms")


if __name__ == "__main__":
    main()
