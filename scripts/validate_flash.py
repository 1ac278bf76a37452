"""TPU-only validation: DiT flash/splash attention paths vs the einsum path.

Run on a TPU host: python scripts/validate_flash.py
(The pytest suite runs on the CPU backend where the pallas TPU kernel is
unavailable; this script is the runtime parity check for the flash path.)
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dex_tts_tpu.models.dit import DiT, DiTConfig


def main():
    assert jax.default_backend() in ("tpu",), jax.default_backend()
    rng = np.random.default_rng(0)
    b, h_in, w_in, c = 4, 40, 230, 128
    x = jnp.asarray(rng.standard_normal((b, h_in, w_in, c)), jnp.float32)
    mask = jnp.ones((b, 1, w_in, 1))
    t = jnp.asarray(rng.standard_normal(b), jnp.float32)

    base = dict(patch_size=3, stride_size=2, hidden_size=256, depth=4,
                num_heads=2, mlp_ratio=2.0, conv_pos=16, conv_pos_groups=8,
                in_channels=c, grid_h=20)
    einsum_dit = DiT(DiTConfig(**base, attention="einsum"))
    flash_dit = DiT(DiTConfig(**base, attention="flash"))
    flash16_dit = DiT(DiTConfig(**base, attention="flash_bf16"))
    splash16_dit = DiT(DiTConfig(**base, attention="splash_bf16"))

    v = jax.jit(lambda: einsum_dit.init(jax.random.PRNGKey(0), x, mask, t))()
    # perturb all params away from the adaLN-Zero/final-layer zero inits —
    # otherwise the DiT output is identically zero and the check is vacuous
    leaves, tree = jax.tree.flatten(v)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    v = jax.tree.unflatten(
        tree,
        [l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
         for l, k in zip(leaves, keys)],
    )
    ref = jax.jit(lambda v: einsum_dit.apply(v, x, mask, t))(v)
    for name, m in (("flash", flash_dit), ("flash_bf16", flash16_dit),
                    ("splash_bf16", splash16_dit)):
        out = jax.jit(lambda v, m=m: m.apply(v, x, mask, t))(v)
        diff = float(jnp.max(jnp.abs(out - ref)))
        scale = float(jnp.max(jnp.abs(ref)))
        print(f"{name}: max abs diff {diff:.2e} (ref max {scale:.2e})")
        assert diff < 5e-3 * max(scale, 1.0), (name, diff)
    print("flash attention parity OK")


if __name__ == "__main__":
    main()
