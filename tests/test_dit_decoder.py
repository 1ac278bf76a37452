"""Parity of the DiT `use_decoder=True` lightweight-decoder variant
(reference: DEX-TTS/model/dit.py:383-398,466-477,505-506 — off in every
reference config, implemented for component completeness)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from dex_tts_tpu.convert import _dit  # noqa: E402
from dex_tts_tpu.models.dit import DiT, DiTConfig  # noqa: E402
from tests.torch_twins import DiTTwin  # noqa: E402

C, H, W = 16, 8, 18
KW = dict(patch=3, stride=2, hidden=32, depth=2, num_heads=2,
          mlp_ratio=2.0, conv_pos=4, conv_pos_groups=2)


def test_dit_decoder_variant_matches_torch_twin():
    torch.manual_seed(0)
    twin = DiTTwin(C, grid_h=H // 2, use_decoder=True, **KW).eval()
    with torch.no_grad():
        for p in twin.parameters():
            p.add_(0.05 * torch.randn_like(p))

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, C, H, W)).astype(np.float32)
    mask = np.ones((2, 1, 1, W), np.float32)
    mask[1, ..., 15:] = 0.0
    t = np.asarray([0.4, -0.9], np.float32)

    with torch.no_grad():
        want = twin(
            torch.from_numpy(x), torch.from_numpy(mask), torch.from_numpy(t)
        ).numpy()

    state = {f"vit.{k}": v.numpy() for k, v in twin.state_dict().items()}
    params = _dit(state, "vit", depth=KW["depth"], use_decoder=True)
    cfg = DiTConfig(
        in_channels=C, patch_size=3, stride_size=2, hidden_size=32, depth=2,
        num_heads=2, mlp_ratio=2.0, conv_pos=4, conv_pos_groups=2,
        grid_h=H // 2, use_decoder=True,
    )
    model = DiT(cfg)
    got = np.asarray(
        model.apply(
            {"params": params},
            jnp.asarray(x.transpose(0, 2, 3, 1)),  # NHWC
            jnp.asarray(mask[:, 0, 0, :][:, None, :, None]),  # (B,1,W,1)
            jnp.asarray(t),
        )
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_dit_decoder_param_tree_matches_converter():
    torch.manual_seed(1)
    twin = DiTTwin(C, grid_h=H // 2, use_decoder=True, **KW)
    state = {f"vit.{k}": v.numpy() for k, v in twin.state_dict().items()}
    params = _dit(state, "vit", depth=KW["depth"], use_decoder=True)

    cfg = DiTConfig(
        in_channels=C, patch_size=3, stride_size=2, hidden_size=32, depth=2,
        num_heads=2, mlp_ratio=2.0, conv_pos=4, conv_pos_groups=2,
        grid_h=H // 2, use_decoder=True,
    )
    init = DiT(cfg).init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, H, W, C)),
        jnp.ones((1, 1, W, 1)),
        jnp.zeros((1,)),
    )["params"]
    from flax.traverse_util import flatten_dict

    want = {"/".join(k): v.shape for k, v in flatten_dict(init).items()}
    got = {
        "/".join(k): np.asarray(v).shape for k, v in flatten_dict(params).items()
    }
    assert got == want
