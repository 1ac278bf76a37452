"""Full-denoiser numerical parity: torch twin (reference naming) → converter
→ flax DiffusionDenoiser. Covers the U-Net blocks, Rezero linear attention,
TV/TIV adaptors, and the DiT middle block in one shot."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from dex_tts_tpu.convert import denoiser_torch_to_flax  # noqa: E402
from dex_tts_tpu.models.dit import DiTConfig  # noqa: E402
from dex_tts_tpu.models.unet import DiffusionDenoiser  # noqa: E402
from tests.torch_twins import DenoiserTwin  # noqa: E402

DIM, N_FEATS, W, TS = 8, 16, 18, 12
DIT_KW = dict(patch=3, stride=2, hidden=32, depth=2, num_heads=2,
              mlp_ratio=2.0, conv_pos=4, conv_pos_groups=2)


def build_pair():
    torch.manual_seed(0)
    twin = DenoiserTwin(dim=DIM, n_feats=N_FEATS, dit_kwargs=DIT_KW).eval()
    # shake params away from zero-ish inits for a stronger check
    with torch.no_grad():
        for p in twin.parameters():
            p.add_(0.05 * torch.randn_like(p))

    state = {
        f"decoder.denoise_fn.{k}": v.numpy() for k, v in twin.state_dict().items()
    }
    params = denoiser_torch_to_flax(
        state, n_res=2, dit_depth=DIT_KW["depth"], use_style=True
    )
    dit_cfg = DiTConfig(
        patch_size=3, stride_size=2, hidden_size=32, depth=2, num_heads=2,
        mlp_ratio=2.0, conv_pos=4, conv_pos_groups=2,
        in_channels=DIM * 2, grid_h=(N_FEATS // 2) // 2,
    )
    model = DiffusionDenoiser(
        dim=DIM, dim_mults=(1, 2), n_feats=N_FEATS, dit_cfg=dit_cfg,
        use_style=True,
    )
    return twin, model, params


def test_denoiser_matches_torch_twin():
    twin, model, params = build_pair()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, N_FEATS, W)).astype(np.float32)
    mu = rng.standard_normal((2, N_FEATS, W)).astype(np.float32)
    t = np.asarray([0.3, -1.2], np.float32)
    mask = np.ones((2, 1, W), np.float32)
    mask[1, :, 14:] = 0.0
    mid_c = DIM * 2
    ref_means = rng.standard_normal((2, 5, mid_c)).astype(np.float32)
    ref_stds = rng.uniform(0.5, 2.0, (2, 5, mid_c)).astype(np.float32)
    sty = rng.standard_normal((2, TS, mid_c)).astype(np.float32)
    sty_mask = np.ones((2, TS), np.float32)
    sty_mask[1, 9:] = 0.0

    with torch.no_grad():
        want = twin(
            torch.from_numpy(x),
            torch.from_numpy(mask),
            torch.from_numpy(mu),
            torch.from_numpy(t),
            (torch.from_numpy(ref_means), torch.from_numpy(ref_stds)),
            torch.from_numpy(sty.transpose(0, 2, 1)),  # (B, C, Ts)
            torch.from_numpy(sty_mask).unsqueeze(1),  # (B, 1, Ts)
        ).numpy()

    sty_lengths = jnp.asarray(sty_mask.sum(axis=1), jnp.int32)
    got = np.asarray(
        model.apply(
            {"params": params},
            jnp.asarray(x),
            jnp.asarray(mask),
            jnp.asarray(mu),
            jnp.asarray(t),
            ref=(jnp.asarray(ref_means), jnp.asarray(ref_stds)),
            sty=jnp.asarray(sty),
            sty_lengths=sty_lengths,
        )
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_converter_tree_matches_model_init():
    """Converter output structure == model.init structure (completeness)."""
    twin, model, params = build_pair()
    x = jnp.zeros((1, N_FEATS, W))
    mask = jnp.ones((1, 1, W))
    t = jnp.zeros((1,))
    ref = (jnp.zeros((1, 5, DIM * 2)), jnp.ones((1, 5, DIM * 2)))
    sty = jnp.zeros((1, TS, DIM * 2))
    init = model.init(
        jax.random.PRNGKey(0), x, mask, x, t, ref=ref, sty=sty,
        sty_lengths=jnp.asarray([TS], jnp.int32),
    )["params"]

    from flax.traverse_util import flatten_dict

    want_tree = {
        "/".join(k): v.shape for k, v in flatten_dict(init).items()
    }
    got_tree = {
        "/".join(k): np.asarray(v).shape for k, v in flatten_dict(params).items()
    }
    assert got_tree == want_tree
