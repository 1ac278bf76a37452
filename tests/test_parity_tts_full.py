"""FULL-GRAPH text→mel parity: the torch TTSTwin facade (reference wiring,
reference state naming) + the *actual reference* EDM sampler vs our DeXTTS
synthesize() through the checkpoint converter — deterministic (shared
initial noise, 2-step euler sampler). This closes the last unverified seam:
duration→path→prior→sampler wiring (reference: DEX-TTS/model/tts.py:33-74).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from dex_tts_tpu.convert import dex_tts_torch_to_flax  # noqa: E402
from dex_tts_tpu.models.dit import DiTConfig  # noqa: E402
from dex_tts_tpu.models.edm import SamplerConfig  # noqa: E402
from dex_tts_tpu.models.tts import DeXTTS  # noqa: E402
from dex_tts_tpu.ops import fix_len_compatibility  # noqa: E402
from tests.torch_twins import TTSTwin  # noqa: E402

REF = "/root/reference/DEX-TTS"
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.isdir(REF), reason="reference repo not mounted"
    ),
]
if os.path.isdir(REF):
    import importlib.util

    _spec = importlib.util.spec_from_file_location(
        "ref_edm_full", os.path.join(REF, "model", "edm.py")
    )
    _ref_edm = importlib.util.module_from_spec(_spec)
    _spec.loader.exec_module(_ref_edm)

N_VOCAB, N_FEATS, C, HEADS, LAYERS, FFN, DP, DIM = 30, 12, 16, 2, 2, 24, 10, 8
DIT_KW = dict(patch=3, stride=2, hidden=32, depth=2, num_heads=2,
              mlp_ratio=2.0, conv_pos=4, conv_pos_groups=2)
N_STEPS = 2
TEMP = 1.5


def build_pair():
    torch.manual_seed(0)
    twin = TTSTwin(
        n_vocab=N_VOCAB, n_feats=N_FEATS, channels=C, heads=HEADS,
        layers=LAYERS, ffn=FFN, dp_channels=DP, dim=DIM, dit_kwargs=DIT_KW,
    ).eval()
    with torch.no_grad():
        for p in twin.parameters():
            p.add_(0.05 * torch.randn_like(p))

    model = DeXTTS(
        n_vocab=N_VOCAB, n_feats=N_FEATS, enc_channels=C,
        enc_filter_channels=FFN, enc_filter_channels_dp=DP, enc_heads=HEADS,
        enc_layers=LAYERS, dec_dim=DIM, dec_dim_mults=(1, 2),
        dit=DiTConfig(
            patch_size=3, stride_size=2, hidden_size=32, depth=2,
            num_heads=2, mlp_ratio=2.0, conv_pos=4, conv_pos_groups=2,
        ),
        tv_c_h=10, tv_c_out=C, tv_c_out_g=14, tv_layers=2, tv_n_emb=8,
        lf0_c_h=8, lf0_c_out=C, lf0_c_out_g=14, lf0_layers=2,
        tiv_c_h=DIM * 2, tiv_c_out=6, tiv_layers=2,
    )
    state = {k: v.numpy() for k, v in twin.state_dict().items()}
    variables = dex_tts_torch_to_flax(state, model)
    return twin, model, variables


def ref_sampler_fn(denoise_fn, latents, y_mask, mu_y, ref_stats, sty_dec,
                   sty_mask):
    """The actual reference sampler + preconditioner around our twin
    denoiser (reference: DEX-TTS/model/edm.py:74-211, diffusion.py:245)."""

    class _Adapter(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.dfn = denoise_fn

        def forward(self, x, mask, mu, c_noise, ref, ref_lengths, sty,
                    sty_lengths, spk=None, mask_ratio=0):
            if c_noise.numel() == 1:
                # the reference sampler passes a batch-1 noise label (its
                # inference only ever runs batch 1); broadcast for batch>1
                c_noise = c_noise.reshape(1).expand(x.shape[0])
            return self.dfn(x, mask, mu, c_noise, ref, sty, sty_lengths)

    precond = _ref_edm.EDMPrecond(_Adapter())
    return _ref_edm.ablation_sampler(
        net=precond, latents=latents, mask=y_mask, mu=mu_y, ref=ref_stats,
        ref_lengths=None, sty=sty_dec, sty_lengths=sty_mask,
        num_steps=N_STEPS, solver="euler", discretization="edm",
        schedule="linear", scaling="none",
    )


def test_full_graph_text_to_mel_parity():
    twin, model, variables = build_pair()
    rng = np.random.default_rng(0)

    b, tx, tr = 2, 9, 11
    x_ids = rng.integers(1, N_VOCAB, (b, tx)).astype(np.int64)
    x_lengths = np.asarray([tx, 6], np.int64)
    x_ids[1, 6:] = 0
    ref = rng.standard_normal((b, N_FEATS, tr)).astype(np.float32) * 0.5
    ref_lengths = np.asarray([tr, 8], np.int64)
    lf0 = rng.standard_normal((b, tr)).astype(np.float32)

    # torch pre-pass — gives the y frame count for the static bucket
    x_mask = torch.from_numpy(
        (np.arange(tx)[None] < x_lengths[:, None]).astype(np.float32)
    ).unsqueeze(1)
    r_mask = torch.from_numpy(
        (np.arange(tr)[None] < ref_lengths[:, None]).astype(np.float32)
    ).unsqueeze(1)
    with torch.no_grad():
        sty_enc, _, _ = twin.encode_style(
            torch.from_numpy(ref), r_mask, torch.from_numpy(ref), r_mask,
            torch.from_numpy(lf0), r_mask,
        )
        _, t_logw = twin.encoder(torch.from_numpy(x_ids), x_mask, sty_enc)
        w = torch.exp(t_logw) * x_mask
        y_frames = int(torch.clamp_min(torch.sum(torch.ceil(w), [1, 2]), 1).max())
    y_max = int(fix_len_compatibility(y_frames))

    noise = rng.standard_normal((b, N_FEATS, y_max)).astype(np.float32)

    with torch.no_grad():
        want_enc, want_dec, want_attn, want_ylen = twin.synthesize(
            torch.from_numpy(x_ids),
            torch.from_numpy(x_lengths),
            torch.from_numpy(ref),
            torch.from_numpy(ref_lengths),
            torch.from_numpy(ref),
            torch.from_numpy(ref_lengths),
            torch.from_numpy(lf0),
            torch.from_numpy(ref_lengths),
            noise=torch.from_numpy(noise),
            y_max_length=y_max,
            sampler_fn=ref_sampler_fn,
            temperature=TEMP,
        )

    got_enc, got_dec, got_attn, got_ylen = model.apply(
        variables,
        jax.random.PRNGKey(0),  # unused: latents_noise injected
        jnp.asarray(x_ids.astype(np.int32)),
        jnp.asarray(x_lengths.astype(np.int32)),
        y_max_length=y_max,
        sampler=SamplerConfig(num_steps=N_STEPS),
        temperature=TEMP,
        ref=jnp.asarray(ref),
        ref_lengths=jnp.asarray(ref_lengths.astype(np.int32)),
        sty=jnp.asarray(ref),
        sty_lengths=jnp.asarray(ref_lengths.astype(np.int32)),
        lf0=jnp.asarray(lf0),
        lf0_lengths=jnp.asarray(ref_lengths.astype(np.int32)),
        latents_noise=jnp.asarray(noise),
        method=DeXTTS.synthesize,
    )

    np.testing.assert_array_equal(
        np.asarray(got_ylen), want_ylen.numpy().astype(np.int32)
    )
    np.testing.assert_allclose(
        np.asarray(got_attn), want_attn.numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_enc).transpose(0, 2, 1),
        want_enc.numpy().transpose(0, 2, 1),
        atol=5e-4, rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(got_dec), want_dec.numpy(), atol=2e-3, rtol=1e-2
    )


# ---------------------------------------------------------------------------
# GeDEX (multi-speaker) full graph: spk embedding → encoder concat + third
# denoiser channel (reference: GeDEX-TTS/model/tts.py:15-57)
# ---------------------------------------------------------------------------

from dex_tts_tpu.models.tts import GeDEXTTS  # noqa: E402
from tests.torch_twins import GeDEXTTSTwin  # noqa: E402

N_SPKS, SPK_DIM = 4, 8  # width C+SPK_DIM must keep key_dim even


def build_gedex_pair():
    torch.manual_seed(1)
    twin = GeDEXTTSTwin(
        n_vocab=N_VOCAB, n_feats=N_FEATS, channels=C, heads=HEADS,
        layers=LAYERS, ffn=FFN, dp_channels=DP, dim=DIM, n_spks=N_SPKS,
        spk_emb_dim=SPK_DIM, dit_kwargs=DIT_KW,
    ).eval()
    with torch.no_grad():
        for p in twin.parameters():
            p.add_(0.05 * torch.randn_like(p))

    model = GeDEXTTS(
        n_vocab=N_VOCAB, n_feats=N_FEATS, n_spks=N_SPKS,
        spk_emb_dim=SPK_DIM, enc_channels=C, enc_filter_channels=FFN,
        enc_filter_channels_dp=DP, enc_heads=HEADS, enc_layers=LAYERS,
        dec_dim=DIM, dec_dim_mults=(1, 2),
        dit=DiTConfig(
            patch_size=3, stride_size=2, hidden_size=32, depth=2,
            num_heads=2, mlp_ratio=2.0, conv_pos=4, conv_pos_groups=2,
        ),
    )
    state = {k: v.numpy() for k, v in twin.state_dict().items()}
    variables = dex_tts_torch_to_flax(state, model)
    return twin, model, variables


def gedex_ref_sampler_fn(denoise_fn, latents, y_mask, mu_y, spk_vec):
    """The actual reference sampler + preconditioner around the GeDEX twin
    denoiser. The DEX and GeDEX edm.py are numerically identical (GeDEX
    just drops the ref/sty kwargs), so the DEX module is reused with
    ref/sty None (reference: GeDEX-TTS/model/edm.py:84-232)."""

    class _Adapter(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.dfn = denoise_fn

        def forward(self, x, mask, mu, c_noise, ref, ref_lengths, sty,
                    sty_lengths, spk=None, mask_ratio=0):
            if c_noise.numel() == 1:
                c_noise = c_noise.reshape(1).expand(x.shape[0])
            return self.dfn(x, mask, mu, c_noise, spk=spk)

    precond = _ref_edm.EDMPrecond(_Adapter())
    return _ref_edm.ablation_sampler(
        net=precond, latents=latents, mask=y_mask, mu=mu_y, ref=None,
        ref_lengths=None, sty=None, sty_lengths=None, spk=spk_vec,
        num_steps=N_STEPS, solver="euler", discretization="edm",
        schedule="linear", scaling="none",
    )


def test_full_graph_gedex_spk_parity():
    twin, model, variables = build_gedex_pair()
    rng = np.random.default_rng(1)

    b, tx = 2, 9
    x_ids = rng.integers(1, N_VOCAB, (b, tx)).astype(np.int64)
    x_lengths = np.asarray([tx, 6], np.int64)
    x_ids[1, 6:] = 0
    spk = np.asarray([1, 3], np.int64)

    # torch pre-pass — gives the y frame count for the static bucket
    x_mask = torch.from_numpy(
        (np.arange(tx)[None] < x_lengths[:, None]).astype(np.float32)
    ).unsqueeze(1)
    with torch.no_grad():
        spk_vec = twin.spk_emb(torch.from_numpy(spk))
        _, t_logw = twin.encoder(
            torch.from_numpy(x_ids), x_mask, None, spk=spk_vec
        )
        w = torch.exp(t_logw) * x_mask
        y_frames = int(
            torch.clamp_min(torch.sum(torch.ceil(w), [1, 2]), 1).max()
        )
    y_max = int(fix_len_compatibility(y_frames))

    noise = rng.standard_normal((b, N_FEATS, y_max)).astype(np.float32)

    with torch.no_grad():
        want_enc, want_dec, want_attn, want_ylen = twin.synthesize(
            torch.from_numpy(x_ids),
            torch.from_numpy(x_lengths),
            torch.from_numpy(spk),
            noise=torch.from_numpy(noise),
            y_max_length=y_max,
            sampler_fn=gedex_ref_sampler_fn,
            temperature=TEMP,
        )

    got_enc, got_dec, got_attn, got_ylen = model.apply(
        variables,
        jax.random.PRNGKey(0),  # unused: latents_noise injected
        jnp.asarray(x_ids.astype(np.int32)),
        jnp.asarray(x_lengths.astype(np.int32)),
        y_max_length=y_max,
        sampler=SamplerConfig(num_steps=N_STEPS),
        temperature=TEMP,
        spk=jnp.asarray(spk.astype(np.int32)),
        latents_noise=jnp.asarray(noise),
        method=GeDEXTTS.synthesize,
    )

    np.testing.assert_array_equal(
        np.asarray(got_ylen), want_ylen.numpy().astype(np.int32)
    )
    np.testing.assert_allclose(
        np.asarray(got_attn), want_attn.numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_enc), want_enc.numpy(), atol=5e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(got_dec), want_dec.numpy(), atol=2e-3, rtol=1e-2
    )
