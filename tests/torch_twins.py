"""Torch twins of the diffusion denoiser stack, built from torch primitives
with the *reference's parameter naming* (reference: DEX-TTS/model/
{diffusion,dit,ref_encoder,base}.py). Used as numerical oracles for the
checkpoint converter + flax modules (the reference itself depends on timm,
which is not in this image)."""

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


class Mish(nn.Module):
    def forward(self, x):
        return x * torch.tanh(F.softplus(x))


class Block(nn.Module):
    def __init__(self, dim, dim_out, groups=8):
        super().__init__()
        self.block = nn.Sequential(
            nn.Conv2d(dim, dim_out, 3, padding=1),
            nn.GroupNorm(groups, dim_out),
            Mish(),
        )

    def forward(self, x, mask):
        return self.block(x * mask) * mask


class ResnetBlock(nn.Module):
    def __init__(self, dim, dim_out, time_emb_dim, groups=8):
        super().__init__()
        self.mlp = nn.Sequential(Mish(), nn.Linear(time_emb_dim, dim_out))
        self.block1 = Block(dim, dim_out, groups)
        self.block2 = Block(dim_out, dim_out, groups)
        self.res_conv = (
            nn.Conv2d(dim, dim_out, 1) if dim != dim_out else nn.Identity()
        )

    def forward(self, x, mask, t):
        h = self.block1(x, mask)
        h = h + self.mlp(t)[:, :, None, None]
        h = self.block2(h, mask)
        return h + self.res_conv(x * mask)


class LinearAttention(nn.Module):
    def __init__(self, dim, heads=4, dim_head=32):
        super().__init__()
        self.heads = heads
        self.dim_head = dim_head
        hidden = heads * dim_head
        self.to_qkv = nn.Conv2d(dim, hidden * 3, 1, bias=False)
        self.to_out = nn.Conv2d(hidden, dim, 1)

    def forward(self, x):
        b, c, h, w = x.shape
        qkv = self.to_qkv(x)
        qkv = qkv.view(b, 3, self.heads, self.dim_head, h * w)
        q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
        k = k.softmax(dim=-1)
        context = torch.einsum("bhdn,bhen->bhde", k, v)
        out = torch.einsum("bhde,bhdn->bhen", context, q)
        out = out.reshape(b, self.heads * self.dim_head, h, w)
        return self.to_out(out)


class Rezero(nn.Module):
    def __init__(self, fn):
        super().__init__()
        self.fn = fn
        self.g = nn.Parameter(torch.zeros(1))

    def forward(self, x):
        return self.fn(x) * self.g


class Residual(nn.Module):
    def __init__(self, fn):
        super().__init__()
        self.fn = fn

    def forward(self, x):
        return self.fn(x) + x


class Downsample(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.conv = nn.Conv2d(dim, dim, 3, 2, 1)

    def forward(self, x):
        return self.conv(x)


class Upsample(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.conv = nn.ConvTranspose2d(dim, dim, 4, 2, 1)

    def forward(self, x):
        return self.conv(x)


def sinusoidal_pos_emb(t, dim, scale=1000.0):
    half = dim // 2
    emb = math.log(10000) / (half - 1)
    freqs = torch.exp(torch.arange(half).float() * -emb)
    args = scale * t[:, None] * freqs[None, :]
    return torch.cat((args.sin(), args.cos()), dim=-1)


class InstanceNorm2D(nn.Module):
    def forward(self, x):
        n, c = x.shape[:2]
        flat = x.reshape(n, c, -1)
        mean = flat.mean(2).view(n, c, 1, 1)
        std = (flat.var(2) + 1e-5).sqrt().view(n, c, 1, 1)
        return (x - mean) / std


class SelfAttentionPooling(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.W = nn.Linear(dim, 1)

    def forward(self, x, time):
        x = torch.cat([time, x], dim=1)
        attn = F.softmax(self.W(x).squeeze(-1), dim=-1).unsqueeze(-1)
        return (x * attn).sum(dim=1)


class TVAdaptor(nn.Module):
    def __init__(self, channels):
        super().__init__()
        self.d_k = channels**0.5
        self.w_q = nn.Linear(channels, channels, bias=False)
        self.w_k = nn.Linear(channels, channels, bias=False)
        self.w_v = nn.Linear(channels, channels, bias=False)
        self.linear = nn.Linear(channels, channels, bias=False)
        self.inorm2d = InstanceNorm2D()

    def forward(self, x, x_mask, sty, sty_mask, time):
        sty = torch.cat([time, sty], dim=-1)  # (B, C, T+1)
        b, c, h, w = x.shape
        add = torch.ones((b, 1, 1, 1))
        sm = torch.cat([add, sty_mask], dim=-1).repeat(1, h, w, 1)
        q = self.w_q(self.inorm2d(x).permute(0, 2, 3, 1))
        k = self.w_k(sty.transpose(1, 2)).unsqueeze(1)
        v = self.w_v(sty.transpose(1, 2)).unsqueeze(1)
        attn = torch.matmul(q / self.d_k, k.transpose(-1, -2))
        attn = attn.masked_fill(sm == 0, -1e4)
        attn = attn.softmax(dim=-1)
        out = self.linear(torch.matmul(attn, v)).permute(0, 3, 1, 2)
        return (x + out) * x_mask


class TIVAdaptor(nn.Module):
    def __init__(self, channels):
        super().__init__()
        self.mean_sap = SelfAttentionPooling(channels)
        self.std_sap = SelfAttentionPooling(channels)
        self.inorm2d = InstanceNorm2D()

    def forward(self, x, ref, time):
        ref_mean, ref_std = ref
        m = self.mean_sap(ref_mean, time).unsqueeze(-1)
        s = self.std_sap(ref_std, time).unsqueeze(-1)
        return self.inorm2d(x) * s.unsqueeze(-1) + m.unsqueeze(-1)


class SamePad(nn.Module):
    def __init__(self, k):
        super().__init__()
        self.remove = 1 if k % 2 == 0 else 0

    def forward(self, x):
        if self.remove > 0:
            x = x[:, :, : -self.remove, : -self.remove]
        return x


class SamePad1d(nn.Module):
    def __init__(self, k):
        super().__init__()
        self.remove = 1 if k % 2 == 0 else 0

    def forward(self, x):
        if self.remove > 0:
            x = x[:, :, : -self.remove]
        return x


class TimestepEmbedder(nn.Module):
    def __init__(self, hidden, freq=256):
        super().__init__()
        self.mlp = nn.Sequential(
            nn.Linear(freq, hidden), nn.SiLU(), nn.Linear(hidden, hidden)
        )
        self.freq = freq

    def forward(self, t):
        half = self.freq // 2
        freqs = torch.exp(
            -math.log(10000) * torch.arange(half).float() / half
        )
        args = t[:, None].float() * freqs[None]
        emb = torch.cat([args.cos(), args.sin()], dim=-1)
        return self.mlp(emb)


class TimmAttention(nn.Module):
    """timm.models.vision_transformer.Attention twin (qkv bias, scale)."""

    def __init__(self, dim, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.scale = self.head_dim**-0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        b, n, c = x.shape
        qkv = self.qkv(x).reshape(b, n, 3, self.num_heads, self.head_dim)
        qkv = qkv.permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b, n, c)
        return self.proj(out)


def modulate(x, shift, scale):
    return x * (1 + scale.unsqueeze(1)) + shift.unsqueeze(1)


class DiTBlock(nn.Module):
    def __init__(self, dim, num_heads, mlp_ratio):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        self.attn = TimmAttention(dim, num_heads)
        self.norm2 = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        hidden = int(dim * mlp_ratio)
        self.mlp = nn.ModuleDict(
            {"fc1": nn.Linear(dim, hidden), "fc2": nn.Linear(hidden, dim)}
        )
        self.adaLN_modulation = nn.Sequential(
            nn.SiLU(), nn.Linear(dim, 6 * dim, bias=True)
        )

    def forward(self, x, c):
        sm, cm, gm, sp, cp, gp = self.adaLN_modulation(c).chunk(6, dim=1)
        x = x + gm.unsqueeze(1) * self.attn(modulate(self.norm1(x), sm, cm))
        h = modulate(self.norm2(x), sp, cp)
        h = self.mlp["fc2"](F.gelu(self.mlp["fc1"](h)))
        return x + gp.unsqueeze(1) * h


class FinalLayer(nn.Module):
    def __init__(self, dim, stride, out_channels):
        super().__init__()
        self.norm_final = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        self.linear = nn.Linear(dim, stride * stride * out_channels)
        self.adaLN_modulation = nn.Sequential(
            nn.SiLU(), nn.Linear(dim, 2 * dim, bias=True)
        )

    def forward(self, x, c):
        shift, scale = self.adaLN_modulation(c).chunk(2, dim=1)
        return self.linear(modulate(self.norm_final(x), shift, scale))


class DiTTwin(nn.Module):
    """reference DiTMask twin (dit.py:328-519), overlap patchify path."""

    def __init__(self, in_channels, grid_h, patch=3, stride=2, hidden=32,
                 depth=1, num_heads=2, mlp_ratio=2.0, conv_pos=4,
                 conv_pos_groups=2, use_decoder=False):
        super().__init__()
        self.patch = patch
        self.stride = stride
        self.in_channels = in_channels
        self.grid_h = grid_h
        self.x_embedder = nn.ModuleDict(
            {
                "proj": nn.Sequential(
                    nn.Conv2d(in_channels, in_channels, patch, stride,
                              padding=patch // 2, groups=in_channels),
                    nn.SiLU(),
                    nn.Conv2d(in_channels, hidden, 1),
                )
            }
        )
        self.t_embedder = TimestepEmbedder(hidden)
        self.freq_new_pos_embed = nn.Parameter(
            torch.zeros(1, hidden, grid_h, 1)
        )
        self.pos_conv = nn.Sequential(
            nn.Conv2d(hidden, hidden, conv_pos, padding=conv_pos // 2,
                      groups=conv_pos_groups),
            SamePad(conv_pos),
            nn.GELU(),
        )
        self.blocks = nn.ModuleList(
            [DiTBlock(hidden, num_heads, mlp_ratio) for _ in range(depth)]
        )
        self.use_decoder = use_decoder
        if use_decoder:
            # reference dit.py:383-398: decoder pos conv (1D) + blocks
            self.decoder_pos_conv = nn.Sequential(
                nn.Conv1d(hidden, hidden, conv_pos, padding=conv_pos // 2,
                          groups=conv_pos_groups),
                SamePad1d(conv_pos),
                nn.GELU(),
            )
            self.decoder_blocks = nn.ModuleList(
                [DiTBlock(hidden, num_heads, mlp_ratio) for _ in range(depth)]
            )
        self.final_layer = FinalLayer(hidden, stride, in_channels)

    def forward(self, x, mask, t):
        x_len = x.shape[-1]
        if x_len % self.patch != 0:
            x = F.pad(x, (0, self.patch - x_len % self.patch))
        x = self.x_embedder["proj"](x)
        hp, wp = x.shape[2], x.shape[3]
        tpe = self.pos_conv(x).mean(dim=2, keepdim=True)
        x = x + tpe[:, :, :, : x.shape[-1]]
        x = x + self.freq_new_pos_embed
        tokens = x.flatten(2).transpose(1, 2)
        temb = self.t_embedder(t)
        for blk in self.blocks:
            tokens = blk(tokens, temb)
        if self.use_decoder:
            # reference dit.py:466-477: 1D pos conv, mean over channels
            pos = self.decoder_pos_conv(tokens.transpose(1, 2))
            tokens = tokens + pos.mean(dim=1, keepdim=True).transpose(1, 2)
            for blk in self.decoder_blocks:
                tokens = blk(tokens, temb)
        out = self.final_layer(tokens, temb)
        s = self.stride
        c = self.in_channels
        out = out.reshape(-1, hp, wp, s, s, c)
        out = torch.einsum("nhwpqc->nchpwq", out)
        out = out.reshape(-1, c, hp * s, wp * s)
        out = out[..., :x_len]
        return out * mask


class DenoiserTwin(nn.Module):
    """reference DiffusionDenoiser twin (diffusion.py:122-236), DEX
    (style-adapted) variant, dim_mults=(1, 2). Parameter names match the
    reference state_dict (downs.{i}.{0..3}, mlp.{0,2}, vit.*, ...)."""

    def __init__(self, dim=8, n_feats=16, dit_kwargs=None):
        super().__init__()
        self.dim = dim
        mid = dim * 2
        self.time_dim = dim
        self.mlp = nn.Sequential(
            nn.Linear(dim, dim * 4), Mish(), nn.Linear(dim * 4, dim)
        )
        self.mlp_adap = nn.Sequential(
            nn.Linear(dim, dim), Mish(), nn.Linear(dim, dim * 2)
        )
        self.mlp_adap_sty = nn.Sequential(
            nn.Linear(dim, dim), Mish(), nn.Linear(dim, dim * 2)
        )
        self.downs = nn.ModuleList(
            [
                nn.ModuleList(
                    [
                        ResnetBlock(2, dim, dim),
                        ResnetBlock(dim, dim, dim),
                        Residual(Rezero(LinearAttention(dim))),
                        Downsample(dim),
                    ]
                ),
                nn.ModuleList(
                    [
                        ResnetBlock(dim, mid, dim),
                        ResnetBlock(mid, mid, dim),
                        Residual(Rezero(LinearAttention(mid))),
                        nn.Identity(),
                    ]
                ),
            ]
        )
        self.tv_adaptor = TVAdaptor(mid)
        self.tiv_adaptor = TIVAdaptor(mid)
        self.vit = DiTTwin(mid, grid_h=(n_feats // 2) // 2, **(dit_kwargs or {}))
        self.ups = nn.ModuleList(
            [
                nn.ModuleList(
                    [
                        ResnetBlock(mid * 2, dim, dim),
                        ResnetBlock(dim, dim, dim),
                        Residual(Rezero(LinearAttention(dim))),
                        Upsample(dim),
                    ]
                )
            ]
        )
        self.final_block = Block(dim, dim)
        self.final_conv = nn.Conv2d(dim, 1, 1)

    def forward(self, x, mask, mu, t, ref_stats, sty, sty_mask):
        # ref_stats: (means (B,L,C), stds (B,L,C)) precomputed
        x = torch.stack([mu, x], 1)
        t_init = sinusoidal_pos_emb(t, self.dim)
        t_unet = self.mlp(t_init)
        t_adap = self.mlp_adap(t_init).unsqueeze(1)
        t_adap_sty = self.mlp_adap_sty(t_init).unsqueeze(-1)
        mask = mask.unsqueeze(1)

        hiddens = []
        masks = [mask]
        for res1, res2, attn, down in self.downs:
            m = masks[-1]
            x = res1(x, m, t_unet)
            x = res2(x, m, t_unet)
            x = attn(x)
            hiddens.append(x)
            x = down(x * m)
            masks.append(m[:, :, :, ::2])
        masks = masks[:-1]
        mask_mid = masks[-1]
        x = self.tv_adaptor(x, mask_mid, sty, sty_mask.unsqueeze(1), t_adap_sty)
        x = self.tiv_adaptor(x, ref_stats, t_adap)
        x = self.vit(x, mask_mid, t)
        for res1, res2, attn, up in self.ups:
            m = masks.pop()
            x = torch.cat((x, hiddens.pop()), dim=1)
            x = res1(x, m, t_unet)
            x = res2(x, m, t_unet)
            x = attn(x)
            x = up(x * m)
        x = self.final_block(x, mask)
        out = self.final_conv(x * mask)
        return (out * mask).squeeze(1)


# ---------------------------------------------------------------------------
# text / style encoder twins (reference naming)


class ChannelLayerNormTwin(nn.Module):
    """reference text_encoder.py:11-29 (stats over channel dim, eps 1e-4)."""

    def __init__(self, channels):
        super().__init__()
        self.gamma = nn.Parameter(torch.ones(channels))
        self.beta = nn.Parameter(torch.zeros(channels))

    def forward(self, x):  # (B, C, T)
        mean = x.mean(1, keepdim=True)
        var = ((x - mean) ** 2).mean(1, keepdim=True)
        x = (x - mean) * torch.rsqrt(var + 1e-4)
        return x * self.gamma.view(1, -1, 1) + self.beta.view(1, -1, 1)


class ConvReluNormTwin(nn.Module):
    """reference text_encoder.py:32-63."""

    def __init__(self, channels, kernel_size=5, n_layers=3):
        super().__init__()
        self.n_layers = n_layers
        self.conv_layers = nn.ModuleList(
            [nn.Conv1d(channels, channels, kernel_size, padding=kernel_size // 2)
             for _ in range(n_layers)]
        )
        self.norm_layers = nn.ModuleList(
            [ChannelLayerNormTwin(channels) for _ in range(n_layers)]
        )
        self.proj = nn.Conv1d(channels, channels, 1)

    def forward(self, x, mask):
        org = x
        for conv, norm in zip(self.conv_layers, self.norm_layers):
            x = torch.relu(norm(conv(x * mask)))
        return (org + self.proj(x)) * mask


class ProjectionTwin(nn.Module):
    """reference ref_encoder.py:8-34 / DurationPredictor layout."""

    def __init__(self, c_in, c_h, out=None, kernel_size=3):
        super().__init__()
        out = out or c_h
        self.conv_1 = nn.Conv1d(c_in, c_h, kernel_size, padding=kernel_size // 2)
        self.norm_1 = ChannelLayerNormTwin(c_h)
        self.conv_2 = nn.Conv1d(c_h, c_h, kernel_size, padding=kernel_size // 2)
        self.norm_2 = ChannelLayerNormTwin(c_h)
        self.proj = nn.Conv1d(c_h, out, 1)

    def forward(self, x, mask):
        x = self.norm_1(torch.relu(self.conv_1(x * mask)))
        x = self.norm_2(torch.relu(self.conv_2(x * mask)))
        return self.proj(x * mask) * mask


class RMSNormTwin(nn.Module):
    def __init__(self, dim, affine=True):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(dim)) if affine else None

    def forward(self, x):
        out = x * torch.rsqrt(x.pow(2).mean(-1, keepdim=True) + 1e-6)
        if self.weight is not None:
            out = out * self.weight
        return out


class AdaLNTwin(nn.Module):
    """reference base.py:161-194."""

    def __init__(self, dim):
        super().__init__()
        self.W_scale = nn.Linear(dim, dim)
        self.W_bias = nn.Linear(dim, dim)

    def forward(self, x, sty):
        mean = x.mean(-1, keepdim=True)
        std = (((x - mean) ** 2).mean(-1, keepdim=True) + 1e-5).sqrt()
        y = (x - mean) / std
        return y * self.W_scale(sty).unsqueeze(1) + self.W_bias(sty).unsqueeze(1)


class RetentionTwin(nn.Module):
    """reference retention.py:183-295, softmax mode, eval (no dropout)."""

    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.key_dim = dim // heads
        self.q_proj = nn.Linear(dim, dim, bias=False)
        self.k_proj = nn.Linear(dim, dim, bias=False)
        self.v_proj = nn.Linear(dim, dim, bias=False)
        self.g_proj = nn.Linear(dim, dim, bias=False)
        self.out_proj = nn.Linear(dim, dim, bias=False)

    def forward(self, x, sin, cos, dmask):
        b, t, d = x.shape

        def rot(v):
            v1, v2 = v[..., ::2], v[..., 1::2]
            return torch.stack((-v2, v1), dim=-1).flatten(-2)

        split = lambda v: v.view(b, t, self.heads, self.key_dim).transpose(1, 2)
        q = split(self.q_proj(x))
        k = split(self.k_proj(x)) * self.key_dim**-0.5
        v = split(self.v_proj(x))
        g = self.g_proj(x)
        qr = q * cos + rot(q) * sin
        kr = k * cos + rot(k) * sin
        scores = (qr @ kr.transpose(-1, -2)) * dmask
        scores = scores.masked_fill(dmask == 0, -1e4)
        w = scores.softmax(dim=-1)
        out = (w @ v).transpose(1, 2)
        out = out * torch.rsqrt(out.pow(2).mean(-1, keepdim=True) + 1e-6)
        out = torch.nn.functional.silu(g) * out.reshape(b, t, d)
        return self.out_proj(out)


class GLUTwin(nn.Module):
    def __init__(self, dim, ffn):
        super().__init__()
        self.fc1 = nn.Linear(dim, ffn, bias=False)
        self.fc2 = nn.Linear(ffn, dim, bias=False)
        self.gate = nn.Linear(dim, ffn, bias=False)

    def forward(self, x):
        return self.fc2(torch.nn.functional.gelu(self.fc1(x)) * self.gate(x))


class RetNetLayerTwin(nn.Module):
    def __init__(self, dim, heads, ffn, use_adaln):
        super().__init__()
        self.retention = RetentionTwin(dim, heads)
        self.retention_layer_norm = RMSNormTwin(dim)
        self.ffn = GLUTwin(dim, ffn)
        self.final_layer_norm = RMSNormTwin(dim)
        self.use_adaln = use_adaln
        if use_adaln:
            self.adaln_1 = AdaLNTwin(dim)
            self.adaln_2 = AdaLNTwin(dim)

    def forward(self, x, sin, cos, dmask, sty):
        h = x + self.retention(self.retention_layer_norm(x), sin, cos, dmask)
        if self.use_adaln:
            h = self.adaln_1(h, sty)
        out = h + self.ffn(self.final_layer_norm(h))
        if self.use_adaln:
            out = self.adaln_2(out, sty)
        return out


class TextEncoderTwin(nn.Module):
    """reference text_encoder.py:94-143 + retnet.py wiring (parallel mode,
    eval). Named to match the reference state_dict under `encoder.`."""

    def __init__(self, n_vocab, channels, heads, n_layers, ffn, n_feats,
                 dp_channels, use_adaln, n_spks=1, spk_emb_dim=0):
        super().__init__()
        self.channels = channels
        self.heads = heads
        self.n_spks = n_spks
        # GeDEX (n_spks>1) concatenates the speaker vector after the
        # prenet, so the RetNet stack runs at channels + spk_emb_dim
        # (reference: GeDEX-TTS/model/text_encoder.py:119-129, 139-141)
        width = channels + (spk_emb_dim if n_spks > 1 else 0)
        self.width = width
        self.emb = nn.Embedding(n_vocab, channels)
        self.prenet = ConvReluNormTwin(channels)

        class Inner(nn.Module):
            def __init__(self):
                super().__init__()
                self.layers = nn.ModuleList(
                    [RetNetLayerTwin(width, heads, ffn, use_adaln)
                     for _ in range(n_layers)]
                )
                self.layer_norm = RMSNormTwin(width)

        self.encoder = Inner()
        self.proj_m = nn.Conv1d(width, n_feats, 1)
        self.proj_w = ProjectionTwin(width, dp_channels, out=1)

    def forward(self, x_ids, mask, sty, spk=None):
        """x_ids: (B, T) long; mask: (B, 1, T); sty: (B, C) or None;
        spk (GeDEX): (B, spk_emb_dim) or None."""
        x = self.emb(x_ids) * math.sqrt(self.channels)
        x = x.transpose(1, 2)
        x = self.prenet(x, mask)
        if self.n_spks > 1:
            x = torch.cat(
                [x, spk.unsqueeze(-1).repeat(1, 1, x.shape[-1])], dim=1
            )
        h = x.transpose(1, 2)

        t = x_ids.shape[1]
        key_dim = self.width // self.heads
        angle = 1.0 / (
            10000 ** np.linspace(0, 1, key_dim // 2)
        )
        angle = np.repeat(angle, 2)
        idx = np.arange(t)
        sin = torch.from_numpy(
            np.sin(idx[:, None] * angle[None, :]).astype(np.float32)
        )
        cos = torch.from_numpy(
            np.cos(idx[:, None] * angle[None, :]).astype(np.float32)
        )
        m = mask[:, 0, :]
        dmask = (m.unsqueeze(2) * m.unsqueeze(1)).unsqueeze(1)
        for layer in self.encoder.layers:
            h = layer(h, sin, cos, dmask, sty)
        h = self.encoder.layer_norm(h)
        h = h.transpose(1, 2) * mask
        mu = self.proj_m(h) * mask
        logw = self.proj_w(h.detach(), mask)
        return mu, logw


class BasicConvTwin(nn.Module):
    """reference base.py:34-65."""

    def __init__(self, c_in, c_out, relu=True, norm="bn"):
        super().__init__()
        self.conv = nn.Conv1d(c_in, c_out, 3, padding=1, bias=False)
        self.relu = relu
        self.bn = nn.BatchNorm1d(c_out, eps=1e-5, momentum=0.01) if norm == "bn" else None
        self.ln = nn.LayerNorm(c_out, eps=1e-5) if norm == "ln" else None

    def forward(self, x):
        x = self.conv(x)
        if self.bn is not None:
            x = self.bn(x)
        if self.relu:
            x = torch.relu(x)
        if self.ln is not None:
            x = self.ln(x.transpose(1, 2)).transpose(1, 2)
        return x


class EncoderBlockTwin(nn.Module):
    """reference ref_encoder.py:57-81."""

    def __init__(self, c, c_h, norm):
        super().__init__()
        self.conv_block = nn.Sequential(
            BasicConvTwin(c, c_h, relu=True, norm=norm),
            BasicConvTwin(c_h, c, relu=False, norm=None),
        )

    def forward(self, x):
        return x + self.conv_block(x)


class VQTwin(nn.Module):
    """reference ref_encoder.py:181-237, eval path (no EMA update)."""

    def __init__(self, n_emb, dim):
        super().__init__()
        self.register_buffer("embedding", torch.randn(n_emb, dim) * 0.1)
        self.register_buffer("ema_count", torch.zeros(n_emb))
        self.register_buffer("ema_weight", self.embedding.clone())

    def forward(self, x, mask):  # x: (B, T, D), mask: (B, T, 1)
        x = x * mask
        m, d = self.embedding.shape
        flat = x.reshape(-1, d)
        dist = (
            self.embedding.pow(2).sum(1)[None]
            + flat.pow(2).sum(1, keepdim=True)
            - 2 * flat @ self.embedding.t()
        )
        idx = dist.argmin(-1)
        quant = self.embedding[idx].view_as(x)
        quant = x + (quant - x).detach()
        return quant * mask


class TVEncoderTwin(nn.Module):
    """reference ref_encoder.py:108-140 (eval)."""

    def __init__(self, c_in, c_h, c_out, c_out_g, num_layer, n_emb):
        super().__init__()
        self.in_conv = BasicConvTwin(c_in, c_h, relu=True, norm="ln")
        self.conv_blocks = nn.ModuleList(
            [EncoderBlockTwin(c_h, c_h, "ln") for _ in range(num_layer)]
        )
        self.out_conv = BasicConvTwin(c_h, c_out, relu=False, norm=None)
        self.vq = VQTwin(n_emb, c_out)
        self.proj_0 = ProjectionTwin(c_out, c_out_g)
        self.proj_1 = BasicConvTwin(c_out_g, c_out_g, relu=True, norm="bn")

    def forward(self, x, mask):  # (B, C, T), (B, 1, T)
        x = self.in_conv(x * mask) * mask
        for blk in self.conv_blocks:
            x = blk(x * mask) * mask
        z = self.out_conv(x * mask) * mask
        q = self.vq(z.transpose(1, 2), mask.transpose(1, 2)).transpose(1, 2)
        dec = self.proj_0(q.detach(), mask)
        dec = self.proj_1(dec * mask) * mask
        return z, dec


class TIVEncoderTwin(nn.Module):
    """reference ref_encoder.py:83-106 (eval)."""

    def __init__(self, c_in, c_h, c_out, num_layer):
        super().__init__()
        self.in_conv = BasicConvTwin(c_in, c_h, relu=True, norm="bn")
        self.conv_blocks = nn.ModuleList(
            [EncoderBlockTwin(c_h, c_h, "bn") for _ in range(num_layer)]
        )
        self.out_conv = BasicConvTwin(c_h, c_out, relu=True, norm="bn")

    def forward(self, x, mask):
        x = self.in_conv(x * mask) * mask
        skips = []
        for blk in self.conv_blocks:
            x = blk(x * mask) * mask
            skips.append(x)
            mean = x.mean(-1, keepdim=True)
            std = (x.var(-1) + 1e-5).sqrt().unsqueeze(-1)
            x = (x - mean) / std
        x = self.out_conv(x * mask) * mask
        return x, skips


class LF0EncoderTwin(nn.Module):
    """reference ref_encoder.py:36-55 (eval)."""

    def __init__(self, c_h, c_out, c_out_g, num_layer):
        super().__init__()
        self.in_conv = BasicConvTwin(1, c_h, relu=True, norm="ln")
        self.rnn_layer = nn.GRU(
            c_h, c_h // 2, num_layer, batch_first=True, bidirectional=True
        )
        self.out_conv = BasicConvTwin(c_h, c_out, relu=True, norm="ln")
        self.proj = ProjectionTwin(c_out, c_out_g)

    def forward(self, lf0, mask):  # (B, T), (B, 1, T)
        x = lf0.unsqueeze(1)
        x = self.in_conv(x * mask) * mask
        x, _ = self.rnn_layer(x.transpose(1, 2))
        x = self.out_conv(x.transpose(1, 2) * mask) * mask
        dec = self.proj(x.detach(), mask)
        return x, dec


def torch_sequence_mask(lengths, max_len):
    return (
        torch.arange(max_len, device=lengths.device)[None, :]
        < lengths[:, None]
    ).float()


def torch_generate_path(duration, mask):
    """duration: (B, Tx); mask: (B, Tx, Ty) → monotonic path (B, Tx, Ty)
    (reference: DEX-TTS/model/utils.py:37-51)."""
    b, tx, ty = mask.shape
    cum = torch.cumsum(duration, dim=-1)
    path = torch_sequence_mask(cum.reshape(b * tx), ty).reshape(b, tx, ty)
    path = path - F.pad(path, (0, 0, 1, 0))[:, :-1]
    return path * mask


class TTSTwin(nn.Module):
    """Facade-level twin of the reference DEX-TTS synthesis graph
    (reference: DEX-TTS/model/tts.py:14-92), composing the layer twins with
    reference state naming so `dex_tts_torch_to_flax` converts the whole
    tree in one call. Used for end-to-end text→mel parity of the
    duration→path→prior→sampler wiring."""

    def __init__(self, n_vocab=30, n_feats=12, channels=16, heads=2,
                 layers=2, ffn=24, dp_channels=10, dim=8, dit_kwargs=None,
                 tv_kwargs=None, tiv_kwargs=None, lf0_kwargs=None):
        super().__init__()
        self.n_feats = n_feats
        self.dim = dim
        mid = dim * 2
        tv_kwargs = tv_kwargs or dict(
            c_h=10, c_out=channels, c_out_g=14, num_layer=2, n_emb=8
        )
        tiv_kwargs = tiv_kwargs or dict(c_h=mid, c_out=6, num_layer=2)
        lf0_kwargs = lf0_kwargs or dict(
            c_h=8, c_out=channels, c_out_g=14, num_layer=2
        )
        self.encoder = TextEncoderTwin(
            n_vocab, channels, heads, layers, ffn, n_feats, dp_channels,
            use_adaln=True,
        )
        self.tv_encoder = TVEncoderTwin(c_in=n_feats, **tv_kwargs)
        self.tiv_encoder = TIVEncoderTwin(c_in=n_feats, **tiv_kwargs)
        self.lf0_encoder = LF0EncoderTwin(**lf0_kwargs)
        self.conv_sty = nn.Conv1d(tv_kwargs["c_out_g"], mid, 1)

        class _Dec(nn.Module):
            def __init__(inner):
                super().__init__()
                inner.denoise_fn = DenoiserTwin(
                    dim=dim, n_feats=n_feats, dit_kwargs=dit_kwargs
                )

        self.decoder = _Dec()

    def encode_style(self, ref, ref_mask, sty, sty_mask, lf0, lf0_mask):
        """reference: DEX-TTS/model/tts.py:38-51."""
        lf0_enc, lf0_dec = self.lf0_encoder(lf0, lf0_mask)
        sty_enc, sty_dec = self.tv_encoder(sty, sty_mask)
        sty_enc = (sty_enc.sum(dim=-1) / sty_mask.sum(dim=-1)) + (
            lf0_enc.sum(dim=-1) / lf0_mask.sum(dim=-1)
        )
        sty_dec = sty_dec + (
            lf0_dec.sum(dim=-1) / lf0_mask.sum(dim=-1)
        ).unsqueeze(-1)
        sty_dec = self.conv_sty(sty_dec)

        _, ref_skips = self.tiv_encoder(ref, ref_mask)
        means, stds = [], []
        for s in ref_skips:  # stats over the full padded axis
            means.append(s.mean(-1, keepdim=True))
            stds.append((s.var(-1) + 1e-5).sqrt().unsqueeze(-1))
        ref_stats = (
            torch.cat(means, dim=-1).transpose(1, 2),
            torch.cat(stds, dim=-1).transpose(1, 2),
        )
        return sty_enc, sty_dec, ref_stats

    def synthesize(self, x_ids, x_lengths, ref, ref_lengths, sty,
                   sty_lengths, lf0, lf0_lengths, noise, y_max_length,
                   sampler_fn, temperature=1.5, length_scale=1.0):
        """reference: DEX-TTS/model/tts.py:33-74; sampler_fn(precond_net,
        latents, mask, mu, ref_stats, sty, sty_mask) → mel (injected so the
        test can use the actual reference ablation_sampler)."""
        ref_mask = torch_sequence_mask(ref_lengths, ref.size(2)).unsqueeze(1)
        sty_mask = torch_sequence_mask(sty_lengths, sty.size(2)).unsqueeze(1)
        lf0_mask = torch_sequence_mask(lf0_lengths, lf0.size(1)).unsqueeze(1)
        sty_enc, sty_dec, ref_stats = self.encode_style(
            ref, ref_mask, sty, sty_mask, lf0, lf0_mask
        )

        x_mask = torch_sequence_mask(x_lengths, x_ids.size(1)).unsqueeze(1)
        mu_x, logw = self.encoder(x_ids, x_mask, sty_enc)

        w = torch.exp(logw) * x_mask
        w_ceil = torch.ceil(w) * length_scale
        y_lengths = torch.clamp_min(torch.sum(w_ceil, [1, 2]), 1).long()

        y_mask = torch_sequence_mask(y_lengths, y_max_length).unsqueeze(1)
        attn_mask = x_mask.unsqueeze(-1) * y_mask.unsqueeze(2)
        attn = torch_generate_path(w_ceil.squeeze(1), attn_mask.squeeze(1))

        mu_y = torch.matmul(attn.transpose(1, 2), mu_x.transpose(1, 2))
        mu_y = mu_y.transpose(1, 2)  # (B, F, Ty)

        latents = noise / temperature + mu_y
        dec_out = sampler_fn(
            self.decoder.denoise_fn, latents, y_mask, mu_y, ref_stats,
            sty_dec, sty_mask,
        )
        return mu_y * y_mask, dec_out * y_mask, attn, y_lengths


class GeDEXDenoiserTwin(nn.Module):
    """reference GeDEX DiffusionDenoiser twin (GeDEX-TTS/model/
    diffusion.py:119-207), dim_mults=(1, 2): no style adaptors; with
    n_spks>1 a spk_mlp projects the speaker vector to n_feats and stacks
    it as a third input channel."""

    def __init__(self, dim=8, n_feats=16, n_spks=1, spk_emb_dim=6,
                 dit_kwargs=None):
        super().__init__()
        self.dim = dim
        self.n_spks = n_spks
        mid = dim * 2
        self.mlp = nn.Sequential(
            nn.Linear(dim, dim * 4), Mish(), nn.Linear(dim * 4, dim)
        )
        if n_spks > 1:
            self.spk_mlp = nn.Sequential(
                nn.Linear(spk_emb_dim, spk_emb_dim * 4), Mish(),
                nn.Linear(spk_emb_dim * 4, n_feats),
            )
        in_ch = 2 + (1 if n_spks > 1 else 0)
        self.downs = nn.ModuleList(
            [
                nn.ModuleList(
                    [
                        ResnetBlock(in_ch, dim, dim),
                        ResnetBlock(dim, dim, dim),
                        Residual(Rezero(LinearAttention(dim))),
                        Downsample(dim),
                    ]
                ),
                nn.ModuleList(
                    [
                        ResnetBlock(dim, mid, dim),
                        ResnetBlock(mid, mid, dim),
                        Residual(Rezero(LinearAttention(mid))),
                        nn.Identity(),
                    ]
                ),
            ]
        )
        self.vit = DiTTwin(mid, grid_h=(n_feats // 2) // 2,
                           **(dit_kwargs or {}))
        self.ups = nn.ModuleList(
            [
                nn.ModuleList(
                    [
                        ResnetBlock(mid * 2, dim, dim),
                        ResnetBlock(dim, dim, dim),
                        Residual(Rezero(LinearAttention(dim))),
                        Upsample(dim),
                    ]
                )
            ]
        )
        self.final_block = Block(dim, dim)
        self.final_conv = nn.Conv2d(dim, 1, 1)

    def forward(self, x, mask, mu, t, spk=None):
        if self.n_spks < 2:
            x = torch.stack([mu, x], 1)
        else:
            s = self.spk_mlp(spk)
            s = s.unsqueeze(-1).repeat(1, 1, x.shape[-1])
            x = torch.stack([mu, x, s], 1)
        t_unet = self.mlp(sinusoidal_pos_emb(t, self.dim))
        mask = mask.unsqueeze(1)

        hiddens = []
        masks = [mask]
        for res1, res2, attn, down in self.downs:
            m = masks[-1]
            x = res1(x, m, t_unet)
            x = res2(x, m, t_unet)
            x = attn(x)
            hiddens.append(x)
            x = down(x * m)
            masks.append(m[:, :, :, ::2])
        masks = masks[:-1]
        mask_mid = masks[-1]
        x = self.vit(x, mask_mid, t)
        for res1, res2, attn, up in self.ups:
            m = masks.pop()
            x = torch.cat((x, hiddens.pop()), dim=1)
            x = res1(x, m, t_unet)
            x = res2(x, m, t_unet)
            x = attn(x)
            x = up(x * m)
        x = self.final_block(x, mask)
        out = self.final_conv(x * mask)
        return (out * mask).squeeze(1)


class GeDEXTTSTwin(nn.Module):
    """Facade-level twin of the reference GeDEX-TTS synthesis graph
    (reference: GeDEX-TTS/model/tts.py:15-57) with reference state naming,
    for end-to-end multi-speaker text-to-mel parity (spk embedding ->
    encoder concat + denoiser third channel)."""

    def __init__(self, n_vocab=30, n_feats=12, channels=16, heads=2,
                 layers=2, ffn=24, dp_channels=10, dim=8, n_spks=4,
                 spk_emb_dim=6, dit_kwargs=None):
        super().__init__()
        self.n_feats = n_feats
        self.n_spks = n_spks
        if n_spks > 1:
            self.spk_emb = nn.Embedding(n_spks, spk_emb_dim)
        self.encoder = TextEncoderTwin(
            n_vocab, channels, heads, layers, ffn, n_feats, dp_channels,
            use_adaln=False, n_spks=n_spks, spk_emb_dim=spk_emb_dim,
        )

        class _Dec(nn.Module):
            def __init__(inner):
                super().__init__()
                inner.denoise_fn = GeDEXDenoiserTwin(
                    dim=dim, n_feats=n_feats, n_spks=n_spks,
                    spk_emb_dim=spk_emb_dim, dit_kwargs=dit_kwargs,
                )

        self.decoder = _Dec()

    def synthesize(self, x_ids, x_lengths, spk, noise, y_max_length,
                   sampler_fn, temperature=1.5, length_scale=1.0):
        """reference: GeDEX-TTS/model/tts.py:27-57; sampler_fn(denoise_fn,
        latents, mask, mu, spk_vec) -> mel (injected so the test can use
        the actual reference ablation_sampler)."""
        spk_vec = self.spk_emb(spk) if self.n_spks > 1 else None
        x_mask = torch_sequence_mask(x_lengths, x_ids.size(1)).unsqueeze(1)
        mu_x, logw = self.encoder(x_ids, x_mask, None, spk=spk_vec)

        w = torch.exp(logw) * x_mask
        w_ceil = torch.ceil(w) * length_scale
        y_lengths = torch.clamp_min(torch.sum(w_ceil, [1, 2]), 1).long()

        y_mask = torch_sequence_mask(y_lengths, y_max_length).unsqueeze(1)
        attn_mask = x_mask.unsqueeze(-1) * y_mask.unsqueeze(2)
        attn = torch_generate_path(w_ceil.squeeze(1), attn_mask.squeeze(1))

        mu_y = torch.matmul(attn.transpose(1, 2), mu_x.transpose(1, 2))
        mu_y = mu_y.transpose(1, 2)  # (B, F, Ty)

        latents = noise / temperature + mu_y
        dec_out = sampler_fn(
            self.decoder.denoise_fn, latents, y_mask, mu_y, spk_vec
        )
        return mu_y * y_mask, dec_out * y_mask, attn, y_lengths
