"""TPU: in-REAL-graph interleaved A/B of exact-math lowering knobs on the
flagship DeX text→mel path (batch 16, 768 frames, euler@50).

Generalizes scripts/perf_posconv_e2e.py to arbitrary combinations of
  pos=<grouped|barrier|vmap|nchw>   (DiTConfig.pos_conv_impl)
  lin=<tokenmajor|fused>            (U-Net LinearAttention impl)
so one process (one tunnel session — throughput drifts ±25% between
processes, CLAUDE.md NB3) measures both VERDICT-r3 levers:
  item 1: the DiT time-pos grouped conv (~9.7 ms/step, biggest sampler op)
  item 4: the U-Net linattn relayout copy (~2 ms/step, models/unet.py)

All variants share one param tree (GroupedPosConv2D matches nn.Conv;
LinearAttention impl='fused' reuses the same separate q/k/v Dense params)
so one init serves all; outputs are cross-checked for agreement first.

Run on the TPU host (NOTHING else on the host core):
  python scripts/perf_variants_e2e.py [rounds] [spec1 spec2 ...]
  spec syntax: "pos=vmap,lin=fused"; default sweep below.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _full_size_dex, _style_inputs
from dex_tts_tpu.models.edm import SamplerConfig
from dex_tts_tpu.models.tts import DeXTTS

DEFAULT_SPECS = [
    "pos=grouped,lin=tokenmajor",  # shipped defaults (round-3 baseline)
    "pos=barrier,lin=tokenmajor",
    "pos=vmap,lin=tokenmajor",
    "pos=nchw,lin=tokenmajor",
    "pos=grouped,lin=fused",
]


def parse_spec(spec: str) -> dict:
    kw = {}
    for part in spec.split(","):
        k, v = part.split("=")
        kw[{"pos": "pos_conv_impl", "lin": "linattn_impl",
            "posemb": "pos_embed_time"}[k.strip()]] = v.strip()
    return kw


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    specs = sys.argv[2:] if len(sys.argv) > 2 else DEFAULT_SPECS

    b, tx, ty, t_ref = 16, 96, 768, 256
    audio_s = b * ty * 256 / 22050

    models = {s: _full_size_dex(**parse_spec(s)) for s in specs}
    x = jnp.asarray(
        np.random.default_rng(1).integers(1, 148, (b, tx)), jnp.int32
    )
    xl = jnp.full((b,), tx, jnp.int32)
    style = _style_inputs(b, 80, t_ref)

    # Init per spec (cached by param-tree structure): most knobs share one
    # tree — identical seeds give bit-identical values — but architecture
    # variants (posemb=conv1d) own distinct params and need their own init.
    init_cache: dict = {}

    def init_for(model):
        struct = jax.eval_shape(
            lambda: model.init(
                {"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1)},
                jax.random.PRNGKey(2), x, xl, y_max_length=ty,
                sampler=SamplerConfig(num_steps=2), **style,
                method=DeXTTS.synthesize))
        sig = str(jax.tree.structure(struct))
        if sig not in init_cache:
            variables = jax.jit(lambda: model.init(
                {"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1)},
                jax.random.PRNGKey(2), x, xl, y_max_length=ty,
                sampler=SamplerConfig(num_steps=2), **style,
                method=DeXTTS.synthesize))()
            # perturb: at init the DiT is adaLN-Zero (outputs exactly 0) —
            # keep the graph honest
            leaves, treedef = jax.tree.flatten(variables["params"])
            ks = jax.random.split(jax.random.PRNGKey(9), len(leaves))
            init_cache[sig] = {**variables, "params": jax.tree.unflatten(
                treedef,
                [p + 0.02 * jax.random.normal(k, p.shape, p.dtype)
                 for p, k in zip(leaves, ks)])}
        return sig, init_cache[sig]

    key = jax.random.PRNGKey(4)
    cfg = SamplerConfig(num_steps=50, solver="euler")

    def make(model):
        @jax.jit
        def f(variables, key):
            return model.apply(variables, key, x, xl, y_max_length=ty,
                               sampler=cfg, temperature=1.5, **style,
                               method=DeXTTS.synthesize)[1]
        return f

    print(f"backend={jax.default_backend()}", flush=True)
    fns, mels, variables_of, sig_of = {}, {}, {}, {}
    for spec, model in models.items():
        sig, variables = init_for(model)
        f = make(model)
        t0 = time.time()
        mels[spec] = jax.device_get(f(variables, key))
        print(f"{spec}: first call {time.time()-t0:.1f}s", flush=True)
        fns[spec], variables_of[spec], sig_of[spec] = f, variables, sig
    ref = mels[specs[0]]
    for spec, m in mels.items():
        if sig_of[spec] == sig_of[specs[0]]:
            print(f"max|{spec} - {specs[0]}| = {np.abs(m - ref).max():.3e}",
                  flush=True)
        else:
            print(f"max|{spec} - {specs[0]}| = n/a (distinct architecture)",
                  flush=True)

    acc = {s: [] for s in fns}
    for _ in range(rounds):
        for spec, f in fns.items():
            t0 = time.perf_counter()
            # materialize a scalar: block_until_ready alone does not wait
            # for remote-tunnel completion (CLAUDE.md)
            float(jnp.sum(f(variables_of[spec], key)))
            acc[spec].append(time.perf_counter() - t0)
    print(f"\n=== text->mel wall per batch-{b} dispatch, medians over "
          f"{rounds} interleaved rounds ===", flush=True)
    base_ms = None
    for spec, ts in acc.items():
        ms = float(np.median(ts)) * 1e3
        if base_ms is None:
            base_ms = ms
        print(f"{spec:28s} {ms:8.1f} ms  RTF {ms/1e3/audio_s:.5f}  "
              f"({base_ms/ms:.3f}x vs baseline)", flush=True)


if __name__ == "__main__":
    main()
