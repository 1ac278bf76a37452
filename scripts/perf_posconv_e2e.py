"""TPU: in-REAL-graph A/B of DiTConfig.pos_conv_impl lowerings.

Isolated, the grouped time-pos conv runs 3-4.5 ms at bench shapes
(scripts/perf_posconv.py), but the e2e trace attributes ~9.7 ms/step to
its fusion — XLA assigns it a 5-D split layout with 32 lanes minor. The
mini-context harness (patchify→conv→gelu/mean/add→matmul) did NOT
reproduce the slowdown (4.88 ms plain vs 4.75 ms barrier), so the only
honest test is the full sampler graph: this builds the flagship DeX
text→mel synthesize at bench shapes (batch 16, 768 frames, euler@50)
once per impl and times them interleaved in one process (tunnel
throughput drifts ±25% between processes).

Impls share one param tree (GroupedPosConv2D matches nn.Conv), so one
init serves all variants; outputs are checked for agreement first.

Run on the TPU host: python scripts/perf_posconv_e2e.py [rounds]
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

IMPLS = ["grouped", "barrier", "vmap"]
if len(sys.argv) > 2:
    IMPLS = sys.argv[2].split(",")

b, tx, ty, t_ref = 16, 96, 768, 256
AUDIO_S = b * ty * 256 / 22050  # frames → samples at hop 256

models = {impl: _full_size_dex(pos_conv_impl=impl) for impl in IMPLS}
x = jnp.asarray(np.random.default_rng(1).integers(1, 148, (b, tx)), jnp.int32)
xl = jnp.full((b,), tx, jnp.int32)
style = _style_inputs(b, 80, t_ref)

base = models[IMPLS[0]]


@jax.jit
def _init():
    return base.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jax.random.PRNGKey(2), x, xl, y_max_length=ty,
        sampler=SamplerConfig(num_steps=2), **style,
        method=DeXTTS.synthesize)


variables = _init()
# perturb: at init the DiT is adaLN-Zero (outputs exactly 0) and the
# pos-conv branch would be the whole DiT — keep the graph honest
leaves, treedef = jax.tree.flatten(variables["params"])
ks = jax.random.split(jax.random.PRNGKey(9), len(leaves))
variables = {**variables, "params": jax.tree.unflatten(
    treedef, [p + 0.02 * jax.random.normal(k, p.shape, p.dtype)
              for p, k in zip(leaves, ks)])}
key = jax.random.PRNGKey(4)
cfg = SamplerConfig(num_steps=50, solver="euler")


def make(model):
    @jax.jit
    def f(variables, key):
        return model.apply(variables, key, x, xl, y_max_length=ty,
                           sampler=cfg, temperature=1.5, **style,
                           method=DeXTTS.synthesize)[1]
    return f


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    print(f"backend={jax.default_backend()}", flush=True)
    fns, mels = {}, {}
    for impl, model in models.items():
        f = make(model)
        t0 = time.time()
        mels[impl] = jax.device_get(f(variables, key))
        print(f"{impl}: first call {time.time()-t0:.1f}s", flush=True)
        fns[impl] = f
    ref = mels[IMPLS[0]]
    for impl, m in mels.items():
        print(f"max|{impl} - {IMPLS[0]}| = {np.abs(m - ref).max():.3e}",
              flush=True)

    acc = {impl: [] for impl in fns}
    for r in range(rounds):
        for impl, f in fns.items():
            t0 = time.perf_counter()
            # materialize a scalar: block_until_ready alone does not
            # wait for remote-tunnel completion (CLAUDE.md)
            float(jnp.sum(f(variables, key)))
            acc[impl].append(time.perf_counter() - t0)
    print(f"\n=== text->mel wall per batch-{b} dispatch, medians over "
          f"{rounds} interleaved rounds ===", flush=True)
    base_ms = None
    for impl, ts in acc.items():
        ms = float(np.median(ts)) * 1e3
        if base_ms is None:
            base_ms = ms
        print(f"{impl:10s} {ms:8.1f} ms  RTF {ms/1e3/AUDIO_S:.5f}  "
              f"({base_ms/ms:.3f}x vs {IMPLS[0]})", flush=True)


if __name__ == "__main__":
    main()
