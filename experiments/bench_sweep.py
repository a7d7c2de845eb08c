"""Batch-size sweep of the official bench config (MXU dw path)."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np
import jax
cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from __graft_entry__ import _calibrated_frozen_quartznet
from qasr_tpu.models.jasper import encoder_forward, pad_frames_aligned
from qasr_tpu.models.ctc_model import _dw_bands_device
from qasr_tpu.quantize.freeze import FrozenExec

model = _calibrated_frozen_quartznet(weight_bit=6, act_bit=6)
tables = model.freeze()
frontend, plan, qcfg = model.frontend, model.plan, model.qcfg
bands = _dw_bands_device(plan, tables)

@jax.jit
def _fn(audio, lengths, dw_bands):
    feats, feat_lens = frontend(audio, lengths, dither=0.0)
    feats = pad_frames_aligned(feats)
    fx = FrozenExec(tables, qcfg, activation=plan.activation, dw_bands=dw_bands)
    enc, enc_lens = encoder_forward(fx, plan, feats, feat_lens)
    return jnp.argmax(fx.decoder(enc), axis=-1), enc_lens

for batch in (64, 128):
    seconds = 15.0
    n = int(16000 * seconds)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.normal(size=(batch, n)).astype(np.float32) * 0.1)
    lengths = jnp.full((batch,), n, jnp.int32)
    jax.block_until_ready(_fn(audio, lengths, bands))
    jax.block_until_ready(_fn(audio, lengths, bands))
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = _fn(audio, lengths, bands)
    jax.block_until_ready(out)
    el = time.perf_counter() - t0
    print(f"B={batch}: {batch*seconds*iters/el:.0f} RTFx  step {el/iters*1e3:.1f} ms", flush=True)
