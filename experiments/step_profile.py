"""Profile the official bench step; print top device-op families."""
import glob, gzip, json, os, shutil, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np
import jax
cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from __graft_entry__ import _calibrated_frozen_quartznet
from qasr_tpu.models.ctc_model import make_frozen_fn

model = _calibrated_frozen_quartznet(weight_bit=6, act_bit=6)
fn = make_frozen_fn(model, model.freeze(), argmax=True)
batch, sec = 32, 15.0
n = int(16000 * sec)
rng = np.random.default_rng(0)
audio = jnp.asarray(rng.normal(size=(batch, n)).astype(np.float32) * 0.1)
lengths = jnp.full((batch,), n, jnp.int32)
jax.block_until_ready(fn(audio, lengths))
outdir = "/tmp/stepprof"
shutil.rmtree(outdir, ignore_errors=True)
with jax.profiler.trace(outdir):
    for _ in range(4):
        out = fn(audio, lengths)
    jax.block_until_ready(out)
fam = {}
for f in glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"), recursive=True):
    with gzip.open(f, "rt") as fh:
        data = json.load(fh)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "")
        if name.startswith(("jit_", "$", "Pjit", "b_", "PyTree")):
            continue
        base = name.rstrip("0123456789.")
        d = fam.setdefault(base, [0, 0.0])
        d[0] += 1
        d[1] += ev.get("dur", 0) / 1e3
tot = sum(v[1] for v in fam.values())
print(f"device total {tot/4:.1f} ms/step")
for k, (n_, ms) in sorted(fam.items(), key=lambda kv: -kv[1][1])[:18]:
    print(f"  {ms/4:7.3f} ms  x{n_//4:4d}  {k[:70]}")
