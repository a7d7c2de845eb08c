"""Mesh-sharded evaluation tests on the virtual 8-device CPU mesh: sharded
results must equal single-device results (batch sharding and time-axis
context parallelism with XLA halo exchange)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qasr_tpu.models.config import DecoderConfig, ModelConfig, QuantConfig
from qasr_tpu.models.ctc_model import ASRModel
from qasr_tpu.parallel.eval import make_sharded_frozen_forward, synthesize_sharded
from qasr_tpu.parallel.mesh import make_mesh
from tests.test_jasper_model import tiny_encoder_cfg, FEAT


def _frozen_model():
    cfg = ModelConfig(encoder=tiny_encoder_cfg(),
                      decoder=DecoderConfig(feat_in=40, num_classes=28),
                      preprocessor={"features": FEAT, "dither": 0.0})
    m = ASRModel.from_config(cfg)
    m.set_quant_bit(8, "all")
    m.bn_folding()
    m.calibrate_on_noise(batches=1, batch_size=2, seconds=0.5)
    return m


@pytest.fixture(scope="module")
def frozen_setup(request):
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    m = _frozen_model()
    tables = m.freeze()
    rng = np.random.default_rng(0)
    audio = (rng.normal(size=(8, 16000)) * 0.1).astype(np.float32)
    lens = np.asarray([16000, 12000, 9000, 16000] * 2, np.int32)
    ids_ref, el_ref = m.forward(audio, lens, mode="frozen")[2], None
    lp, el, ids = m.forward(audio, lens, mode="frozen")
    return m, tables, audio, lens, ids, el


def test_batch_sharded_matches_single(frozen_setup):
    m, tables, audio, lens, ids_ref, el_ref = frozen_setup
    mesh = make_mesh(data=4, model=2)
    fwd = make_sharded_frozen_forward(m, tables, mesh, shard_time=False)
    ids, el = fwd(jnp.asarray(audio), jnp.asarray(lens))
    np.testing.assert_array_equal(np.asarray(el), el_ref)
    np.testing.assert_array_equal(np.asarray(ids), ids_ref)


def test_time_sharded_matches_single(frozen_setup):
    """Context parallelism: time axis over 'model'; XLA inserts conv halos —
    integer outputs must be bit-identical to the unsharded run.  The
    time-sharded path runs without the frame-alignment pad (and without the
    fused dw kernel), so compare the valid frames per sample."""
    m, tables, audio, lens, ids_ref, el_ref = frozen_setup
    mesh = make_mesh(data=2, model=4)
    fwd = make_sharded_frozen_forward(m, tables, mesh, shard_time=True)
    ids, el = fwd(jnp.asarray(audio), jnp.asarray(lens))
    np.testing.assert_array_equal(np.asarray(el), el_ref)
    ids = np.asarray(ids)
    for i in range(ids.shape[0]):
        n = int(el_ref[i])
        np.testing.assert_array_equal(ids[i, :n], ids_ref[i, :n])


def test_sharded_synthesis_matches_vmap(rng):
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    from qasr_tpu.quantize.synth import get_synthetic_data
    from tests.test_jasper_model import make_model

    cfg, plan, enc, dec, dec_cfg = make_model()
    mesh = make_mesh(data=4, model=2)
    sharded = synthesize_sharded(plan, enc, mesh, batch_size=2, dim=FEAT,
                                 seqlen=32, train_iter=4, num_batch=3, lr=0.01)
    local = get_synthetic_data(plan, enc, batch_size=2, dim=FEAT, seqlen=32,
                               train_iter=4, num_batch=3, lr=0.01,
                               parallel=8, verbose=False)
    assert len(sharded) == 3
    for a, b in zip(sharded, local):
        np.testing.assert_allclose(a, b, atol=2e-5)


def test_channel_sharded_tp_frozen_matches_single(frozen_setup):
    """Tensor parallelism: int8 kernels/biases sharded on out-channels over
    'model' (explicit param_specs plan) — frozen integer eval must be
    bit-identical to the unsharded run."""
    m, tables, audio, lens, ids_ref, el_ref = frozen_setup
    mesh = make_mesh(data=2, model=4)
    fwd = make_sharded_frozen_forward(m, tables, mesh, shard_channels=True)
    ids, el = fwd(jnp.asarray(audio), jnp.asarray(lens))
    np.testing.assert_array_equal(np.asarray(el), el_ref)
    np.testing.assert_array_equal(np.asarray(ids), ids_ref)


def test_param_specs_explicit_plan(frozen_setup):
    """The TP plan is path-derived: conv kernels/channel vectors shard,
    decoder + requant tables replicate (VERDICT r1: no shape guessing)."""
    from jax.sharding import PartitionSpec as P

    from qasr_tpu.parallel.mesh import param_specs

    m, tables, *_ = frozen_setup
    mesh = make_mesh(data=2, model=4)
    specs = param_specs(m.params, mesh)
    blk0 = specs["encoder"]["blocks"][0]["convs"]
    assert blk0[0]["w"] == P(None, None, "model")
    assert specs["decoder"]["w"] == P()          # head: vocab axis, replicated
    assert specs["decoder"]["b"] == P()
    tspecs = param_specs(tables, mesh)
    t0 = tspecs["blocks"][0]["convs"][1]
    assert t0["w"] == P(None, None, "model")
    assert t0["b"] == P("model")
    assert t0["out_scale"] == P()                # requant vectors replicated
    # a fake time-last intermediate must NOT be sharded even if divisible
    fake = {"encoder": {"x_time_last": np.zeros((2, 3, 8), np.float32)}}
    assert param_specs(fake, mesh)["encoder"]["x_time_last"] == P()


def _cm_frozen_model(monkeypatch):
    """CM-eligible frozen model (W6A6 separable stack incl. stride-2
    prologue, residual repeats, and a dilated tail) with the fast-path env
    forced on (the CPU default would pick the base executor)."""
    from qasr_tpu.models.config import BlockConfig, EncoderConfig

    monkeypatch.setenv("QASR_DW_MXU", "1")
    monkeypatch.setenv("QASR_CM", "1")
    monkeypatch.setenv("QASR_CM_FUSED", "1")
    blocks = (
        BlockConfig(filters=64, repeat=1, kernel=(7,), stride=(2,),
                    residual=False, separable=True),
        BlockConfig(filters=64, repeat=2, kernel=(33,), residual=True,
                    separable=True),
        BlockConfig(filters=96, repeat=1, kernel=(29,), dilation=(2,),
                    residual=False, separable=True),
    )
    cfg = ModelConfig(
        encoder=EncoderConfig(feat_in=64, blocks=blocks, activation="relu"),
        decoder=DecoderConfig(feat_in=96, num_classes=28),
        preprocessor={"features": 64, "dither": 1e-5})
    m = ASRModel.from_config(cfg, seed=0)
    m.set_quant_bit(6, "all")
    m.bn_folding()
    m.calibrate_on_noise(batches=1, batch_size=2, seconds=0.5)
    return m


@pytest.mark.parametrize("mesh_shape,kw", [
    ((4, 2), {}),                                   # DP only
    ((2, 4), {"shard_channels": True}),             # DP x TP
    ((4, 2), {"shard_channels": True}),
    ((2, 4), {"shard_time": True}),                 # DP x SP
    ((4, 2), {"shard_time": True}),
])
def test_cm_fused_sharded_matches_single(mesh_shape, kw, monkeypatch, rng):
    """The channel-major FUSED fast path (banded-MXU dw + Pallas
    dot/requant kernels — the make_frozen_fn serving default) under
    dp / dp+tp / dp+sp shard_map meshes must be bit-identical to the
    single-device fused run (greedy ids over every valid frame)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    from qasr_tpu.parallel.eval import make_sharded_frozen_forward_cm

    m = _cm_frozen_model(monkeypatch)
    tables = m.freeze()
    audio = (rng.normal(size=(8, 16000)) * 0.1).astype(np.float32)
    lens = np.asarray([16000, 12000, 9000, 16000] * 2, np.int32)
    lp, el, ids = m.forward(audio, lens, mode="frozen")

    mesh = make_mesh(data=mesh_shape[0], model=mesh_shape[1])
    fwd = make_sharded_frozen_forward_cm(m, tables, mesh, **kw)
    ids_s, el_s = fwd(audio, lens)
    np.testing.assert_array_equal(np.asarray(el_s), el)
    ids_s = np.asarray(ids_s)
    for i in range(audio.shape[0]):
        n = int(el[i])
        np.testing.assert_array_equal(ids_s[i, :n], ids[i, :n])


@pytest.mark.parametrize("kw", [{"shard_channels": True},
                                {"shard_time": True}])
def test_cm_nonfused_sharded_matches_single(kw, monkeypatch, rng):
    """FrozenExecCM (banded-MXU, XLA requants) under TP / SP sharding."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    from qasr_tpu.parallel.eval import make_sharded_frozen_forward_cm

    m = _cm_frozen_model(monkeypatch)
    tables = m.freeze()
    audio = (rng.normal(size=(4, 16000)) * 0.1).astype(np.float32)
    lens = np.asarray([16000, 12000, 9000, 16000], np.int32)
    _, el, ids = m.forward(audio, lens, mode="frozen")

    mesh = make_mesh(data=2, model=4)
    fwd = make_sharded_frozen_forward_cm(m, tables, mesh, fused=False, **kw)
    ids_s, el_s = fwd(audio, lens)
    np.testing.assert_array_equal(np.asarray(el_s), el)
    for i in range(audio.shape[0]):
        n = int(el[i])
        np.testing.assert_array_equal(np.asarray(ids_s)[i, :n], ids[i, :n])


def test_sharded_auto_dispatch_picks_cm(monkeypatch, rng):
    """make_sharded_frozen_forward(executor='auto') routes CM-eligible
    plans to the fast path and still matches the single-device run."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    m = _cm_frozen_model(monkeypatch)
    tables = m.freeze()
    audio = (rng.normal(size=(4, 16000)) * 0.1).astype(np.float32)
    lens = np.asarray([16000, 12000, 9000, 16000], np.int32)
    _, el, ids = m.forward(audio, lens, mode="frozen")
    mesh = make_mesh(data=4, model=2)
    fwd = make_sharded_frozen_forward(m, tables, mesh, shard_channels=True)
    ids_s, el_s = fwd(audio, lens)
    np.testing.assert_array_equal(np.asarray(el_s), el)
    for i in range(audio.shape[0]):
        n = int(el[i])
        np.testing.assert_array_equal(np.asarray(ids_s)[i, :n], ids[i, :n])


_PSUM_CHILD = r'''
import os, sys
pid, port = int(sys.argv[1]), sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                           num_processes=2, process_id=pid)
from qasr_tpu.decode.ctc import edit_distance
from qasr_tpu.parallel.mesh import psum_counters
hyps = ["a b c", "d e", "f g h i", "j"]
refs = ["a b c", "d x", "f g h", "j k"]
lh, lr = hyps[pid::2], refs[pid::2]   # this process's data shard
scores = sum(edit_distance(h.split(), r.split()) for h, r in zip(lh, lr))
words = sum(len(r.split()) for r in lr)
s, w = psum_counters(scores, words)
assert (s, w) == (3, 10), (s, w)      # single-process totals over all 4
print("psum ok", s, w)
'''


def test_psum_counters_two_process(tmp_path):
    """Real cross-process WER-counter reduction: two jax.distributed CPU
    processes each reduce their shard's counters to the global totals
    (wer.py:106,114-115 dist_sync_on_step equivalent)."""
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])

    env = {k: v for k, v in __import__("os").environ.items()
           if "XLA_FLAGS" not in k}
    env["JAX_PLATFORMS"] = "cpu"
    procs = [subprocess.Popen([sys.executable, "-c", _PSUM_CHILD, str(i), port],
                              env=env, cwd="/root/repo",
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
             for i in range(2)]
    outs = [p.communicate(timeout=120)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
        assert "psum ok 3 10" in out, out


def test_psum_counters_single_process():
    from qasr_tpu.parallel.mesh import psum_counters

    assert psum_counters(7, 42) == (7, 42)


def test_conformer_tp_training_matches_replicated():
    """Megatron-style Conformer TP (parallel/mesh.py::conformer_param_specs):
    dp=2 x tp=2 loss + grads match the replicated single-logical-device run
    (float tolerance: row-parallel splits the d_ff/head contractions, so
    reduction order differs), and the compiled TP graph really contains an
    all-reduce."""
    from qasr_tpu.models.config import EncoderConfig
    from qasr_tpu.models.conformer import ConformerConfig
    from qasr_tpu.models.conformer_ctc import ConformerCTC
    from qasr_tpu.parallel.mesh import (
        conformer_param_specs, shard_conformer_params,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    if len(jax.devices()) < 4:
        pytest.skip("needs the 8-device CPU mesh")
    labels = (" ", "a", "b", "c")
    ccfg = ConformerConfig(feat_in=32, n_layers=2, d_model=32, n_heads=4,
                           ff_expansion_factor=2, subsampling="striding",
                           subsampling_factor=4,
                           subsampling_conv_channels=16, conv_kernel_size=9,
                           dropout=0.0)
    cfg = ModelConfig(encoder=EncoderConfig(feat_in=32, blocks=[]),
                      decoder=DecoderConfig(feat_in=32,
                                            num_classes=len(labels)),
                      labels=labels, preprocessor={"features": 32,
                                                   "dither": 0.0})
    m = ConformerCTC.from_config(cfg, ccfg, seed=0)
    rng = np.random.default_rng(1)
    audio = jnp.asarray(rng.standard_normal((4, 8000)), jnp.float32) * 0.1
    alens = jnp.asarray([8000, 6400, 8000, 7000], jnp.int32)
    tokens = jnp.asarray([[1, 2, 3]] * 4, jnp.int32)
    tlens = jnp.asarray([3, 3, 3, 3], jnp.int32)

    def loss(p):
        return m.loss_fn(p, audio, alens, tokens, tlens)

    ref_loss, ref_grads = jax.jit(jax.value_and_grad(loss))(m.params)

    mesh = make_mesh(data=2, model=2)
    specs = conformer_param_specs(m.params, mesh)
    # the plan must actually shard the matmul weights
    flat = jax.tree_util.tree_flatten_with_path(specs)[0]
    sharded_names = {".".join(str(getattr(k, "key", getattr(k, "idx", "")))
                              for k in path)
                     for path, s in flat if s != P()}
    assert any("ff1.l1.w" in n for n in sharded_names)
    assert any("att.q.w" in n for n in sharded_names)
    assert not any(n.startswith("decoder") for n in sharded_names)

    params_tp = shard_conformer_params(m.params, mesh)
    data = NamedSharding(mesh, P("data"))
    args = [jax.device_put(x, data) for x in (audio, alens, tokens, tlens)]

    def loss_tp(p, audio, alens, tokens, tlens):
        return m.loss_fn(p, audio, alens, tokens, tlens)

    jfn = jax.jit(jax.value_and_grad(loss_tp))
    tp_loss, tp_grads = jfn(params_tp, *args)
    assert "all-reduce" in jfn.lower(params_tp, *args).compile().as_text()
    np.testing.assert_allclose(float(tp_loss), float(ref_loss), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5),
        tp_grads, ref_grads)


@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 4)])
def test_frozen_conformer_tp_bit_identical(mesh_shape):
    """Frozen integer Conformer under int8-GEMM tensor parallelism
    (parallel/mesh.py::conformer_frozen_specs): dp x tp output ids and
    lengths EQUAL single-device — integer adds have no reduction-order
    drift, so the row-parallel int32 all-reduce is exact."""
    from qasr_tpu.models.config import EncoderConfig
    from qasr_tpu.models.conformer import ConformerConfig
    from qasr_tpu.models.conformer_ctc import ConformerCTC
    from qasr_tpu.parallel.eval import make_sharded_frozen_conformer_forward
    from qasr_tpu.parallel.mesh import conformer_frozen_specs
    from jax.sharding import PartitionSpec as P

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    labels = (" ", "a", "b", "c")
    cfg = ModelConfig(
        encoder=EncoderConfig(feat_in=32, blocks=[]),
        decoder=DecoderConfig(feat_in=64, num_classes=len(labels)),
        labels=labels, preprocessor={"features": 32, "dither": 0.0})
    ccfg = ConformerConfig(feat_in=32, n_layers=1, d_model=64, n_heads=4,
                           subsampling="striding", subsampling_factor=4,
                           subsampling_conv_channels=16, conv_kernel_size=9,
                           dropout=0.0)
    m = ConformerCTC.from_config(cfg, ccfg, seed=0)
    rng = np.random.default_rng(0)
    audio = (rng.normal(size=(4, 16000)) * 0.1).astype(np.float32)
    alens = np.asarray([16000, 12800, 16000, 9600], np.int32)
    m.quantize_encoder([(audio, alens)], quantize_attention=True,
                       integer_softmax=True, integer_layernorm=True,
                       integer_activations=True, static_attention=True)
    m.freeze()
    lp_ref, el_ref = m.forward(audio, alens)
    ids_ref = np.argmax(np.asarray(lp_ref), axis=-1)

    mesh = make_mesh(data=mesh_shape[0], model=mesh_shape[1])
    specs = conformer_frozen_specs(m.enc_frozen, mesh)
    flat = jax.tree_util.tree_flatten_with_path(specs)[0]
    sharded = {".".join(str(getattr(k, "key", getattr(k, "idx", "")))
                        for k in path) for path, s in flat if s != P()}
    assert any("ff1_l1.w" in n for n in sharded)
    assert any("att_out.w" in n for n in sharded)

    fwd = make_sharded_frozen_conformer_forward(m, mesh, shard_channels=True)
    lp_tp, el_tp = fwd(jnp.asarray(audio), jnp.asarray(alens))
    np.testing.assert_array_equal(np.asarray(el_tp), np.asarray(el_ref))
    ids_tp = np.argmax(np.asarray(lp_tp), axis=-1)
    for i in range(4):
        n = int(el_ref[i])
        np.testing.assert_array_equal(ids_tp[i, :n], ids_ref[i, :n])
    # the log-probs themselves: integer encoder is exact; the float head on
    # identical int8 encodings is deterministic
    np.testing.assert_array_equal(np.asarray(lp_tp), np.asarray(lp_ref))


_DDP_CHILD = r'''
import os, sys
pid, port = int(sys.argv[1]), sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
         if "host_platform_device_count" not in f]
os.environ["XLA_FLAGS"] = " ".join(
    flags + ["--xla_force_host_platform_device_count=4"])
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                           num_processes=2, process_id=pid)
assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from qasr_tpu.models.config import DecoderConfig, ModelConfig
from qasr_tpu.models.ctc_model import ASRModel
from tests.test_jasper_model import tiny_encoder_cfg, FEAT
from qasr_tpu.train.trainer import TrainConfig, Trainer

cfg = ModelConfig(encoder=tiny_encoder_cfg(),
                  decoder=DecoderConfig(feat_in=40, num_classes=28),
                  preprocessor={"features": FEAT, "dither": 0.0})
model = ASRModel.from_config(cfg, seed=0)   # seeded: identical everywhere

rng = np.random.default_rng(0)
B = 8
audio = (rng.normal(size=(B, 4000)) * 0.1).astype(np.float32)
alens = np.full((B,), 4000, np.int32)
tokens = np.tile(np.asarray([[1, 2, 3, 4]], np.int32), (B, 1))
tlens = np.full((B,), 4, np.int32)

# single-device reference: an identical trainer runs the FULL global
# batch locally (same seeded params, same PRNGKey(step) rng)
ref_model = ASRModel.from_config(cfg, seed=0)
ref_tr = Trainer(ref_model, TrainConfig(lr=0.01, warmup_steps=0,
                                        max_steps=5, log_every=10**9))
ref_tr.opt_state = ref_tr.tx.init(ref_model.params)
ref = float(ref_tr.train_step((audio, alens, tokens, tlens)))

mesh = Mesh(np.asarray(jax.devices()).reshape(8, 1), ("data", "model"))
data = NamedSharding(mesh, P("data"))
def shard(x):
    return jax.make_array_from_process_local_data(data, x[pid * 4:(pid + 1) * 4])
batch = (shard(audio), shard(alens), shard(tokens), shard(tlens))

trainer = Trainer(model, TrainConfig(lr=0.01, warmup_steps=0, max_steps=5,
                                     log_every=10**9))
trainer.opt_state = trainer.tx.init(model.params)
loss = float(trainer.train_step(batch))
# the global loss each process observes must equal the single-device loss
assert abs(loss - ref) < 1e-4 * max(1.0, abs(ref)), (loss, ref)
# updated params identical across processes (grad all-reduce happened):
# print a checksum the parent compares between the two processes
leaves = jax.tree_util.tree_leaves(trainer.model.params)
csum = float(sum(jnp.sum(jnp.abs(l.astype(jnp.float64))) for l in leaves))
print(f"ddp ok loss={loss:.6f} csum={csum:.6f}")
'''


def test_ddp_train_step_two_process():
    """A REAL cross-process data-parallel training step: two
    jax.distributed CPU processes (4 virtual devices each) run one jitted
    step over a global batch sharded across all 8 devices.  The observed
    global loss equals the single-device full-batch loss, and the updated
    parameter checksums agree across processes — the gradient all-reduce
    crossed the process boundary."""
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])

    env = {k: v for k, v in __import__("os").environ.items()
           if "XLA_FLAGS" not in k}
    env["JAX_PLATFORMS"] = "cpu"
    procs = [subprocess.Popen([sys.executable, "-c", _DDP_CHILD, str(i),
                               port],
                              env=env, cwd="/root/repo",
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT)
             for i in range(2)]
    outs = [p.communicate(timeout=300)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
        assert "ddp ok" in out, out
    line0 = [ln for ln in outs[0].splitlines() if ln.startswith("ddp ok")][0]
    line1 = [ln for ln in outs[1].splitlines() if ln.startswith("ddp ok")][0]
    assert line0 == line1, (line0, line1)
