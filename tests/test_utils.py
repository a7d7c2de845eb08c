"""Typecheck / export / app-state / profiling / checkpoint utility tests."""
import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qasr_tpu.utils.typecheck import (
    AcousticEncodedRepresentation, LengthsType, TensorSpec, typed,
)


def test_typed_decorator_validates():
    @typed({"x": TensorSpec("BTC"), "lens": TensorSpec("B", LengthsType)},
           outputs=[TensorSpec("BTC")])
    def f(x, lens):
        return x * 2

    x = jnp.zeros((2, 5, 3))
    f(x, jnp.zeros((2,), jnp.int32))  # ok
    with pytest.raises(TypeError, match="rank"):
        f(jnp.zeros((2, 5)), jnp.zeros((2,), jnp.int32))
    with pytest.raises(TypeError, match="conflicts"):
        f(x, jnp.zeros((3,), jnp.int32))  # B mismatch


def test_typed_works_under_jit():
    @typed({"x": TensorSpec("BC")})
    def f(x):
        return jnp.sum(x)

    jax.jit(f)(jnp.ones((2, 3)))
    with pytest.raises(TypeError):
        jax.jit(f)(jnp.ones((2, 3, 4)))


def test_export_roundtrip(rng):
    from qasr_tpu.utils.export import export_fn, load_exported

    w = jnp.asarray(rng.normal(size=(4, 4)).astype(np.float32))

    def fn(x):
        return jnp.tanh(x @ w)

    x = jnp.asarray(rng.normal(size=(2, 4)).astype(np.float32))
    blob = export_fn(fn, (x,), platforms=("cpu",))
    assert isinstance(blob, (bytes, bytearray)) and len(blob) > 100
    reloaded = load_exported(bytes(blob))
    got = reloaded.call(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(fn(x)), rtol=1e-6)


def test_export_frozen_ctc(tmp_path):
    from qasr_tpu.models.config import DecoderConfig, ModelConfig
    from qasr_tpu.models.ctc_model import ASRModel
    from qasr_tpu.utils.export import export_frozen_ctc, load_exported
    from tests.test_jasper_model import tiny_encoder_cfg, FEAT

    cfg = ModelConfig(encoder=tiny_encoder_cfg(),
                      decoder=DecoderConfig(feat_in=40, num_classes=28),
                      preprocessor={"features": FEAT, "dither": 0.0})
    m = ASRModel.from_config(cfg)
    m.bn_folding()
    m.calibrate_on_noise(batches=1, batch_size=2, seconds=0.5)
    p = export_frozen_ctc(m, batch=1, num_samples=3200,
                          path=str(tmp_path / "model.stablehlo"))
    blob = open(p, "rb").read()
    ex = load_exported(blob)
    ids, lens = ex.call(jnp.zeros((1, 3200), jnp.float32),
                        jnp.full((1,), 3200, jnp.int32))
    assert ids.shape[0] == 1


def test_app_state(monkeypatch):
    from qasr_tpu.utils.app_state import AppState, env_rank, is_global_rank_zero

    monkeypatch.setenv("SLURM_PROCID", "3")
    monkeypatch.delenv("RANK", raising=False)
    assert env_rank() == 3
    monkeypatch.delenv("SLURM_PROCID", raising=False)
    st = AppState()
    assert st.world_size >= 1
    assert AppState() is st  # singleton


def test_profiling_meters():
    import time
    from qasr_tpu.utils.profiling import RTFxMeter, StepTimer

    t = StepTimer(window=3)
    for _ in range(4):
        t.tick()
        time.sleep(0.01)
    assert t.mean_step_time > 0
    m = RTFxMeter()
    m.start()
    time.sleep(0.01)
    m.stop(audio_seconds=10.0)
    assert m.rtfx > 1


def test_checkpoint_roundtrip(tmp_path, rng):
    from qasr_tpu.utils.checkpoint import (
        flatten_tree, load_arrays, save_arrays, unflatten_into,
        save_qasr, load_qasr,
    )

    tree = {"a": rng.normal(size=(3, 4)).astype(np.float32),
            "b": [np.ones(2), {"c": np.zeros(5)}]}
    flat = flatten_tree(tree)
    assert set(flat) == {"a", "b/0", "b/1/c"}
    save_arrays(str(tmp_path / "t.npz"), tree)
    back = load_arrays(str(tmp_path / "t.npz"), tree)
    np.testing.assert_array_equal(back["a"], tree["a"])
    save_qasr(str(tmp_path / "m.qasr"), {"name": "x"}, tree)
    cfg, arrays, artifacts = load_qasr(str(tmp_path / "m.qasr"))
    assert cfg["name"] == "x"
    assert artifacts == {}
    np.testing.assert_array_equal(arrays["params/a"], tree["a"])


def _decode_tfevents(path):
    """Independent decoder for the tfevents wire format: validates record
    CRCs and parses Event{wall_time, step, summary{value{tag,simple_value}}}."""
    import struct

    from qasr_tpu.utils.tb_writer import _masked_crc

    def read_varint(buf, i):
        shift = n = 0
        while True:
            b = buf[i]
            i += 1
            n |= (b & 0x7F) << shift
            if not b & 0x80:
                return n, i
            shift += 7

    events = []
    with open(path, "rb") as f:
        data = f.read()
    i = 0
    while i < len(data):
        (ln,) = struct.unpack_from("<Q", data, i)
        (hcrc,) = struct.unpack_from("<I", data, i + 8)
        assert hcrc == _masked_crc(data[i:i + 8])
        payload = data[i + 12 : i + 12 + ln]
        (pcrc,) = struct.unpack_from("<I", data, i + 12 + ln)
        assert pcrc == _masked_crc(payload)
        i += 12 + ln + 4
        # parse the Event message
        ev = {}
        j = 0
        while j < len(payload):
            key, j = read_varint(payload, j)
            field, wire = key >> 3, key & 7
            if wire == 1:
                (val,) = struct.unpack_from("<d", payload, j)
                j += 8
            elif wire == 5:
                (val,) = struct.unpack_from("<f", payload, j)
                j += 4
            elif wire == 0:
                val, j = read_varint(payload, j)
            else:
                n, j = read_varint(payload, j)
                val = payload[j : j + n]
                j += n
            ev[field] = val
        events.append(ev)
    return events


def test_tensorboard_event_file_roundtrip(tmp_path):
    """exp_manager writes valid tfevents records (reference exp_manager
    wires a TensorBoardLogger, exp_manager.py:480-539)."""
    import struct

    from qasr_tpu.utils.exp_manager import ExpManager, ExpManagerConfig

    em = ExpManager(ExpManagerConfig(exp_dir=str(tmp_path), name="tb"))
    em.log_metrics(5, loss=1.25, lr=0.01)
    em.log_metrics(10, loss=0.5)
    events = _decode_tfevents(em.tb.path)
    # header + 3 scalar events
    assert events[0][3] == b"brain.Event:2"
    scalars = []
    for ev in events[1:]:
        summary = ev[5]
        # Summary{1: Value{1: tag, 2: simple_value}}
        assert summary[0] >> 3 == 1
        ln = summary[1]
        value_msg = summary[2 : 2 + ln]
        # tag
        assert value_msg[0] >> 3 == 1
        tlen = value_msg[1]
        tag = value_msg[2 : 2 + tlen].decode()
        (val,) = struct.unpack_from("<f", value_msg, 2 + tlen + 1)
        scalars.append((ev[2], tag, round(val, 4)))
    assert (5, "loss", 1.25) in scalars
    assert (5, "lr", 0.01) in scalars
    assert (10, "loss", 0.5) in scalars


def test_exp_manager_kill_and_resume_trajectory(tmp_path, rng):
    """A killed-and-resumed training run reproduces the uninterrupted loss
    trajectory (check_resume + save/load_training_ckpt end-to-end)."""
    from qasr_tpu.models.config import DecoderConfig, ModelConfig
    from qasr_tpu.models.ctc_model import ASRModel
    from qasr_tpu.train.trainer import TrainConfig, Trainer
    from qasr_tpu.utils.checkpoint import load_training_ckpt
    from qasr_tpu.utils.exp_manager import ExpManager, ExpManagerConfig
    from tests.test_jasper_model import tiny_encoder_cfg, FEAT

    cfg = ModelConfig(encoder=tiny_encoder_cfg(),
                      decoder=DecoderConfig(feat_in=40, num_classes=28),
                      preprocessor={"features": FEAT, "dither": 0.0})
    audio = rng.normal(size=(2, 8000)).astype(np.float32) * 0.1
    batch = (audio, np.full((2,), 8000, np.int32),
             np.asarray([[1, 2], [3, 4]], np.int32), np.full((2,), 2, np.int32))

    def make_trainer():
        m = ASRModel.from_config(cfg, seed=11)
        return Trainer(m, TrainConfig(lr=0.01, warmup_steps=0, max_steps=10,
                                      log_every=10**9))

    # uninterrupted run: 6 steps
    tr = make_trainer()
    losses_full = [tr.train_step(batch) for _ in range(6)]

    # interrupted run: 3 steps, checkpoint, 'crash'
    emc = ExpManagerConfig(exp_dir=str(tmp_path), name="resume",
                           checkpoint_every_n_steps=1,
                           create_tensorboard_logger=False)
    em = ExpManager(emc)
    tr1 = make_trainer()
    for _ in range(3):
        tr1.train_step(batch)
    em.maybe_checkpoint(tr1.step, tr1.model.params, tr1.opt_state, force=True)
    del tr1

    # resumed run: restore and do the remaining 3 steps
    em2 = ExpManager(dataclasses.replace(emc, resume_if_exists=True))
    ckpt = em2.check_resume()
    assert ckpt is not None
    tr2 = make_trainer()
    params, opt, step, _ = load_training_ckpt(ckpt, tr2.model.params,
                                              tr2.opt_state)
    tr2.model.params, tr2.opt_state, tr2.step = params, opt, step
    losses_resumed = [tr2.train_step(batch) for _ in range(3)]
    np.testing.assert_allclose(losses_resumed, losses_full[3:], rtol=1e-5)


def test_compile_cache_setup(tmp_path, monkeypatch):
    """setup_compile_cache points jax at the env-selected dir, creates it,
    and '0' disables (no config churn)."""
    import jax

    from qasr_tpu.utils.compile_cache import setup_compile_cache

    d = tmp_path / "jx"
    monkeypatch.setenv("QASR_COMPILE_CACHE", str(d))
    assert setup_compile_cache() == str(d)
    assert d.is_dir()
    assert jax.config.jax_compilation_cache_dir == str(d)

    monkeypatch.setenv("QASR_COMPILE_CACHE", "0")
    assert setup_compile_cache() is None
