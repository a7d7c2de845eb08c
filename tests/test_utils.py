"""Typecheck / export / app-state / profiling / checkpoint utility tests."""
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
    from qasr_tpu.models.jasper import fabricate_qstate
    from qasr_tpu.utils.export import export_frozen_ctc, load_exported
    from tests.test_jasper_model import tiny_encoder_cfg, FEAT

    cfg = ModelConfig(encoder=tiny_encoder_cfg(),
                      decoder=DecoderConfig(feat_in=40, num_classes=28),
                      preprocessor={"features": FEAT, "dither": 0.0})
    m = ASRModel.from_config(cfg)
    m.bn_folding()
    m.qstate = fabricate_qstate(m.plan)
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
