"""Mesh-sharded evaluation tests on the virtual 8-device CPU mesh: sharded
results must equal single-device results (batch sharding and time-axis
context parallelism with XLA halo exchange)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qasr_tpu.models.config import DecoderConfig, ModelConfig, QuantConfig
from qasr_tpu.models.ctc_model import ASRModel
from qasr_tpu.models.jasper import fabricate_qstate
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
    m.qstate = fabricate_qstate(m.plan)
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
    integer outputs must be bit-identical to the unsharded run."""
    m, tables, audio, lens, ids_ref, el_ref = frozen_setup
    mesh = make_mesh(data=2, model=4)
    fwd = make_sharded_frozen_forward(m, tables, mesh, shard_time=True)
    ids, el = fwd(jnp.asarray(audio), jnp.asarray(lens))
    np.testing.assert_array_equal(np.asarray(el), el_ref)
    np.testing.assert_array_equal(np.asarray(ids), ids_ref)


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
