"""'Folded but not fixed' BN-update quant training mode
(quant_modules.py:337-349 semantics): int conv on raw weights, BN running
stats EMA-updated from batch stats, output normalized with updated stats."""
import numpy as np
import jax.numpy as jnp

from qasr_tpu.models import jasper as J
from qasr_tpu.models.config import QuantConfig
from tests.test_jasper_model import make_model, FEAT


def test_bn_update_mode_runs_and_updates_stats(rng):
    cfg, plan, enc, dec, dec_cfg = make_model()
    qcfg = QuantConfig(weight_bit=8, act_bit=8)
    qstate = J.init_qstate(plan)
    x = jnp.asarray(rng.normal(size=(2, 32, FEAT)).astype(np.float32))
    lens = jnp.asarray([32, 32], np.int32)
    ex = J.QuantExec(enc, qstate, qcfg, activation="relu", update_ranges=True,
                     bn_update=True)
    out, _ = J.encoder_forward(ex, plan, x, lens)
    assert np.isfinite(np.asarray(out.dequantize())).all()
    # BN running stats were updated for every conv with a BN
    assert ex.new_bn_stats, "no BN updates recorded"
    b0 = ex.new_bn_stats[0]["convs"]
    for i, st in b0.items():
        before = np.asarray(enc["blocks"][0]["convs"][i]["bn"]["mean"])
        after = np.asarray(st["mean"])
        assert after.shape == before.shape
        assert not np.allclose(after, before)  # moved toward batch stats


def test_bn_update_required_when_unfolded(rng):
    cfg, plan, enc, dec, dec_cfg = make_model()
    qcfg = QuantConfig()
    qstate = J.init_qstate(plan)
    try:
        J.QuantExec(enc, qstate, qcfg, activation="relu", update_ranges=False)
        raised = False
    except ValueError:
        raised = True
    assert raised
