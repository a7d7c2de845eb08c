"""Data-free synthesizer tests: the distillation loss must drive batch
statistics toward the BN running statistics (distill_data.py semantics)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qasr_tpu.models import jasper as J
from qasr_tpu.quantize.synth import (
    bn_targets, distill_loss, get_synthetic_data, synthesize_batch, _plateau_step,
    _SchedState,
)
from tests.test_jasper_model import make_model, FEAT


def test_distill_loss_decreases():
    cfg, plan, enc, dec, dec_cfg = make_model()
    targets = bn_targets(plan, enc)
    key = jax.random.PRNGKey(0)
    x, losses = synthesize_batch(plan, enc, key, batch_size=2, dim=FEAT,
                                 seqlen=32, train_iter=40, lr=0.05,
                                 targets=targets)
    losses = np.asarray(losses)
    assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])
    assert x.shape == (2, 32, FEAT)
    assert np.isfinite(np.asarray(x)).all()


def test_get_synthetic_data_api_and_pickle_roundtrip(tmp_path):
    cfg, plan, enc, dec, dec_cfg = make_model()
    batches = get_synthetic_data(plan, enc, batch_size=2, dim=FEAT, seqlen=32,
                                 train_iter=5, num_batch=3, lr=0.01,
                                 parallel=2, verbose=False)
    assert len(batches) == 3
    assert batches[0].shape == (2, 32, FEAT)
    from qasr_tpu.compat.pickle_io import load_synthetic, save_synthetic, synthetic_filename
    p = synthetic_filename("syn", 3, 5, 0.01, str(tmp_path))
    assert p.endswith("syn_nb3_iter5_lr0.010.pkl")  # synthesize.py:94-95 naming
    save_synthetic(p, batches)
    back = load_synthetic(p)  # (B, C, T) reference layout
    assert back[0].shape == (2, FEAT, 32)
    np.testing.assert_allclose(back[1], batches[1].transpose(0, 2, 1), rtol=1e-6)


def test_plateau_scheduler_matches_torch_semantics():
    torch = pytest.importorskip("torch")
    losses = [5.0, 4.0, 4.0004, 3.9999, 3.9999] + [3.9999] * 40 + [0.5] + [0.5] * 30
    # torch reference
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=0.05)
    sch = torch.optim.lr_scheduler.ReduceLROnPlateau(opt, min_lr=1e-4, patience=25)
    torch_lrs = []
    for l in losses:
        sch.step(l)
        torch_lrs.append(opt.param_groups[0]["lr"])
    # ours
    s = _SchedState(jnp.float32(0.05), jnp.float32(np.inf), jnp.int32(0))
    ours = []
    for l in losses:
        s = _plateau_step(s, jnp.float32(l))
        ours.append(float(s.lr))
    np.testing.assert_allclose(ours, torch_lrs, rtol=1e-6)
