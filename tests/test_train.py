"""Training stack tests: Novograd vs torch-semantics reimplementation,
schedule formulas vs reference math, CTC loss vs torch.nn.CTCLoss, spec
augment invariants, and a tiny end-to-end overfit run."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qasr_tpu.models.config import DecoderConfig, ModelConfig
from qasr_tpu.models.ctc_model import ASRModel
from qasr_tpu.ops.spec_augment import SpecAugmentConfig, spec_augment
from qasr_tpu.train.ctc_loss import ctc_loss
from qasr_tpu.train.optim import cosine_annealing, novograd, squareroot_annealing
from qasr_tpu.train.trainer import TrainConfig, Trainer
from tests.test_jasper_model import tiny_encoder_cfg, FEAT


def test_novograd_matches_torch_reference_math(rng):
    torch = pytest.importorskip("torch")
    # independent reimplementation of novograd.py:108-150 on a single tensor
    p0 = rng.normal(size=(4, 3)).astype(np.float32)
    grads = [rng.normal(size=(4, 3)).astype(np.float32) for _ in range(5)]
    lr, b1, b2, eps, wd = 0.01, 0.95, 0.98, 1e-8, 0.001

    p_ref = torch.from_numpy(p0.copy())
    m = torch.zeros_like(p_ref)
    v = torch.zeros(())
    for g_np in grads:
        g = torch.from_numpy(g_np.copy())
        norm = g.norm() ** 2
        v = norm.clone() if v == 0 else v * b2 + norm * (1 - b2)
        g = g / (v.sqrt() + eps) + wd * p_ref
        m = m * b1 + g
        p_ref = p_ref - lr * m

    tx = novograd(lr, betas=(b1, b2), eps=eps, weight_decay=wd)
    params = {"w": jnp.asarray(p0)}
    state = tx.init(params)
    for g_np in grads:
        upd, state = tx.update({"w": jnp.asarray(g_np)}, state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, upd)
    np.testing.assert_allclose(np.asarray(params["w"]), p_ref.numpy(), rtol=1e-5)


def test_schedules_match_reference_formulas():
    import math
    base, maxs, minl, warm = 0.05, 1000, 1e-4, 100
    sched = cosine_annealing(base, maxs, minl, warmup_steps=warm)
    # warmup: base * (step+1)/(warmup+1)   (lr_scheduler.py:70-72)
    for s in (0, 50, 100):
        assert abs(float(sched(s)) - base * (s + 1) / (warm + 1)) < 1e-7
    # annealing region: cosine on (step - warmup) / (max - warmup)
    for s in (101, 500, 999):
        mult = 0.5 * (1 + math.cos(math.pi * (s - warm) / (maxs - warm)))
        expect = (base - minl) * mult + minl
        assert abs(float(sched(s)) - expect) < 1e-6, s
    # past max: min_lr  (lr_scheduler.py:74-75)
    assert abs(float(sched(2000)) - minl) < 1e-9
    sq = squareroot_annealing(base, maxs, 0.0, warmup_steps=0)
    assert abs(float(sq(250)) - base * math.sqrt(750 / 1000)) < 1e-6


def test_ctc_loss_matches_torch(rng):
    torch = pytest.importorskip("torch")
    B, T, V, L = 3, 20, 5, 6  # blank id V
    logits = rng.normal(size=(B, T, V + 1)).astype(np.float32)
    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    in_lens = np.asarray([20, 15, 12], np.int32)
    targets = rng.integers(0, V, size=(B, L)).astype(np.int32)
    t_lens = np.asarray([6, 4, 3], np.int32)
    ours = ctc_loss(lp, jnp.asarray(in_lens), jnp.asarray(targets),
                    jnp.asarray(t_lens), blank_id=V, reduction="mean_batch")
    crit = torch.nn.CTCLoss(blank=V, reduction="none", zero_infinity=True)
    ref = crit(torch.from_numpy(np.asarray(lp)).transpose(1, 0),
               torch.from_numpy(targets.astype(np.int64)),
               torch.from_numpy(in_lens.astype(np.int64)),
               torch.from_numpy(t_lens.astype(np.int64))).mean()
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4)


def test_spec_augment_zeroes_bands(rng):
    x = jnp.ones((2, 50, 32))
    cfg = SpecAugmentConfig(freq_masks=2, time_masks=2, freq_width=6,
                            time_width=8, rect_masks=2, rect_time=5, rect_freq=4)
    y = np.asarray(spec_augment(jax.random.PRNGKey(0), x, cfg))
    assert y.shape == x.shape
    assert (y == 0).any()
    assert set(np.unique(y)) <= {0.0, 1.0}


def _tiny_model():
    enc = tiny_encoder_cfg()
    dec = DecoderConfig(feat_in=40, num_classes=28)
    cfg = ModelConfig(encoder=enc, decoder=dec,
                      preprocessor={"features": FEAT, "dither": 0.0})
    return ASRModel.from_config(cfg)


def test_trainer_overfits_tiny_batch(rng):
    model = _tiny_model()
    tcfg = TrainConfig(lr=0.01, warmup_steps=0, max_steps=30, log_every=1000,
                       sched="CosineAnnealing")
    tr = Trainer(model, tcfg)
    audio = rng.normal(size=(2, 4000)).astype(np.float32) * 0.1
    alens = np.asarray([4000, 4000], np.int32)
    tokens = np.asarray([[1, 2, 3, 0, 0, 0, 0, 0]] * 2, np.int32)
    tlens = np.asarray([3, 3], np.int32)
    batch = (audio, alens, tokens, tlens)
    l0 = tr.train_step(batch)
    for _ in range(25):
        l = tr.train_step(batch)
    assert np.isfinite(l)
    assert l < l0, (l0, l)


def test_trainer_sharded_step_on_cpu_mesh(rng):
    from qasr_tpu.parallel.mesh import make_mesh, replicate_params

    if len(jax.devices()) < 4:
        pytest.skip("needs forced 8-device CPU")
    mesh = make_mesh(data=4, model=1)
    model = _tiny_model()
    tcfg = TrainConfig(lr=0.005, warmup_steps=0, max_steps=10, log_every=1000)
    tr = Trainer(model, tcfg, mesh=mesh)
    audio = rng.normal(size=(4, 4000)).astype(np.float32) * 0.1
    alens = np.full((4,), 4000, np.int32)
    tokens = np.tile(np.asarray([[1, 2, 3, 4]], np.int32), (4, 1))
    tlens = np.full((4,), 4, np.int32)
    l1 = tr.train_step((audio, alens, tokens, tlens))
    l2 = tr.train_step((audio, alens, tokens, tlens))
    assert np.isfinite(l1) and np.isfinite(l2)
