"""RNNT tests: loss vs exhaustive DP ground truth, gradients, decoding."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qasr_tpu.models.rnnt import (
    RNNTConfig, greedy_decode, init_rnnt_params, joint, pred_network,
    rnnt_loss, beam_decode_one,
)


def _ref_rnnt_nll(lp, target, t_len, u_len, blank):
    """Pure-python float64 forward algorithm."""
    alpha = np.full((t_len, u_len + 1), -np.inf)
    alpha[0, 0] = 0.0
    for t in range(t_len):
        for u in range(u_len + 1):
            if t == 0 and u == 0:
                continue
            c = []
            if t > 0:
                c.append(alpha[t - 1, u] + lp[t - 1, u, blank])
            if u > 0:
                c.append(alpha[t, u - 1] + lp[t, u - 1, target[u - 1]])
            alpha[t, u] = np.logaddexp.reduce(c) if c else -np.inf
    return -(alpha[t_len - 1, u_len] + lp[t_len - 1, u_len, blank])


def test_rnnt_loss_matches_reference_dp(rng):
    B, T, U, V = 3, 7, 4, 5
    logits = rng.normal(size=(B, T, U + 1, V + 1)).astype(np.float32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    targets = rng.integers(0, V, size=(B, U)).astype(np.int32)
    t_lens = np.asarray([7, 5, 6], np.int32)
    u_lens = np.asarray([4, 2, 3], np.int32)
    got = rnnt_loss(jnp.asarray(lp), jnp.asarray(targets), jnp.asarray(t_lens),
                    jnp.asarray(u_lens), blank_id=V, reduction="none")
    for i in range(B):
        want = _ref_rnnt_nll(lp[i], targets[i], int(t_lens[i]), int(u_lens[i]), V)
        np.testing.assert_allclose(float(got[i]), want, rtol=1e-4)


def test_rnnt_loss_grad_finite(rng):
    B, T, U, V = 2, 5, 3, 4
    logits = jnp.asarray(rng.normal(size=(B, T, U + 1, V + 1)).astype(np.float32))
    targets = jnp.asarray(rng.integers(0, V, size=(B, U)).astype(np.int32))
    t_lens = jnp.asarray([5, 4], jnp.int32)
    u_lens = jnp.asarray([3, 2], jnp.int32)

    def f(lg):
        return rnnt_loss(jax.nn.log_softmax(lg, -1), targets, t_lens, u_lens, V)

    g = jax.grad(f)(logits)
    assert np.isfinite(np.asarray(g)).all()
    # grads flow only into valid region for sample 1 (t<4, u<=2)
    assert np.allclose(np.asarray(g)[1, 4], 0.0)


def test_pred_network_and_joint_shapes(rng):
    cfg = RNNTConfig(num_classes=28, enc_hidden=32, pred_hidden=16,
                     joint_hidden=24, pred_rnn_layers=2)
    params = init_rnnt_params(0, cfg)
    targets = jnp.asarray(rng.integers(0, 28, size=(2, 6)).astype(np.int32))
    pred = pred_network(params, cfg, targets)
    assert pred.shape == (2, 7, 16)
    enc = jnp.asarray(rng.normal(size=(2, 9, 32)).astype(np.float32))
    logits = joint(params, cfg, enc, pred)
    assert logits.shape == (2, 9, 7, 29)


def test_greedy_and_beam_decode_smoke(rng):
    cfg = RNNTConfig(num_classes=6, enc_hidden=8, pred_hidden=8, joint_hidden=8)
    params = init_rnnt_params(0, cfg)
    enc = jnp.asarray(rng.normal(size=(2, 6, 8)).astype(np.float32))
    lens = np.asarray([6, 4], np.int32)
    hyps = greedy_decode(params, cfg, enc, lens)
    assert len(hyps) == 2
    assert all(all(0 <= s < 6 for s in h) for h in hyps)
    ids = beam_decode_one(params, cfg, np.asarray(enc)[0], beam_size=2)
    assert all(0 <= s < 6 for s in ids)


def test_rnnt_model_end_to_end(rng):
    from qasr_tpu.models.config import DecoderConfig, ModelConfig
    from qasr_tpu.models.rnnt_model import RNNTModel
    from tests.test_jasper_model import tiny_encoder_cfg, FEAT

    cfg = ModelConfig(encoder=tiny_encoder_cfg(),
                      decoder=DecoderConfig(feat_in=40, num_classes=28),
                      preprocessor={"features": FEAT, "dither": 0.0})
    m = RNNTModel.from_config(cfg)
    audio = rng.normal(size=(2, 4000)).astype(np.float32) * 0.1
    alens = np.asarray([4000, 3000], np.int32)
    targets = jnp.asarray(rng.integers(0, 28, size=(2, 5)).astype(np.int32))
    tlens = jnp.asarray([5, 3], jnp.int32)
    loss = m.loss_fn(m.params, jnp.asarray(audio), jnp.asarray(alens),
                     targets, tlens)
    assert np.isfinite(float(loss))
    texts = m.transcribe_greedy(audio, alens)
    assert len(texts) == 2 and all(isinstance(t, str) for t in texts)


def test_conformer_transducer(rng):
    from qasr_tpu.models.config import DecoderConfig, ModelConfig
    from qasr_tpu.models.conformer import ConformerConfig
    from qasr_tpu.models.rnnt_model import RNNTModel
    from tests.test_jasper_model import tiny_encoder_cfg, FEAT

    cfg = ModelConfig(encoder=tiny_encoder_cfg(),
                      decoder=DecoderConfig(feat_in=40, num_classes=28),
                      preprocessor={"features": FEAT, "dither": 0.0})
    ccfg = ConformerConfig(feat_in=FEAT, n_layers=1, d_model=32, n_heads=4,
                           conv_kernel_size=7, subsampling="striding",
                           subsampling_factor=4, subsampling_conv_channels=8)
    m = RNNTModel.conformer_transducer(cfg, ccfg)
    audio = rng.normal(size=(2, 4000)).astype(np.float32) * 0.1
    alens = np.asarray([4000, 3000], np.int32)
    targets = jnp.asarray(rng.integers(0, 28, size=(2, 4)).astype(np.int32))
    tlens = jnp.asarray([4, 2], jnp.int32)
    loss = m.loss_fn(m.params, jnp.asarray(audio), jnp.asarray(alens),
                     targets, tlens)
    assert np.isfinite(float(loss))
    texts = m.transcribe_greedy(audio, alens)
    assert len(texts) == 2


def test_wavefront_matches_rowscan_and_dp(rng):
    from qasr_tpu.models.rnnt import rnnt_loss_wavefront, _rnnt_loss_rowscan

    B, T, U, V = 3, 9, 5, 6
    logits = rng.normal(size=(B, T, U + 1, V + 1)).astype(np.float32)
    lp = jnp.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    targets = jnp.asarray(rng.integers(0, V, size=(B, U)).astype(np.int32))
    t_lens = jnp.asarray([9, 6, 7], jnp.int32)
    u_lens = jnp.asarray([5, 2, 4], jnp.int32)
    a = rnnt_loss_wavefront(lp, targets, t_lens, u_lens, V, "none")
    b = _rnnt_loss_rowscan(lp, targets, t_lens, u_lens, V, "none")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4)
    for i in range(B):
        want = _ref_rnnt_nll(np.asarray(lp)[i], np.asarray(targets)[i],
                             int(t_lens[i]), int(u_lens[i]), V)
        np.testing.assert_allclose(float(a[i]), want, rtol=1e-4)
    # gradients finite and masked
    g = jax.grad(lambda l: rnnt_loss_wavefront(l, targets, t_lens, u_lens, V))(lp)
    assert np.isfinite(np.asarray(g)).all()


def test_rnnt_trainer_loss_decreases(rng):
    from qasr_tpu.models.config import DecoderConfig, ModelConfig
    from qasr_tpu.models.rnnt_model import RNNTModel
    from qasr_tpu.train.trainer import RNNTTrainer, TrainConfig
    from tests.test_jasper_model import tiny_encoder_cfg, FEAT

    cfg = ModelConfig(encoder=tiny_encoder_cfg(),
                      decoder=DecoderConfig(feat_in=40, num_classes=28),
                      preprocessor={"features": FEAT, "dither": 0.0})
    m = RNNTModel.from_config(cfg)
    tr = RNNTTrainer(m, TrainConfig(lr=0.005, warmup_steps=0, max_steps=25,
                                    log_every=10**9, grad_clip=1.0))
    audio = rng.normal(size=(2, 4000)).astype(np.float32) * 0.1
    batch = (audio, np.asarray([4000, 4000], np.int32),
             np.asarray([[1, 2, 3, 0]] * 2, np.int32),
             np.asarray([3, 3], np.int32))
    l0 = tr.train_step(batch)
    for _ in range(15):
        l = tr.train_step(batch)
    assert np.isfinite(l) and l < l0, (l0, l)


def test_rnnt_model_save_restore_roundtrip(tmp_path, rng):
    """Transducer checkpointing (.qasr): params + rnnt_cfg round-trip to an
    identical model; the BPE variant restores its tokenizer artifact and
    class (ModelPT save/restore parity for the RNNT family)."""
    from qasr_tpu.data.tokenizers import BPETokenizer
    from qasr_tpu.models.config import DecoderConfig, ModelConfig
    from qasr_tpu.models.rnnt_model import EncDecRNNTBPEModel, RNNTModel
    from tests.test_jasper_model import FEAT, tiny_encoder_cfg

    cfg = ModelConfig(encoder=tiny_encoder_cfg(),
                      decoder=DecoderConfig(feat_in=40, num_classes=28),
                      preprocessor={"features": FEAT, "dither": 0.0})
    m = RNNTModel.from_config(cfg, rnnt_cfg=RNNTConfig(
        num_classes=28, enc_hidden=40, pred_hidden=16, joint_hidden=16),
        seed=3)
    audio = (rng.normal(size=(1, 8000)) * 0.1).astype(np.float32)
    alens = np.asarray([8000], np.int32)
    h1 = m.transcribe_greedy(audio, alens)
    p = tmp_path / "rnnt.qasr"
    m.save_to(str(p))
    m2 = RNNTModel.restore_from(str(p))
    assert m2.rnnt_cfg == m.rnnt_cfg
    assert m2.transcribe_greedy(audio, alens) == h1

    # BPE variant: tokenizer artifact + class restore
    import os
    tok = BPETokenizer.train(["hello world the cat sat"] * 20, vocab_size=40,
                             save_path=str(tmp_path / "tok.json"))
    import dataclasses as dc
    bcfg = dc.replace(cfg, decoder=dc.replace(cfg.decoder, feat_in=40))
    mb = EncDecRNNTBPEModel.from_config_and_tokenizer(
        bcfg, tok, rnnt_cfg=RNNTConfig(num_classes=len(tok.vocab),
                                       enc_hidden=40, pred_hidden=16,
                                       joint_hidden=16), seed=4)
    pb = tmp_path / "rnnt_bpe.qasr"
    mb.save_to(str(pb))
    os.remove(tok.path)  # restore must use the packed artifact
    mb2 = RNNTModel.restore_from(str(pb))
    assert isinstance(mb2, EncDecRNNTBPEModel)
    ids = [1, 2, 3]
    assert mb2.tokenizer.ids_to_text(ids) == mb.tokenizer.ids_to_text(ids)
    assert mb2.transcribe_greedy(audio, alens) == mb.transcribe_greedy(audio, alens)

    # family guard: a CTC archive refuses the transducer loader
    from qasr_tpu.models.ctc_model import ASRModel
    mc = ASRModel.from_config(cfg, seed=5)
    pc = tmp_path / "ctc.qasr"
    mc.save_to(str(pc))
    with pytest.raises(ValueError, match="family"):
        RNNTModel.restore_from(str(pc))
