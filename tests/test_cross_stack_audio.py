"""Audio-in -> transcript-out cross-stack validation (VERDICT r3 item 3).

The whole-model parity test enters at features; this capstone enters at WAV
BYTES and runs the two COMPLETE stacks side by side on the procedural
corpus:

  reference:  wav -> FilterbankFeatures.forward (features.py:334-397)
              -> ConvASREncoder -> ConvASRDecoder (conv_asr.py:194-275)
              -> WER.ctc_decoder_predictions_tensor (wer.py:117-136)
              [the EncDecCTCModel.forward chain, ctc_models.py:383-406,
               minus the ModelPT shell]
  ours:       wav -> ASRModel.transcribe (the public file-level API,
              ctc_models.py:150 equivalent)

at fp32 AND at frozen integer W6A6 / W4A8 (VERDICT r3 item 9) with ported
weights but INDEPENDENTLY computed features and INDEPENDENTLY calibrated
ranges — this is exactly the STFT/mel -> first-QuantAct seam SURVEY hard
part #2 calls out: each stack's own frontend feeds its own percentile-free
min/max calibration, so any frontend drift that would be WER-visible shows
up as transcript divergence here.

The model is trained (on our stack) to zero corpus WER, then its weights
are ported INTO the reference modules via compat.nemo_loader.
state_dict_from_params — the same mapping .nemo export interop uses.

librosa is not installed in this sandbox; the reference's mel matrix
(librosa.filters.mel, features.py:281-283) is provided by our own
independently-implemented Slaney filterbank (property-tested in
test_frontend.py), transposed to librosa's (n_mels, n_freqs) layout.
editdistance / pytorch_lightning.metrics.Metric are stubbed the same way
(pure-python DP / plain base class).
"""
import os
import sys
import types

import numpy as np
import pytest

from test_reference_model_parity import (  # noqa: F401  (fixture: ref)
    REF, _block_dict, _load, ref)

pytestmark = pytest.mark.filterwarnings("ignore::UserWarning")


@pytest.fixture(scope="module")
def ref_audio(ref):
    """Extends the `ref` stack with the reference's own FilterbankFeatures
    and WER, stubbing the C-library deps they import."""
    torch = ref.torch

    if "librosa" not in sys.modules:
        from qasr_tpu.ops.features import mel_filterbank

        librosa = types.ModuleType("librosa")
        filters = types.ModuleType("librosa.filters")

        def _mel(sr, n_fft, n_mels=128, fmin=0.0, fmax=None, **kw):
            return mel_filterbank(sr, n_fft, n_mels, fmin, fmax).T

        filters.mel = _mel
        librosa.filters = filters
        util = types.ModuleType("librosa.util")
        util.tiny = lambda x: np.finfo(np.float32).tiny
        librosa.util = util
        sys.modules["librosa"] = librosa
        sys.modules["librosa.filters"] = filters
        sys.modules["librosa.util"] = util

    if "torch_stft" not in sys.modules:
        ts = types.ModuleType("torch_stft")

        class STFT:  # only touched when stft_conv=True
            def __init__(self, *a, **k):
                raise NotImplementedError

        ts.STFT = STFT
        sys.modules["torch_stft"] = ts

    for name, attrs in [
        ("nemo.collections.asr.parts.perturb", {"AudioAugmentor": object}),
        ("nemo.collections.asr.parts.segment", {"AudioSegment": object}),
    ]:
        if name not in sys.modules:
            mod = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(mod, k, v)
            sys.modules[name] = mod

    if "editdistance" not in sys.modules:
        from qasr_tpu.decode.ctc import edit_distance

        ed = types.ModuleType("editdistance")
        ed.eval = lambda a, b: edit_distance(list(a), list(b))
        sys.modules["editdistance"] = ed

    if "pytorch_lightning" not in sys.modules:
        pl = types.ModuleType("pytorch_lightning")
        plm = types.ModuleType("pytorch_lightning.metrics")

        class Metric:
            def __init__(self, dist_sync_on_step=False, compute_on_step=True,
                         **kw):
                pass

            def add_state(self, name, default=None, dist_reduce_fx=None,
                          persistent=False):
                setattr(self, name, default)

        plm.Metric = Metric
        pl.metrics = plm
        sys.modules["pytorch_lightning"] = pl
        sys.modules["pytorch_lightning.metrics"] = plm

    ref.features = _load("nemo.collections.asr.parts.features",
                         f"{REF}/collections/asr/parts/features.py")
    ref.wer = _load("nemo.collections.asr.metrics.wer",
                    f"{REF}/collections/asr/metrics/wer.py")
    assert ref.features.FilterbankFeatures is not None
    return ref


N_UTTS = 8
FEAT = 64


def _capstone_cfg():
    from qasr_tpu.models.config import (BlockConfig, DecoderConfig,
                                        EncoderConfig, ModelConfig)

    blocks = (
        BlockConfig(filters=24, repeat=1, kernel=(7,), stride=(2,),
                    residual=False, separable=True),
        BlockConfig(filters=24, repeat=2, kernel=(5,), residual=True,
                    separable=True),
        BlockConfig(filters=32, repeat=1, kernel=(1,), residual=False),
    )
    enc = EncoderConfig(feat_in=FEAT, blocks=blocks, activation="relu")
    labels = tuple(" abcdefghijklmnopqrstuvwxyz'")
    return ModelConfig(
        encoder=enc,
        decoder=DecoderConfig(feat_in=32, num_classes=len(labels)),
        labels=labels,
        # the standard 64-mel frontend (conf/quartznet_15x5.yaml:29-40)
        preprocessor={"features": FEAT, "dither": 0.0})


@pytest.fixture(scope="module")
def corpus_on_disk(tmp_path_factory):
    """Train to zero corpus WER on our stack, then write the corpus as PCM16
    wav files — the capstone enters from these bytes on both stacks."""
    from tests.corpus_utils import make_corpus, train_ctc_model
    from qasr_tpu.data.audio import write_wav
    from qasr_tpu.models.ctc_model import ASRModel

    texts, audio, alens = make_corpus(N_UTTS, seed=5, min_words=2,
                                      max_words=2, noise=0.01)
    model = ASRModel.from_config(_capstone_cfg(), seed=0)
    train_ctc_model(model, texts, audio, alens, steps=500, batch_size=8)

    d = tmp_path_factory.mktemp("capstone_wavs")
    paths = []
    for i in range(N_UTTS):
        p = str(d / f"utt{i:02d}.wav")
        write_wav(p, audio[i, : alens[i]], 16000)
        paths.append(p)

    hyps = [h.strip() for h in model.transcribe(paths, batch_size=N_UTTS)]
    assert hyps == texts, f"training did not converge from wav: {hyps}"
    return model, texts, paths


def _ref_stack(ref_audio, model):
    """Reference preprocessor+encoder+decoder with our trained weights."""
    torch = ref_audio.torch
    from qasr_tpu.compat.nemo_loader import state_dict_from_params

    cfg = model.cfg
    torch.manual_seed(0)
    enc = ref_audio.conv_asr.ConvASREncoder(
        jasper=[_block_dict(b) for b in cfg.encoder.blocks],
        activation=cfg.encoder.activation, feat_in=cfg.encoder.feat_in,
        quant_mode="symmetric", quant_bit=8)
    dec = ref_audio.conv_asr.ConvASRDecoder(
        feat_in=cfg.decoder.feat_in, num_classes=cfg.decoder.num_classes,
        vocabulary=list(model.vocabulary), quant_mode="symmetric",
        quant_bit=8)
    wrapper = torch.nn.Module()
    wrapper.encoder = enc
    wrapper.decoder = dec
    wrapper.eval()
    missing, unexpected = wrapper.load_state_dict(
        state_dict_from_params(model.plan, model.params, quant_layout=True),
        strict=False)
    assert not [k for k in missing if "x_min" not in k and "x_max" not in k
                and "weight_integer" not in k and "bias_integer" not in k
                and "scaling_factor" not in k and "fix_flag" not in k
                and "pre_weight" not in k and "identity" not in k
                and "conv_scaling_factor" not in k
                and "fc_scaling_factor" not in k], missing
    assert not unexpected, unexpected

    fb = ref_audio.features.FilterbankFeatures(dither=0.0, pad_to=16,
                                               nfilt=FEAT)
    wer = ref_audio.wer.WER(vocabulary=list(model.vocabulary),
                            log_prediction=False)
    return wrapper, fb, wer


def _ref_transcribe(ref_audio, wrapper, fb, wer, paths, quant):
    """wav bytes -> transcripts through the reference chain
    (ctc_models.py:383-406: preprocess -> encode -> decode -> argmax,
    then wer.py:117-136 greedy collapse)."""
    torch = ref_audio.torch
    from qasr_tpu.data.audio import read_audio

    sigs = [read_audio(p, 16000) for p in paths]
    max_len = max(len(s) for s in sigs)
    batch = np.zeros((len(sigs), max_len), np.float32)
    for i, s in enumerate(sigs):
        batch[i, : len(s)] = s
    lens = torch.tensor([len(s) for s in sigs])
    with torch.no_grad():
        feats, flens = fb(torch.from_numpy(batch), lens)
        out = wrapper.encoder(feats, flens)
        if quant:
            enc_out, enc_lens, sf = out
        else:
            enc_out, enc_lens, sf = out[0], out[1], None
        lp = wrapper.decoder(enc_out, sf)
        preds = lp.argmax(dim=-1, keepdim=False)
    # This NeMo version's ctc_decoder_predictions_tensor (wer.py:117-136)
    # decodes FULL padded rows — real models emit blank on the zero-filled
    # tail so it is invisible there, but the tiny corpus model does not.
    # Slice each row to its true encoded length (what the convention
    # assumes) so the comparison tests frontend/encoder numerics, not the
    # padding-tail artifact.
    return [
        wer.ctc_decoder_predictions_tensor(
            preds[i: i + 1, : int(enc_lens[i])])[0].strip()
        for i in range(preds.shape[0])
    ]


def test_fp32_cross_stack_from_wav(ref_audio, corpus_on_disk):
    """fp32: byte-identical corpus through two complete, independently
    implemented stacks must produce identical transcripts."""
    model, texts, paths = corpus_on_disk
    wrapper, fb, wer = _ref_stack(ref_audio, model)
    wrapper.encoder.set_quant_mode("none")
    wrapper.decoder.set_quant_mode("none")
    hyps_ref = _ref_transcribe(ref_audio, wrapper, fb, wer, paths,
                               quant=False)
    hyps_us = [h.strip() for h in model.transcribe(paths,
                                                   batch_size=N_UTTS)]
    assert hyps_us == hyps_ref == texts


@pytest.mark.parametrize("wb,ab", [
    (6, 6),   # the paper's headline width (README.md:75-87)
    (4, 8),   # VERDICT r3 item 9: W4 is where deep-layer range drift would
              # first become transcript-visible
])
def test_frozen_integer_cross_stack_from_wav(ref_audio, corpus_on_disk,
                                             wb, ab):
    """Frozen integer path from wav bytes with INDEPENDENT calibration:
    each stack computes its own features from the same files and calibrates
    its own min/max EMA ranges on the same held-in utterances, then
    transcribes the corpus.  Covers SURVEY hard-part #2 end to end."""
    import copy

    from qasr_tpu.decode.ctc import word_error_rate
    from qasr_tpu.models.ctc_model import ASRModel

    trained_model, texts, paths = corpus_on_disk
    torch = ref_audio.torch

    # ---- our stack: quantize + calibrate on its own features ----
    model = ASRModel.from_config(_capstone_cfg(), seed=0)
    model.params = copy.deepcopy(trained_model.params)
    model.set_quant_bit(wb, "weight")
    model.set_quant_bit(ab, "act")
    model.bn_folding()
    from qasr_tpu.data.audio import read_audio
    sigs = [read_audio(p, 16000) for p in paths[:4]]
    max_len = max(len(s) for s in sigs)
    cal_audio = np.zeros((len(sigs), max_len), np.float32)
    for i, s in enumerate(sigs):
        cal_audio[i, : len(s)] = s
    cal_lens = np.asarray([len(s) for s in sigs], np.int32)
    f, fl = trained_model.frontend(cal_audio, cal_lens, dither=0.0)
    model.calibrate([(np.asarray(f), np.asarray(fl))])
    hyps_us = [h.strip() for h in model.transcribe(paths,
                                                   batch_size=N_UTTS)]

    # ---- reference stack: quantize + calibrate on ITS own features ----
    wrapper, fb, wer = _ref_stack(ref_audio, trained_model)
    wrapper.encoder.set_quant_mode("symmetric")
    wrapper.decoder.set_quant_mode("symmetric")
    wrapper.encoder.set_quant_bit(wb, "weight")
    wrapper.encoder.set_quant_bit(ab, "act")
    wrapper.decoder.set_quant_bit(wb, "weight")
    wrapper.decoder.set_quant_bit(ab, "act")
    wrapper.encoder.bn_folding()
    ref_audio.qm.calibrate(wrapper)
    with torch.no_grad():
        feats, flens = fb(torch.from_numpy(cal_audio),
                          torch.from_numpy(cal_lens.astype(np.int64)))
        out = wrapper.encoder(feats, flens)
        wrapper.decoder(out[0], out[2])
    ref_audio.qm.evaluate(wrapper)
    hyps_ref = _ref_transcribe(ref_audio, wrapper, fb, wer, paths,
                               quant=True)

    # the VERDICT criterion: transcript equality, or WER delta < 0.1%
    # absolute (corpus-level, each stack scored against the ground truth)
    if hyps_us != hyps_ref:
        wer_us = word_error_rate(hyps_us, texts)
        wer_ref = word_error_rate(hyps_ref, texts)
        assert abs(wer_us - wer_ref) < 1e-3, (
            wb, ab, wer_us, wer_ref, hyps_us, hyps_ref)
