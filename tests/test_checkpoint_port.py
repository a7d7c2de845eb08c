"""checkpoint_port CLI: old-NeMo per-module ckpts -> v1.0 .nemo
(reference scripts/asr_checkpoint_port.py:28-68)."""
import numpy as np
import pytest

from qasr_tpu.models.ctc_model import ASRModel
from qasr_tpu.models.config import ModelConfig
from tests.test_pretrained_io import _tiny_cfg_dict


def _split_module_ckpts(tmp_path, m):
    """Write NeMo-0.11-style per-module state dicts: module-relative keys
    (the reference loads them with model.encoder.load_state_dict)."""
    import torch

    from qasr_tpu.compat.nemo_loader import state_dict_from_params

    sd = state_dict_from_params(m.plan, m.params)
    enc = {k[len("encoder."):]: v for k, v in sd.items()
           if k.startswith("encoder.")}
    dec = {k[len("decoder."):]: v for k, v in sd.items()
           if k.startswith("decoder.")}
    enc_p, dec_p = tmp_path / "enc.pt", tmp_path / "dec.pt"
    torch.save(enc, str(enc_p))
    torch.save(dec, str(dec_p))
    return str(enc_p), str(dec_p)


def test_port_roundtrip_asr(tmp_path, rng):
    pytest.importorskip("torch")
    import yaml

    from qasr_tpu.cli.checkpoint_port import main

    cfg_d = _tiny_cfg_dict()
    m = ASRModel.from_config(ModelConfig.from_dict(cfg_d), seed=3)
    enc_p, dec_p = _split_module_ckpts(tmp_path, m)
    cfg_path = tmp_path / "config.yaml"
    # training YAMLs nest the model section under 'model'
    # (conf/quartznet_15x5.yaml layout) — the reference reads
    # params['model'] (asr_checkpoint_port.py:50-55)
    with open(cfg_path, "w") as f:
        yaml.safe_dump({"model": cfg_d}, f)
    out = tmp_path / "Ported.nemo"
    main(["--config_path", str(cfg_path), "--encoder_ckpt", enc_p,
          "--decoder_ckpt", dec_p, "--output_path", str(out)])

    m2 = ASRModel.from_pretrained(str(out))
    audio = rng.normal(size=(1, 4000)).astype(np.float32) * 0.1
    lens = np.asarray([4000], np.int32)
    lp1 = m.forward(audio, lens, mode="fp32")[0]
    lp2 = m2.forward(audio, lens, mode="fp32")[0]
    np.testing.assert_allclose(lp1, lp2, atol=1e-5)


def test_port_rejects_mismatched_encoder(tmp_path):
    pytest.importorskip("torch")
    import torch
    import yaml

    from qasr_tpu.cli.checkpoint_port import main

    cfg_d = _tiny_cfg_dict()
    m = ASRModel.from_config(ModelConfig.from_dict(cfg_d), seed=3)
    enc_p, dec_p = _split_module_ckpts(tmp_path, m)
    # drop one conv weight from the encoder ckpt -> strict validation fails
    enc = torch.load(enc_p, weights_only=True)
    victim = next(k for k in enc if k.endswith("conv.weight"))
    del enc[victim]
    torch.save(enc, enc_p)
    cfg_path = tmp_path / "config.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump({"model": cfg_d}, f)
    with pytest.raises(KeyError):
        main(["--config_path", str(cfg_path), "--encoder_ckpt", enc_p,
              "--decoder_ckpt", dec_p, "--output_path",
              str(tmp_path / "x.nemo")])


def test_port_speech_label_passthrough_decoder(tmp_path):
    """Non-asr decoder heads are repackaged verbatim (only the shared conv
    encoder is plan-validated)."""
    pytest.importorskip("torch")
    import torch
    import yaml

    from qasr_tpu.cli.checkpoint_port import main
    from qasr_tpu.compat.nemo_loader import state_dict_from_params

    cfg_d = _tiny_cfg_dict()
    m = ASRModel.from_config(ModelConfig.from_dict(cfg_d), seed=0)
    sd = state_dict_from_params(m.plan, m.params)
    enc = {k[len("encoder."):]: v for k, v in sd.items()
           if k.startswith("encoder.")}
    # classification decoder: pooled Linear head
    dec = {"decoder_layers.0.weight": torch.zeros(5, 40),
           "decoder_layers.0.bias": torch.zeros(5)}
    enc_p, dec_p = tmp_path / "enc.pt", tmp_path / "dec.pt"
    torch.save(enc, str(enc_p))
    torch.save(dec, str(dec_p))
    cfg_path = tmp_path / "config.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump({"model": cfg_d}, f)
    out = tmp_path / "Cls.nemo"
    main(["--config_path", str(cfg_path), "--encoder_ckpt", str(enc_p),
          "--decoder_ckpt", str(dec_p), "--output_path", str(out),
          "--model_type", "speech_label"])
    # the merged archive holds the head verbatim under the decoder prefix
    import tarfile
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        with tarfile.open(str(out)) as tar:
            tar.extractall(td, filter="data")
        merged = torch.load(f"{td}/model_weights.ckpt", weights_only=True)
    assert merged["decoder.decoder_layers.0.weight"].shape == (5, 40)
    assert any(k.startswith("encoder.encoder.0.mconv.0") for k in merged)
