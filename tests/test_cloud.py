"""Checkpoint fetch + cache for from_pretrained (reference cloud.py:24-82 +
common.py:378-433), exercised against file:// URLs — no egress needed."""
import os

import numpy as np
import pytest

from qasr_tpu.models.ctc_model import ASRModel
from qasr_tpu.utils.cloud import (PretrainedModelInfo, maybe_download_from_cloud,
                                  model_card, register_model_card,
                                  resolve_pretrained)
from tests.test_pretrained_io import _tiny_cfg_dict


@pytest.fixture
def tiny_nemo(tmp_path):
    pytest.importorskip("torch")
    from qasr_tpu.compat.nemo_loader import save_nemo
    from qasr_tpu.models.config import ModelConfig

    cfg_d = _tiny_cfg_dict()
    m = ASRModel.from_config(ModelConfig.from_dict(cfg_d), seed=11)
    path = tmp_path / "TinyCloudNet.nemo"
    save_nemo(str(path), cfg_d, m.plan, m.params)
    return m, str(path)


def test_fetch_miss_download_restore(tiny_nemo, tmp_path, monkeypatch, rng):
    """Cache miss -> download -> restore; second call re-uses the cache
    (common.py:378-433 + cloud.py:24-82)."""
    m, nemo_path = tiny_nemo
    cache = tmp_path / "cache"
    monkeypatch.setenv("QASR_CACHE_DIR", str(cache))
    monkeypatch.delenv("QASR_PRETRAINED_DIR", raising=False)
    card = PretrainedModelInfo("TinyCloudNet",
                               "file://" + nemo_path,
                               "tiny test checkpoint")
    register_model_card(card)
    try:
        calls = []

        def counting_fetcher(url, dest):
            calls.append(url)
            import urllib.request, shutil
            with urllib.request.urlopen(url) as r, open(dest, "wb") as f:
                shutil.copyfileobj(r, f)

        m2 = ASRModel.from_pretrained("TinyCloudNet", fetcher=counting_fetcher)
        assert len(calls) == 1
        audio = rng.normal(size=(1, 4000)).astype(np.float32) * 0.1
        lens = np.asarray([4000], np.int32)
        np.testing.assert_allclose(m.forward(audio, lens, mode="fp32")[0],
                                   m2.forward(audio, lens, mode="fp32")[0],
                                   atol=1e-5)

        # cache hit: no new fetch
        ASRModel.from_pretrained("TinyCloudNet", fetcher=counting_fetcher)
        assert len(calls) == 1
        # refresh_cache forces a re-download (cloud.py:49-53)
        ASRModel.from_pretrained("TinyCloudNet", fetcher=counting_fetcher,
                                 refresh_cache=True)
        assert len(calls) == 2
    finally:
        # deregister so other tests see only the stock cards
        from qasr_tpu.utils import cloud
        cloud.MODEL_CARDS = [c for c in cloud.MODEL_CARDS
                             if c.pretrained_model_name != "TinyCloudNet"]


def test_download_retries_then_raises(tmp_path):
    attempts = []

    def flaky(url, dest):
        attempts.append(url)
        if len(attempts) < 2:
            raise OSError("transient")
        with open(dest, "w") as f:
            f.write("payload")

    p = maybe_download_from_cloud("http://x/", "f.bin",
                                  cache_dir=str(tmp_path / "c1"),
                                  fetcher=flaky)
    assert open(p).read() == "payload" and len(attempts) == 2

    def always_fails(url, dest):
        raise OSError("down")

    with pytest.raises(RuntimeError, match="unable to download"):
        maybe_download_from_cloud("http://x/", "g.bin",
                                  cache_dir=str(tmp_path / "c2"),
                                  fetcher=always_fails)
    # a crashed fetch must not poison the cache with a partial file
    assert not os.path.exists(tmp_path / "c2" / "g.bin")


def test_cache_key_changes_with_description(tmp_path):
    """md5(location+description) keying: a changed description forces a
    distinct cache slot (common.py:417-419)."""
    writes = []

    def fetcher(url, dest):
        writes.append(dest)
        with open(dest, "w") as f:
            f.write("x")

    for desc in ("v1", "v2"):
        register_model_card(PretrainedModelInfo("KeyedNet",
                                                "file:///nonexistent/KeyedNet.nemo",
                                                desc))
        resolve_pretrained("KeyedNet", cache_dir=str(tmp_path), fetcher=fetcher)
    from qasr_tpu.utils import cloud
    cloud.MODEL_CARDS = [c for c in cloud.MODEL_CARDS
                         if c.pretrained_model_name != "KeyedNet"]
    assert len(writes) == 2
    assert os.path.dirname(writes[0]) != os.path.dirname(writes[1])


def test_stock_cards_match_reference():
    """Stock card urls/names mirror ctc_models.py:47-89."""
    assert resolve_pretrained("NoSuchModel") is None
    card = model_card("QuartzNet15x5Base-En")
    assert card is not None and card.location.endswith(
        "QuartzNet15x5Base-En.nemo")


def test_wandb_offline_hook(tmp_path):
    """create_wandb_logger without the wandb package records the stream to
    wandb_offline.jsonl (reference exp_manager.py:498-539)."""
    import json

    from qasr_tpu.utils.exp_manager import ExpManager, ExpManagerConfig

    with pytest.raises(ValueError, match="name and project"):
        ExpManager(ExpManagerConfig(exp_dir=str(tmp_path / "a"),
                                    create_wandb_logger=True))

    em = ExpManager(ExpManagerConfig(exp_dir=str(tmp_path / "b"),
                                     create_wandb_logger=True,
                                     wandb_kwargs={"name": "run1",
                                                   "project": "qasr"}))
    em.log_metrics(5, loss=1.25, note="warm")
    em.close()
    path = os.path.join(em.log_dir, "wandb_offline.jsonl")
    lines = [json.loads(l) for l in open(path)]
    assert lines[0] == {"wandb_init": {"name": "run1", "project": "qasr"}}
    assert lines[1]["step"] == 5 and lines[1]["loss"] == 1.25
    assert lines[1]["note"] == "warm"
