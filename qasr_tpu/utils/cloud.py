"""Checkpoint download + cache for `from_pretrained`.

Equivalent of the reference's url -> md5-keyed cache -> restore pipeline
(nemo/utils/cloud.py:24-82 `maybe_download_from_cloud` and
nemo/core/classes/common.py:378-433 `from_pretrained`).  The fetcher is
injectable (``fetcher=`` / `set_default_fetcher`) so environments without
egress can serve checkpoints from file:// URLs, local mirrors, or object
stores; the default uses urllib (http/https/file all work).
"""
from __future__ import annotations

import hashlib
import os
import shutil
import time
import urllib.request
from dataclasses import dataclass
from pathlib import Path
from typing import Callable, List, Optional

from qasr_tpu.utils.logging import logging


@dataclass(frozen=True)
class PretrainedModelInfo:
    """Model-card entry (reference common.py PretrainedModelInfo: name,
    NGC location url, description with published WERs)."""

    pretrained_model_name: str
    location: str
    description: str = ""


# name -> card, mirroring EncDecCTCModel.list_available_models
# (ctc_models.py:47-89); descriptions keep the published WERs so the
# md5 cache key is stable across releases exactly like the reference's
MODEL_CARDS: List[PretrainedModelInfo] = [
    PretrainedModelInfo(
        "QuartzNet15x5Base-En",
        "https://api.ngc.nvidia.com/v2/models/nvidia/nemospeechmodels/"
        "versions/1.0.0a5/files/QuartzNet15x5Base-En.nemo",
        "QuartzNet15x5 trained on six datasets; WER 3.79% on LibriSpeech "
        "dev-clean, 10.05% on dev-other."),
    PretrainedModelInfo(
        "QuartzNet15x5NR-En",
        "https://api.ngc.nvidia.com/v2/models/nvidia/nemospeechmodels/"
        "versions/1.0.0a5/files/QuartzNet15x5NR-En.nemo",
        "QuartzNet15x5Base-En finetuned with RIR/noise augmentation; WER "
        "3.96% dev-clean, 10.14% dev-other."),
    PretrainedModelInfo(
        "QuartzNet5x5LS-En",
        "https://api.ngc.nvidia.com/v2/models/nvidia/nemospeechmodels/"
        "versions/1.0.0a5/files/QuartzNet5x5LS-En.nemo",
        "QuartzNet5x5 trained on LibriSpeech; WER 5.37% dev-clean, "
        "15.69% dev-other."),
    PretrainedModelInfo(
        "Jasper10x5Dr-En",
        "https://api.ngc.nvidia.com/v2/models/nvidia/nemospeechmodels/"
        "versions/1.0.0a5/files/Jasper10x5Dr-En.nemo",
        "Jasper10x5Dr trained on six datasets; WER 3.37% dev-clean, "
        "9.81% dev-other."),
]


def model_card(name: str) -> Optional[PretrainedModelInfo]:
    for card in MODEL_CARDS:
        if card.pretrained_model_name == name:
            return card
    return None


def register_model_card(card: PretrainedModelInfo) -> None:
    """Add/override a card (downstream checkpoints, test file:// mirrors)."""
    global MODEL_CARDS
    MODEL_CARDS = [c for c in MODEL_CARDS
                   if c.pretrained_model_name != card.pretrained_model_name]
    MODEL_CARDS.append(card)


# -- fetcher -----------------------------------------------------------------

Fetcher = Callable[[str, str], None]  # (url, destination_path) -> None


def _urllib_fetch(url: str, dest: str) -> None:
    with urllib.request.urlopen(url, timeout=30) as r, open(dest, "wb") as f:
        shutil.copyfileobj(r, f)


_DEFAULT_FETCHER: Fetcher = _urllib_fetch


def set_default_fetcher(fetcher: Optional[Fetcher]) -> None:
    """Install a process-wide fetcher (None restores urllib)."""
    global _DEFAULT_FETCHER
    _DEFAULT_FETCHER = fetcher or _urllib_fetch


def default_cache_dir() -> str:
    return os.environ.get(
        "QASR_CACHE_DIR",
        str(Path.home() / ".cache" / "qasr_tpu"))


def maybe_download_from_cloud(url: str, filename: str, *,
                              subfolder: Optional[str] = None,
                              cache_dir: Optional[str] = None,
                              refresh_cache: bool = False,
                              fetcher: Optional[Fetcher] = None,
                              max_attempts: int = 3) -> str:
    """url/filename -> cached local path (cloud.py:24-82 semantics: reuse the
    cached file unless refresh_cache, retry the download up to 3 times,
    return '' never — failures raise).  Downloads land in a temp name and
    rename atomically so a crashed fetch can't poison the cache."""
    dest_dir = Path(cache_dir or default_cache_dir())
    if subfolder:
        dest_dir = dest_dir / subfolder
    dest_dir.mkdir(parents=True, exist_ok=True)
    dest = dest_dir / filename
    if dest.exists():
        if refresh_cache:
            logging.info(f"refreshing cache: deleting {dest}")
            dest.unlink()
        else:
            logging.info(f"re-using cached file: {dest}")
            return str(dest)
    uri = url + filename if url.endswith("/") else url
    fetch = fetcher or _DEFAULT_FETCHER
    last_err: Optional[Exception] = None
    for attempt in range(1, max_attempts + 1):
        tmp = str(dest) + ".part"
        try:
            logging.info(f"downloading {uri} -> {dest}")
            fetch(uri, tmp)
            os.replace(tmp, dest)
            return str(dest)
        except Exception as e:  # NGC links flake; retry (cloud.py:70-81)
            last_err = e
            try:
                os.unlink(tmp)
            except OSError:
                pass
            logging.warning(f"download failed (attempt {attempt}/"
                            f"{max_attempts}): {e}")
            time.sleep(0.05)
    raise RuntimeError(f"unable to download {uri}: {last_err}")


def resolve_pretrained(name: str, *, refresh_cache: bool = False,
                       cache_dir: Optional[str] = None,
                       fetcher: Optional[Fetcher] = None) -> Optional[str]:
    """Model-card name -> cached .nemo path, downloading on a cache miss.

    The cache key is md5(location + description) exactly like the reference
    (common.py:417-419: a changed url OR description forces re-download).
    Returns None when no card exists for the name.
    """
    card = model_card(name)
    if card is None:
        return None
    filename = card.location.rsplit("/", 1)[-1]
    key = hashlib.md5(
        (card.location + card.description).encode("utf-8")).hexdigest()
    return maybe_download_from_cloud(
        card.location, filename, subfolder=key, cache_dir=cache_dir,
        refresh_cache=refresh_cache, fetcher=fetcher)
