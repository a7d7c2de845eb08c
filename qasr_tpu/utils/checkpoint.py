"""Checkpoint save/restore.

Two formats (mirroring the reference's dual .nemo / .ckpt story,
SURVEY.md §5 "Checkpoint / resume"):
  * native ".qasr": a tar.gz{model_config.yaml, arrays.npz} — pure
    numpy/yaml, no torch needed (the analogue of .nemo's
    tar{yaml, state_dict}, modelPT.py:254-296);
  * training checkpoints: arrays.npz holding params + qstate + optimizer
    state + step for crash-resume (exp_manager.check_resume analogue,
    exp_manager.py:270-346).
Pytrees are flattened to '/'-joined string keys.
"""
from __future__ import annotations

import os
import tarfile
import tempfile
from typing import Any, Dict, Optional, Tuple

import numpy as np


def flatten_tree(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_tree(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(flatten_tree(v, f"{prefix}{i}/"))
    elif tree is None:
        pass
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def unflatten_into(template: Any, flat: Dict[str, np.ndarray], prefix: str = "") -> Any:
    """Rebuild arrays into the shape of `template` (same structure)."""
    if isinstance(template, dict):
        return {k: unflatten_into(v, flat, f"{prefix}{k}/") for k, v in template.items()}
    if isinstance(template, (list, tuple)):
        t = [unflatten_into(v, flat, f"{prefix}{i}/") for i, v in enumerate(template)]
        return type(template)(t) if isinstance(template, tuple) else t
    if template is None:
        return None
    return flat[prefix[:-1]]


def _npz_path(path: str) -> str:
    """np.savez appends '.npz' when missing; normalize so save/load agree."""
    return path if path.endswith(".npz") else path + ".npz"


def save_arrays(path: str, tree: Any) -> None:
    np.savez(_npz_path(path), **flatten_tree(tree))


def load_arrays(path: str, template: Any) -> Any:
    with np.load(_npz_path(path), allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files}
    return unflatten_into(template, flat)


# ---------------------------------------------------------------------------
# native .qasr model archive
# ---------------------------------------------------------------------------


def save_qasr(path: str, cfg_dict: Dict[str, Any], params: Any,
              qstate: Optional[Any] = None,
              meta: Optional[Dict[str, Any]] = None,
              artifacts: Optional[Dict[str, str]] = None) -> None:
    """`meta` (e.g. {'folded': True, 'qcfg': {...}}) is stored under the
    reserved '_qasr_meta' config key so restore can rebuild the exact model
    state (a BN-folded model's param tree has no bn leaves — the restore
    template must be folded too).

    `artifacts` maps archive names to source files (tokenizer models, vocab
    files); they are packed under artifacts/ and re-extracted on restore —
    the reference's artifact registry (modelPT.py:254-296)."""
    import yaml

    cfg_dict = dict(cfg_dict)
    if meta:
        cfg_dict["_qasr_meta"] = meta
    with tempfile.TemporaryDirectory() as td:
        with open(os.path.join(td, "model_config.yaml"), "w") as f:
            yaml.safe_dump(cfg_dict, f)
        tree = {"params": params}
        if qstate is not None:
            tree["qstate"] = qstate
        np.savez(os.path.join(td, "arrays.npz"), **flatten_tree(tree))
        with tarfile.open(path, "w:gz") as tar:
            tar.add(os.path.join(td, "model_config.yaml"), arcname="model_config.yaml")
            tar.add(os.path.join(td, "arrays.npz"), arcname="arrays.npz")
            for arcname, src in (artifacts or {}).items():
                tar.add(src, arcname=f"artifacts/{arcname}")


def persist_artifacts(src_dir: str, names) -> Dict[str, str]:
    """Copy archive artifact files into a directory that outlives the unpack
    tempdir (restored models keep file handles to e.g. tokenizer models).
    The persistent dir is removed at interpreter exit — repeated restores in
    a long-lived process no longer accumulate orphaned tmp dirs."""
    import atexit
    import shutil

    names = list(names)
    if not names:
        return {}
    keep = tempfile.mkdtemp(prefix="qasr_artifacts_")
    atexit.register(shutil.rmtree, keep, ignore_errors=True)
    out = {}
    for name in names:
        dst = os.path.join(keep, name)
        shutil.copy2(os.path.join(src_dir, name), dst)
        out[name] = dst
    return out


def extract_artifacts(td: str) -> Dict[str, str]:
    """Collect artifacts/ files from an unpacked .qasr archive."""
    src = os.path.join(td, "artifacts")
    if not os.path.isdir(src):
        return {}
    return persist_artifacts(src, os.listdir(src))


def load_qasr(path: str) -> Tuple[Dict[str, Any], Dict[str, np.ndarray],
                                  Dict[str, str]]:
    """Returns (config dict, flat arrays dict with 'params/...' keys,
    artifacts dict {name: extracted path})."""
    import yaml

    with tempfile.TemporaryDirectory() as td:
        with tarfile.open(path, "r:*") as tar:
            tar.extractall(td, filter="data")
        with open(os.path.join(td, "model_config.yaml")) as f:
            cfg = yaml.safe_load(f)
        with np.load(os.path.join(td, "arrays.npz"), allow_pickle=False) as z:
            flat = {k: z[k] for k in z.files}
        artifacts = extract_artifacts(td)
    return cfg, flat, artifacts


# ---------------------------------------------------------------------------
# training checkpoints
# ---------------------------------------------------------------------------


def save_training_ckpt(path: str, params: Any, opt_state: Any, step: int,
                       qstate: Optional[Any] = None) -> None:
    tree = {"params": params, "opt": _optstate_to_tree(opt_state), "step": step}
    if qstate is not None:
        tree["qstate"] = qstate
    save_arrays(path, tree)


def load_training_ckpt(path: str, params_tpl: Any, opt_state_tpl: Any,
                       qstate_tpl: Optional[Any] = None):
    with np.load(_npz_path(path), allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files}
    params = unflatten_into(params_tpl, flat, "params/")
    opt = _tree_into_optstate(opt_state_tpl, flat, "opt/")
    step = int(flat["step"])
    qstate = unflatten_into(qstate_tpl, flat, "qstate/") if qstate_tpl is not None else None
    return params, opt, step, qstate


def _optstate_to_tree(opt_state: Any) -> Any:
    import jax

    return jax.tree_util.tree_leaves(opt_state)


def _tree_into_optstate(tpl: Any, flat: Dict[str, np.ndarray], prefix: str) -> Any:
    import jax

    leaves = [flat[f"{prefix}{i}"] for i in range(len(jax.tree_util.tree_leaves(tpl)))]
    treedef = jax.tree_util.tree_structure(tpl)
    return jax.tree_util.tree_unflatten(treedef, leaves)
