"""YAML option system for the SRFlow stack.

Reference: options/options.py (parse 26-98, NoneDict 114-129, dict2str
101-111) and utils/util.py:165-173 (`opt_get`). Missing keys resolve to None
so deeply-nested flow options can be probed without try/except, and derived
experiment paths / scale propagation match the reference's behavior.
"""
from __future__ import annotations

import os
from typing import Any, Mapping, Optional, Sequence


class NoneDict(dict):
    """dict whose missing keys read as None (options.py:114-118)."""

    def __missing__(self, key):
        return None


def dict_to_nonedict(opt):
    if isinstance(opt, dict):
        return NoneDict({k: dict_to_nonedict(v) for k, v in opt.items()})
    if isinstance(opt, (list, tuple)):
        return [dict_to_nonedict(v) for v in opt]
    return opt


def opt_get(opt: Optional[Mapping], keys: Sequence[str], default: Any = None):
    """Nested getter: opt_get(opt, ['network_G','flow','K'], 16)."""
    if opt is None:
        return default
    cur = opt
    for k in keys:
        if cur is None or not isinstance(cur, Mapping) or k not in cur:
            return default
        cur = cur[k]
    return default if cur is None else cur


def dict2str(opt: Mapping, indent: int = 1) -> str:
    msg = ""
    for k, v in opt.items():
        if isinstance(v, Mapping):
            msg += " " * (indent * 2) + str(k) + ":[\n"
            msg += dict2str(v, indent + 1)
            msg += " " * (indent * 2) + "]\n"
        else:
            msg += " " * (indent * 2) + f"{k}: {v}\n"
    return msg


def parse_options(path: str, is_train: bool = True) -> NoneDict:
    """Load a YAML experiment config and derive paths/scale like the reference."""
    import yaml

    with open(path) as f:
        opt = yaml.safe_load(f)

    opt["is_train"] = is_train
    scale = opt.get("scale", 4)

    for phase, dataset in (opt.get("datasets") or {}).items():
        dataset["phase"] = phase.split("_")[0]
        dataset["scale"] = scale

    if "network_G" in opt and opt["network_G"] is not None:
        opt["network_G"]["scale"] = scale

    root = opt.get("path", {}).get("root", ".")
    name = opt.get("name", "experiment")
    experiments_root = os.path.join(root, "experiments", name)
    path_opt = opt.setdefault("path", {})
    if is_train:
        path_opt.setdefault("experiments_root", experiments_root)
        path_opt.setdefault("models", os.path.join(experiments_root, "models"))
        path_opt.setdefault("training_state", os.path.join(experiments_root, "training_state"))
        path_opt.setdefault("log", experiments_root)
        path_opt.setdefault("val_images", os.path.join(experiments_root, "val_images"))
        train_opt = opt.get("train") or {}
        # relative LR milestones (options.py:86-96)
        niter = train_opt.get("niter")
        if train_opt.get("lr_steps_rel") and niter:
            train_opt["lr_steps"] = [int(niter * r) for r in train_opt["lr_steps_rel"]]
        if train_opt.get("T_period_rel") and niter:
            train_opt["T_period"] = [int(niter * r) for r in train_opt["T_period_rel"]]
        if train_opt.get("restarts_rel") and niter:
            train_opt["restarts"] = [int(niter * r) for r in train_opt["restarts_rel"]]
    else:
        results_root = os.path.join(root, "results", name)
        path_opt.setdefault("results_root", results_root)
        path_opt.setdefault("log", results_root)

    return dict_to_nonedict(opt)
