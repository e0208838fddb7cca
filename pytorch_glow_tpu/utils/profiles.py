"""JSON profile loading (reference: upstream:misc/util.py `load_profile`
reading `profile/*.json`; SURVEY.md §2.1 #3, #6).

A profile JSON maps section-by-section onto the Profile dataclasses:

    {"name": "...", "glow": {...}, "optim": {...}, "train": {...},
     "data": {...}, "mesh": {...}, "out_dir": "..."}

Unknown keys raise (typo safety); a profile may also just name a preset:
    {"preset": "cifar10", "train": {"batch_size": 128}}  — preset + overrides.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any

from pytorch_glow_tpu.config import (
    DataConfig,
    GlowConfig,
    MeshConfig,
    OptimConfig,
    PRESETS,
    Profile,
    TrainConfig,
)

_SECTIONS = {
    "glow": GlowConfig,
    "optim": OptimConfig,
    "train": TrainConfig,
    "data": DataConfig,
    "mesh": MeshConfig,
}


def _build_section(cls, base, overrides: dict[str, Any]):
    fields = {f.name: f for f in dataclasses.fields(cls)}
    unknown = set(overrides) - set(fields)
    if unknown:
        raise KeyError(f"{cls.__name__}: unknown keys {sorted(unknown)}")
    coerced = {}
    for k, v in overrides.items():
        if isinstance(v, list):
            v = tuple(v)
        coerced[k] = v
    return dataclasses.replace(base, **coerced)


def profile_from_dict(d: dict[str, Any]) -> Profile:
    d = dict(d)
    preset = d.pop("preset", None)
    base = PRESETS[preset] if preset else Profile()
    kwargs: dict[str, Any] = {}
    for key, cls in _SECTIONS.items():
        if key in d:
            kwargs[key] = _build_section(cls, getattr(base, key), d.pop(key))
    for scalar in ("name", "out_dir"):
        if scalar in d:
            kwargs[scalar] = d.pop(scalar)
    if d:
        raise KeyError(f"profile: unknown sections {sorted(d)}")
    return base.replace(**kwargs)


def load_profile(path: str) -> Profile:
    with open(path) as f:
        return profile_from_dict(json.load(f))


def profile_to_dict(p: Profile) -> dict[str, Any]:
    return dataclasses.asdict(p)


def save_profile(path: str, p: Profile) -> None:
    with open(path, "w") as f:
        json.dump(profile_to_dict(p), f, indent=2, default=list)
