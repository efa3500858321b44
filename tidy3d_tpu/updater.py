"""Schema version migration of serialized simulations.

Behavioral model: /root/reference/tidy3d/updater.py (Updater:86 with a
registry of ``updates_from_version`` dict-to-dict upgraders). This framework
writes schema version 2.7.6-compatible files; the updater passes through
current-version dicts and hosts migration hooks for older ones.
"""

from __future__ import annotations

import functools
import json
from typing import Callable, Dict

import pydantic

from .components.base import Tidy3dBaseModel
from .exceptions import FileError, SetupError
from .log import log
from .version import SCHEMA_VERSION

UPDATE_MAP: Dict[str, Callable] = {}


def updates_from_version(version_from_string: str):
    """Register an update function mapping one schema version to the next."""

    def decorator(update_fn):
        UPDATE_MAP[version_from_string] = update_fn

        @functools.wraps(update_fn)
        def wrapper(sim_dict):
            return update_fn(sim_dict)

        return wrapper

    return decorator


class Version(Tidy3dBaseModel):
    """Parsed semantic version."""

    major: int
    minor: int

    @classmethod
    def from_string(cls, string: str = None) -> "Version":
        if string is None:
            return cls.from_string(SCHEMA_VERSION)
        try:
            major, minor, *_ = string.split(".")
            return cls(major=int(major), minor=int(minor))
        except Exception as exc:
            raise SetupError(f"version string '{string}' can't be parsed") from exc

    @property
    def as_tuple(self):
        return (self.major, self.minor)

    def __eq__(self, other):
        return self.as_tuple == other.as_tuple

    def __lt__(self, other):
        return self.as_tuple < other.as_tuple

    def __hash__(self):
        return hash(self.as_tuple)


class Updater(Tidy3dBaseModel):
    """Updates a serialized simulation dict to the current schema version."""

    sim_dict: dict = pydantic.Field(..., title="Simulation dict")

    @classmethod
    def from_file(cls, fname: str) -> "Updater":
        with open(fname, encoding="utf-8") as f:
            if fname.endswith((".yaml", ".yml")):
                import yaml

                sim_dict = yaml.safe_load(f)
            else:
                sim_dict = json.load(f)
        return cls(sim_dict=sim_dict)

    @classmethod
    def from_string(cls, sim_dict_str: str) -> "Updater":
        return cls(sim_dict=json.loads(sim_dict_str))

    @property
    def version(self) -> Version:
        version_string = self.sim_dict.get("version")
        if version_string is None:
            log.warning("Could not find a version in the supplied dict.")
            return Version.from_string(SCHEMA_VERSION)
        return Version.from_string(version_string)

    def update_to_current(self) -> dict:
        """Apply registered migrations until the current schema version."""
        sim_dict = dict(self.sim_dict)
        current = Version.from_string(SCHEMA_VERSION)
        if self.version == current:
            sim_dict["version"] = SCHEMA_VERSION
            return sim_dict
        version = self.version
        seen = set()
        while version < current:
            key = f"{version.major}.{version.minor}"
            if key in seen:
                break
            seen.add(key)
            update_fn = UPDATE_MAP.get(key)
            if update_fn is None:
                break
            sim_dict = update_fn(sim_dict)
            version = Version.from_string(sim_dict.get("version", SCHEMA_VERSION))
        sim_dict["version"] = SCHEMA_VERSION
        return sim_dict


@updates_from_version("2.6")
def _update_2_6(sim_dict: dict) -> dict:
    """2.6 -> 2.7: no structural changes required by this framework."""
    sim_dict = dict(sim_dict)
    sim_dict["version"] = "2.7.6"
    return sim_dict
