"""Typed config system.

The reference monorepo mixes five configuration styles (argparse mega-parsers,
YAML dicts, OmegaConf, yacs CfgNode, python-module configs — see SURVEY.md §5).
This framework uses a single style: frozen dataclasses with strict
dict round-tripping, so every model / engine / pipeline config is typed,
hashable (usable as a jit static argument), and serializable.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict, Type, TypeVar

T = TypeVar("T", bound="ConfigBase")


@dataclasses.dataclass(frozen=True)
class ConfigBase:
    """Base class for all configs. Subclass with @dataclasses.dataclass(frozen=True)."""

    @classmethod
    def from_dict(cls: Type[T], d: Dict[str, Any], strict: bool = True) -> T:
        field_map = {f.name: f for f in dataclasses.fields(cls)}
        unknown = set(d) - set(field_map)
        if strict and unknown:
            raise ValueError(
                f"{cls.__name__}: unknown config keys {sorted(unknown)}; "
                f"valid keys are {sorted(field_map)}"
            )
        kwargs = {}
        for name, field in field_map.items():
            if name not in d:
                continue
            value = d[name]
            ftype = field.type
            # Nested config support
            if isinstance(ftype, type) and issubclass(ftype, ConfigBase) and isinstance(value, dict):
                value = ftype.from_dict(value, strict=strict)
            kwargs[name] = value
        return cls(**kwargs)

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2, sort_keys=True, default=str)

    def replace(self: T, **kwargs: Any) -> T:
        return dataclasses.replace(self, **kwargs)


def load_config(cls: Type[T], path: str, strict: bool = True) -> T:
    """Load a config from a JSON or YAML file."""
    with open(path) as f:
        text = f.read()
    if path.endswith((".yml", ".yaml")):
        import yaml

        d = yaml.safe_load(text)
    else:
        d = json.loads(text)
    return cls.from_dict(d, strict=strict)
