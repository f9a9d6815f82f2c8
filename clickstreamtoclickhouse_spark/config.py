"""YAML configuration -> AppConf (reference parity:
seghouse/config/configuration.py:22-45, README.rst:40-58).

Reference YAML shape:

    apps:
      - write_key: wk-123
        name: myApp
    warehouses:
      - type: clickhouse          # ours adds: parquet
        host: ...                 # ours: jdbc_url for clickhouse,
        ...                       #       root for parquet
    skip_fields: [f1, f2]
    extra_timestamps:
      - name: ist_timestamp
        timezone: Asia/Kolkata
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class App:
    """(write_key, name) pair (configuration.py:8-12); deduped via
    set semantics like the reference (:33-38)."""

    write_key: str
    name: str


@dataclass
class WarehouseConf:
    kind: str
    options: dict = field(default_factory=dict)


@dataclass
class AppConf:
    """Mirror of the reference AppConf (configuration.py:22-29)."""

    apps: frozenset[App] = frozenset()
    warehouses: tuple[WarehouseConf, ...] = ()
    skip_fields: tuple[str, ...] = ()
    extra_timestamps: dict[str, str] = field(default_factory=dict)


def from_dict(raw: dict) -> AppConf:
    apps = frozenset(
        App(write_key=a["write_key"], name=a["name"]) for a in raw.get("apps", [])
    )
    warehouses = tuple(
        WarehouseConf(
            kind=w.get("type", "parquet"),
            options={k: v for k, v in w.items() if k != "type"},
        )
        for w in raw.get("warehouses", [])
    )
    skip_fields = tuple(raw.get("skip_fields", []) or [])
    extra = {
        e["name"]: e["timezone"] for e in raw.get("extra_timestamps", []) or []
    }
    return AppConf(
        apps=apps, warehouses=warehouses, skip_fields=skip_fields, extra_timestamps=extra
    )


def from_yaml(path: str) -> AppConf:
    """configuration.from_yaml parity (configuration.py:32-45)."""
    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    return from_dict(raw)
