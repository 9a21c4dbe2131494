"""Typed engine configuration (reference O5: typed INI parser,
``config/config_editor.py:91-744`` + ``integrator_config.py:45-183``).

Keeps the reference's data-semantics-bearing keys (``config/config.ini``):
rate limit (REQUESTS_PER_HOUR / REQUESTS_PER_SEC with the negative ⇒
derived rule), raw-data archive toggle + dir, include-canceled flag, and
the store/checkpoint locations.  UI-only keys (icons, toast
notifications, Tkinter editor) are out of engine scope (SURVEY.md §0).

Supports the reference's INI dialect: ``;`` comments, ``KEY=VALUE``
pairs, ``{BASE_DIR}`` substitution (``integrator_config.py``), booleans
as 0/1.
"""

from __future__ import annotations

import configparser
from dataclasses import dataclass, field, fields
from pathlib import Path


@dataclass
class EngineConfig:
    base_dir: str = "."
    #: API budget; interval derived when requests_per_sec < 0
    #: (reference integrator_config.py:94-97)
    requests_per_hour: int = 5000
    requests_per_sec: float = 0.72
    #: bronze raw-page archive (reference SAVE_RAW_DATA / RAW_DATA_DIR)
    save_raw_data: bool = True
    raw_data_dir: str = "{BASE_DIR}/raw_data"
    #: outline fetch includes canceled requests (INCLUDE_CANCELED_FORMS)
    include_canceled: bool = True
    #: table store root (reference DB_PATH — a directory of tables here)
    store_dir: str = "{BASE_DIR}/tables"
    #: checkpoint state dir (reference app_status.json + temp files)
    checkpoint_dir: str = "{BASE_DIR}/checkpoint"
    #: network retry backoff seconds (reference app.py:17-36)
    retry_backoff: list[float] = field(default_factory=lambda: [60.0, 300.0, 900.0])

    def __post_init__(self) -> None:
        for f in fields(self):
            v = getattr(self, f.name)
            if isinstance(v, str):
                setattr(self, f.name, v.replace("{BASE_DIR}", str(self.base_dir)))
        if self.requests_per_sec < 0:
            self.requests_per_sec = (
                3600.0 / self.requests_per_hour if self.requests_per_hour > 0 else 0.0
            )

    @classmethod
    def from_ini(cls, path: str | Path, base_dir: str | None = None) -> "EngineConfig":
        """Load from the reference's INI dialect (unknown keys ignored,
        missing keys defaulted — the reference's warn-and-default rule)."""
        text = Path(path).read_text(encoding="utf-8")
        parser = configparser.ConfigParser(
            inline_comment_prefixes=(";",), strict=False, interpolation=None
        )
        # the reference INI may be sectionless — wrap in a default section
        if not text.lstrip().startswith("["):
            text = "[engine]\n" + text
        parser.read_string(text)
        flat: dict[str, str] = {}
        for section in parser.sections():
            flat.update(parser.items(section))

        def get(key: str, cast, default):
            raw = flat.get(key.lower(), "")
            if raw == "":
                return default
            if cast is bool:
                return raw not in ("0", "false", "")
            try:
                return cast(raw)
            except ValueError:
                return default

        d = cls()
        backoff = get("retry_backoff", str, None)
        return cls(
            base_dir=base_dir or d.base_dir,
            requests_per_hour=get("requests_per_hour", int, d.requests_per_hour),
            requests_per_sec=get("requests_per_sec", float, d.requests_per_sec),
            save_raw_data=get("save_raw_data", bool, d.save_raw_data),
            raw_data_dir=get("raw_data_dir", str, d.raw_data_dir),
            include_canceled=get("include_canceled_forms", bool, d.include_canceled),
            store_dir=get("store_dir", str, d.store_dir),
            checkpoint_dir=get("checkpoint_dir", str, d.checkpoint_dir),
            retry_backoff=[float(x) for x in backoff.split(",")]
            if backoff
            else list(d.retry_backoff),
        )

    @property
    def min_interval(self) -> float:
        return self.requests_per_sec
