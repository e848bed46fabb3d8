"""Config engine + logging setup (reference O7/O8 parity).

Reference semantics reproduced (cited for the parity check):

* ``Config`` — /root/reference/config/config.py:44-223: YAML file
  (path from arg, else $SPOTIFY_CONFIG_PATH, else a package-local
  config.yaml), then ``.env``, then environment-variable overrides
  (env wins over file), then validation (warn on missing credentials,
  default ``output.format``/``paths.base``), dot-path ``get`` with
  default, and the typed accessor quartet.
* ``setup_logging`` — /root/reference/scripts/etl_pipeline.py:55-75:
  level/format/optional-file from config keys ``logging.level``,
  ``logging.format``, ``logging.file``; creates the log directory and
  attaches a file handler when a file is configured.

Differences from the reference are deliberate: no hard dependency on
python-dotenv (a 10-line parser covers the KEY=VALUE subset the
reference uses), and the environment mapping is injectable so override
precedence is unit-testable without mutating ``os.environ``.
"""

from __future__ import annotations

import logging
import os
from collections.abc import Mapping
from pathlib import Path
from typing import Any

logger = logging.getLogger(__name__)

DEFAULT_LOG_FORMAT = "%(asctime)s - %(name)s - %(levelname)s - %(message)s"

# env var -> nested config path; SPOTIFY_LIMIT additionally int-coerces
# (reference config.py:74-111).
_ENV_MAP = {
    "SPOTIFY_CLIENT_ID": ["spotify", "client_id"],
    "SPOTIFY_CLIENT_SECRET": ["spotify", "client_secret"],
    "SPOTIFY_OUTPUT_FORMAT": ["output", "format"],
    "SPOTIFY_DATA_PATH": ["paths", "base"],
    "SPOTIFY_COUNTRY": ["parameters", "country"],
    "SPOTIFY_LIMIT": ["parameters", "limit"],
}


def _load_dotenv(path: str | os.PathLike = ".env",
                 env: dict[str, str] | None = None) -> dict[str, str]:
    """Minimal .env loader: KEY=VALUE lines, '#' comments, optional
    surrounding quotes; existing keys are NOT overwritten (python-dotenv
    default, which the reference relies on at config.py:47)."""
    env = env if env is not None else {}
    p = Path(path)
    if not p.is_file():
        return env
    for line in p.read_text().splitlines():
        line = line.strip()
        if not line or line.startswith("#") or "=" not in line:
            continue
        k, _, v = line.partition("=")
        k, v = k.strip(), v.strip().strip("'\"")
        env.setdefault(k, v)
    return env


class Config:
    """Layered configuration: YAML file < .env < process environment.

    ``env`` defaults to ``os.environ``; pass a plain dict in tests to
    pin precedence without monkeypatching the process.
    """

    def __init__(self, config_path: str | None = None,
                 env: Mapping[str, str] | None = None,
                 dotenv_path: str | os.PathLike = ".env"):
        base_env = dict(os.environ) if env is None else dict(env)
        self.env = _load_dotenv(dotenv_path, base_env)
        self.config_path = config_path or self.env.get(
            "SPOTIFY_CONFIG_PATH",
            str(Path(__file__).parent / "config.yaml"))
        self.config_data: dict[str, Any] = {}
        self._load_from_file()
        self._load_from_env()
        self._validate()

    def _load_from_file(self) -> None:
        try:
            if os.path.exists(self.config_path):
                import yaml

                with open(self.config_path) as f:
                    self.config_data = yaml.safe_load(f) or {}
                logger.info("Loaded configuration from %s", self.config_path)
            else:
                logger.warning("Config file not found: %s", self.config_path)
                self.config_data = {}
        except Exception as e:  # malformed YAML -> empty config + error,
            logger.error("Error loading config file: %s", e)  # not a crash
            self.config_data = {}

    def _load_from_env(self) -> None:
        for var, path in _ENV_MAP.items():
            raw = self.env.get(var)
            if not raw:
                continue
            val: Any = raw
            if var == "SPOTIFY_LIMIT":
                try:
                    val = int(raw)
                except (TypeError, ValueError):
                    pass  # reference keeps the unparseable string
            self.set_nested_dict(self.config_data, path, val)

    def _validate(self) -> None:
        spotify = self.config_data.get("spotify", {})
        if not spotify.get("client_id"):
            logger.warning("Missing Spotify client_id in configuration")
        if not spotify.get("client_secret"):
            logger.warning("Missing Spotify client_secret in configuration")
        self.config_data.setdefault("output", {}).setdefault("format", "csv")
        self.config_data.setdefault("paths", {}).setdefault("base", "./data")

    @staticmethod
    def set_nested_dict(d: dict, keys: list[str], value: Any) -> None:
        for k in keys[:-1]:
            d = d.setdefault(k, {})
        d[keys[-1]] = value

    def get(self, key: str, default: Any = None) -> Any:
        """Dot-path lookup: get('spotify.client_id')."""
        value: Any = self.config_data
        for k in key.split("."):
            if isinstance(value, dict) and k in value:
                value = value[k]
            else:
                return default
        return value

    def get_spotify_credentials(self) -> dict[str, str]:
        return {"client_id": self.get("spotify.client_id", ""),
                "client_secret": self.get("spotify.client_secret", "")}

    def get_data_paths(self) -> dict[str, str]:
        base = self.get("paths.base", "./data")
        return {"base": base,
                "raw": self.get("paths.raw", os.path.join(base, "raw")),
                "processed": self.get("paths.processed",
                                      os.path.join(base, "processed")),
                "final": self.get("paths.final",
                                  os.path.join(base, "final"))}

    def get_output_config(self) -> dict[str, Any]:
        return {"format": self.get("output.format", "csv"),
                "prefix": self.get("output.prefix", "spotify")}

    def get_parameters(self) -> dict[str, Any]:
        return {"country": self.get("parameters.country"),
                "limit": self.get("parameters.limit", 50)}


def setup_logging(config: Config,
                  root: logging.Logger | None = None) -> logging.Logger:
    """Configure logging from ``logging.level`` / ``logging.format`` /
    ``logging.file`` (reference etl_pipeline.py:55-75). Returns the
    logger it configured (the root logger by default; injectable so
    tests don't mutate global state)."""
    root = root if root is not None else logging.getLogger()
    level = config.get("logging.level", "INFO")
    fmt = config.get("logging.format", DEFAULT_LOG_FORMAT)
    log_file = config.get("logging.file")

    numeric = getattr(logging, str(level).upper(), None)
    if isinstance(numeric, int):
        root.setLevel(numeric)

    if log_file:
        log_dir = os.path.dirname(log_file)
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
        handler = logging.FileHandler(log_file)
        handler.setFormatter(logging.Formatter(fmt))
        root.addHandler(handler)
    return root
