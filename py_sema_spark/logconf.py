"""Logging-config loader — parity with the reference's
``sema/commons/log`` (`/root/reference/sema/commons/log/loader.py:1-37`
and the ``--logconf`` CLI argument in ``commons/cli/clitools.py:23-40``).

Driver-side only: executor JVMs/Python workers keep Spark's log4j
configuration; this configures the *orchestration* loggers (harvest,
pipeline, tasks) exactly like the reference does for its services.
"""

from __future__ import annotations

from logging.config import dictConfig, fileConfig
from pathlib import Path
from typing import Optional, Union

#: packaged default, used when no explicit config is given (mirrors
#: the reference's debug_logconf.yml fallback)
DEFAULT_LOGCONF = Path(__file__).parent / "debug_logconf.yml"


def load_log_config(
    logconf: Optional[Union[str, Path]] = None,
) -> Optional[Path]:
    """Apply a logging configuration file.

    ``*.yml``/``*.yaml`` files go through ``dictConfig``; anything
    else through stdlib ``fileConfig`` (INI). ``None`` falls back to
    the packaged default when present, else is a no-op. Returns the
    path applied (or ``None``).
    """
    if logconf is None:
        if not DEFAULT_LOGCONF.exists():
            return None
        logconf = DEFAULT_LOGCONF
    path = Path(logconf)
    if not path.exists():
        raise FileNotFoundError(f"Log configuration file not found: {path}")
    if path.suffix in (".yml", ".yaml"):
        import yaml

        with open(path) as fh:
            dictConfig(yaml.safe_load(fh))
    else:
        fileConfig(str(path))
    return path


def add_logconf_argument(parser) -> None:
    """Attach the reference CLI's ``-l/--logconf`` option to an
    ``argparse`` parser (clitools.py:23-30)."""
    parser.add_argument(
        "-l",
        "--logconf",
        type=str,
        default=None,
        help="location of the logging config (yml or ini) to use",
    )
