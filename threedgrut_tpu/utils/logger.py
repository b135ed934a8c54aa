"""Rich console logger (threedgrut/utils/logger.py:49 equivalent)."""

from __future__ import annotations

import logging
from contextlib import contextmanager

try:
    from rich.console import Console
    from rich.logging import RichHandler
    from rich.progress import (BarColumn, Progress, TaskProgressColumn,
                               TextColumn, TimeRemainingColumn)
    from rich.table import Table
    _HAVE_RICH = True
except ImportError:  # pragma: no cover
    _HAVE_RICH = False


class TrainLogger:
    """Console logging + progress bars + final stats tables."""

    def __init__(self, name: str = "threedgrut_tpu", level=logging.INFO):
        self._logger = logging.getLogger(name)
        if not self._logger.handlers:
            if _HAVE_RICH:
                handler = RichHandler(rich_tracebacks=True, show_path=False)
            else:
                handler = logging.StreamHandler()
            self._logger.addHandler(handler)
        self._logger.setLevel(level)
        self.console = Console() if _HAVE_RICH else None

    def info(self, msg, *a):
        self._logger.info(msg, *a)

    def warning(self, msg, *a):
        self._logger.warning(msg, *a)

    def error(self, msg, *a):
        self._logger.error(msg, *a)

    @contextmanager
    def progress(self, description: str, total: int):
        """Progress bar with an it/s column (logger.py:49-162)."""
        if not _HAVE_RICH:
            yield lambda n=1: None
            return
        with Progress(TextColumn("[progress.description]{task.description}"),
                      BarColumn(), TaskProgressColumn(),
                      TextColumn("{task.speed:>6.1f} it/s"
                                 if True else ""),
                      TimeRemainingColumn()) as progress:
            task = progress.add_task(description, total=total)
            yield lambda n=1: progress.advance(task, n)

    def table(self, title: str, rows: dict):
        if not _HAVE_RICH:
            for k, v in rows.items():
                self.info(f"{title} | {k}: {v}")
            return
        t = Table(title=title)
        t.add_column("metric")
        t.add_column("value")
        for k, v in rows.items():
            t.add_row(str(k), f"{v:.4f}" if isinstance(v, float) else str(v))
        self.console.print(t)

    def rule(self, title: str = ""):
        if self.console:
            self.console.rule(title)


logger = TrainLogger()
