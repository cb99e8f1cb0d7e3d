"""Startup machine/banner stats (reference ``utils.machine_stats.print_stats``
call site: experiments/train_helper.py:67)."""

from __future__ import annotations

import logging
import os
import platform


def print_stats():
    import jax

    logging.info("host: %s (%s)", platform.node(), platform.platform())
    logging.info("python: %s", platform.python_version())
    logging.info("jax: %s backend=%s", jax.__version__, jax.default_backend())
    logging.info("devices: %s", jax.devices())
    logging.info("cpu count: %s", os.cpu_count())
