"""print_stats (reference train_helper.py:67)."""

import logging
import os
import platform


def print_stats():
    logging.info("host=%s python=%s cpus=%s", platform.node(),
                 platform.python_version(), os.cpu_count())
