#!/usr/bin/env python
"""Launcher (reference ``run.py`` / ``magmap/io/load_env.py``): starts the
CLI with uncaught-exception logging."""

import logging
import sys


def main():
    logging.basicConfig(
        level=logging.INFO, format="%(levelname)s:%(name)s: %(message)s")

    def log_uncaught(exc_type, exc, tb):
        logging.getLogger("magellanmapper_tpu").critical(
            "uncaught exception", exc_info=(exc_type, exc, tb))
        sys.__excepthook__(exc_type, exc, tb)

    sys.excepthook = log_uncaught
    from magellanmapper_tpu.io import cli
    return cli.main()


if __name__ == "__main__":
    main()
