"""Command-line interfaces: train, eval, tools; config parsing; builders."""

from .config import ExperimentConfig, parse_ini
