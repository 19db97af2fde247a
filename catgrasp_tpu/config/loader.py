"""YAML config loading — plain dicts, same spirit as the reference
(``run_grasp_simulation.py:690-698``)."""
from __future__ import annotations

import os

import yaml

CONFIG_DIR = os.path.dirname(os.path.realpath(__file__))


def load_config(name: str = "config.yml") -> dict:
    path = name if os.path.isabs(name) else os.path.join(CONFIG_DIR, name)
    with open(path) as f:
        return yaml.safe_load(f)
