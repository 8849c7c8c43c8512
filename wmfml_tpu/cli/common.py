"""Shared CLI plumbing (argparse, seeding, model/state loading)."""

from __future__ import annotations

import argparse
import random

import numpy as np


def parse_args(description: str):
    """--config <yaml> plus optional dotted key=value overrides."""
    parser = argparse.ArgumentParser(description=description)
    parser.add_argument("--config", type=str, required=True,
                        help="path of config file")
    parser.add_argument("overrides", nargs="*",
                        help="optional key=value config overrides")
    return parser.parse_args()


def seed_everything(seed: int):
    """Seed host RNGs (reference train.py:35-39). Device RNG is the explicit
    jax PRNG key threaded through every step."""
    random.seed(seed)
    np.random.seed(seed)
