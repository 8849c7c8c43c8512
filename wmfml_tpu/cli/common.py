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


def apply_prng_impl(config):
    """Apply config.prng_impl ("rbg" = faster counter-based key derivation
    for the on-device aug/dropout streams; default "threefry" keeps
    bit-reproducibility with earlier runs). Must run before any PRNGKey."""
    impl = getattr(config, "prng_impl", "threefry")
    if impl and impl != "threefry":
        import jax

        jax.config.update("jax_default_prng_impl", impl)
