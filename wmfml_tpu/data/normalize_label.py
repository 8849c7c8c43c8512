"""Offline label-statistics helper (reference dataset/normalize_label.py:24-68).

Computes per-dimension label mean/std for a dataset stored as the reference's
(x, y) pickle tuple layout, and writes them next to the data for optional
input normalization. Kept for parity with the reference's (main-path-unused)
"bars" helper; works for any of the pickle-tuple datasets here.
"""

from __future__ import annotations

import os
import pickle

import numpy as np


def compute_label_stats(pkl_path: str):
    with open(pkl_path, "rb") as f:
        _, y = pickle.load(f)
    y = np.asarray(y, np.float64).reshape(-1, np.asarray(y).shape[-1])
    return y.mean(axis=0), y.std(axis=0)


def normalize_labels(pkl_path: str, out_path: str = None):
    """Write (mean, std) stats beside the dataset; return them."""
    mean, std = compute_label_stats(pkl_path)
    out_path = out_path or os.path.join(
        os.path.dirname(pkl_path), "label_stats.npz")
    np.savez(out_path, mean=mean, std=std)
    return mean, std
