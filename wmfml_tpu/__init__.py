"""wmfml_tpu — a TPU-native meta-learning framework for vision regression.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
"What Matters For Meta-Learning Vision Regression Tasks?" (CVPR 2022,
boschresearch/what-matters-for-meta-learning): episodic few-shot regression on
ShapeNet1D / ShapeNet3D / Distractor / Pascal1D with CNP / ANP / MAML / MMAML
model families, data/task augmentation and meta-regularization.

Design pillars (TPU-first, not a port):
  * every training step is a single jitted SPMD program over a ``jax.sharding.Mesh``;
  * episodes are fixed-shape pytrees (padded context + boolean mask) so steps
    compile exactly once;
  * per-task inner loops (MAML) are ``jax.vmap`` x ``jax.lax.scan``, never Python;
  * image augmentation runs on device as fused XLA/Pallas kernels, not on host;
  * host side: a native C++ episode-assembly core feeds a double-buffered
    device prefetcher.
"""

__version__ = "0.1.0"


def build_model(config):
    from wmfml_tpu.models.registry import build_model as _b

    return _b(config)


def build_data(config, mode: str = "train"):
    from wmfml_tpu.data.factory import build_data as _b

    return _b(config, mode=mode)


def load_config(path: str, overrides=None, make_dirs: bool = False):
    from wmfml_tpu.configs import Config

    return Config(path, overrides=overrides, make_dirs=make_dirs)
