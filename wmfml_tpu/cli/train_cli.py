"""Meta-training CLI (reference train.py).

Usage: ``python train.py --config cfg/train/CNP_ShapeNet1D.yaml [k=v ...]``

Dispatch mirrors train.py:93-123: MMAML* methods -> MMAMLTrainer, MAML*
methods -> MAMLTrainer, everything else -> ModelTrainer. Exits 1 on a
non-finite loss (train abort parity, trainer/model_trainer.py:90-92).
"""

from __future__ import annotations

import sys

from wmfml_tpu.cli.common import apply_prng_impl, parse_args, seed_everything
from wmfml_tpu.configs import Config
from wmfml_tpu.data.factory import build_data
from wmfml_tpu.models.registry import build_model
from wmfml_tpu.obs import NonFiniteLossError


def train(config: Config):
    seed_everything(config.seed)
    apply_prng_impl(config)
    data = build_data(config, mode="train")
    model = build_model(config)

    if config.method.startswith("MMAML"):
        from wmfml_tpu.train.mmaml import MMAMLTrainer

        trainer = MMAMLTrainer(model, config, data)
    elif config.method.startswith("MAML") or "MAML" in config.method:
        from wmfml_tpu.train.maml import MAMLTrainer

        trainer = MAMLTrainer(model, config, data)
    else:
        from wmfml_tpu.train.trainer import ModelTrainer

        trainer = ModelTrainer(model, config, data)

    trainer.train()
    return trainer


def main(argv=None):
    args = parse_args("meta-training")
    config = Config(args.config, overrides=args.overrides)
    try:
        train(config)
    except NonFiniteLossError as e:
        config.logger.error(str(e))
        sys.exit(1)


if __name__ == "__main__":
    main()
