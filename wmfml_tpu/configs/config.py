"""YAML config system.

Schema-compatible with the reference config loader
(`/root/reference/configs/config.py:33-109`): same key names, same defaults,
same task -> (img_size, input_dim, output_dim) derivation, same run-directory
layout (``results/{mode}/{method}/{timestamp}_{task}_...``), same dumped
``config.yml`` + ``log.log``.

TPU-native additions (all optional keys, defaulted so reference YAMLs load
unchanged):
  * ``compute_dtype``: "float32" | "bfloat16" — dtype for conv/matmul compute.
  * ``mesh_shape``: {axis_name: size} for the device mesh (default: all
    devices on the "data" axis).
  * ``query_num``: static query-set size (needed because XLA wants static
    shapes; derived per task when absent).
  * ``prefetch``: host->device prefetch depth.
  * dotted CLI overrides: ``train.py --config x.yaml lr=1e-3 aug_list=[...]``.
"""

from __future__ import annotations

import json
import logging
import os
from time import strftime
from typing import Any, Dict, List, Optional

import yaml

# Task name -> ([H, W, C], input label dim, output dim).
# Mirrors /root/reference/configs/config.py:87-104. Note images are handled
# channel-LAST throughout this framework (TPU/NHWC native), so img_size is
# [H, W, C] exactly as the reference stores it.
TASK_SHAPES: Dict[str, tuple] = {
    "shapenet_3d": ([64, 64, 4], 4, 4),
    "shapenet_3d_segmentation": ([64, 64, 4], 4, 4),
    "pascal_1d": ([128, 128, 1], 1, 1),
    "shapenet_1d": ([128, 128, 1], 3, 2),  # label [cos a, sin a, a] -> [cos, sin]
    "distractor": ([128, 128, 1], 2, 2),
}

# Default query-set sizes per task (static shapes for XLA). The reference uses
# shot_max queries for shapenet_1d (dataset/shapenet_1d.py:141-148) and
# "remaining instances" for 3d/distractor; we pin those to fixed values.
DEFAULT_QUERY_NUM = {
    "shapenet_1d": None,  # = max_ctx_num at load time
    "shapenet_3d": 15,    # 30 views/object, up to 15 ctx -> 15 qry
    "distractor": 18,     # 36 views/object
    "pascal_1d": None,    # = max_ctx_num (fixed shot == query count)
}


def _parse_override(value: str) -> Any:
    """Parse a CLI override value: try JSON, then YAML, else raw string."""
    try:
        return json.loads(value)
    except (json.JSONDecodeError, ValueError):
        try:
            return yaml.safe_load(value)
        except yaml.YAMLError:
            return value


class Config:
    """Attribute-access config mirroring the reference's ``Config``.

    Parameters
    ----------
    config: path to a YAML file (reference cfg/ files load unchanged).
    overrides: list of ``key=value`` strings applied on top of the YAML.
    make_dirs: create the run directory, dump config.yml, attach file logger.
        Tests/library use pass False; CLIs pass True (reference behavior).
    """

    def __init__(self, config: Optional[str] = None,
                 overrides: Optional[List[str]] = None,
                 make_dirs: bool = True,
                 results_root: str = "results"):
        self.results_root = results_root
        if config:
            with open(config, "rb") as f:
                cfg = yaml.safe_load(f)
            if overrides:
                for item in overrides:
                    key, _, val = item.partition("=")
                    cfg[key.strip()] = _parse_override(val.strip())
            self.set_init_values(cfg, make_dirs=make_dirs)

    @classmethod
    def from_dict(cls, cfg: Dict[str, Any], make_dirs: bool = False,
                  results_root: str = "results") -> "Config":
        self = cls(results_root=results_root)
        self.set_init_values(dict(cfg), make_dirs=make_dirs)
        return self

    # -- schema ------------------------------------------------------------

    def set_init_values(self, cfg: Dict[str, Any], make_dirs: bool = True):
        get = cfg.get
        self.method = cfg["method"]
        self.mode = get("mode", "train")
        self.task = cfg["task"]
        self.aug_list = get("aug_list", [])  # ["MR", "data_aug", "task_aug"]
        self.checkpoint = get("checkpoint", "")
        self.agg_mode = get("agg_mode", None)
        self.img_agg = get("img_agg", None)
        self.loss_type = get("loss_type", "mse")
        self.tasks_per_batch = cfg["tasks_per_batch"]
        self.max_ctx_num = cfg["max_ctx_num"]

        self.gen_bg = get("gen_bg", True)
        self.output_mask = get("output_mask", False)

        self.contrastive = get("contrastive", False)
        self.contrastive_rate = get("contrastive_rate", 1)
        self.temperature = get("temperature", 0.07)

        self.data_size = get("data_size", None)  # shapenet_1d: small/middle/large

        self.dim_w = get("dim_w", None)
        self.n_hidden_units_r = get("n_hidden_units_r", None)
        self.dim_r = get("dim_r", None)
        self.dim_z = get("dim_z", None)

        # MAML family
        self.num_steps = get("num_updates", None)
        self.test_num_steps = get("test_num_updates", None)
        self.dim_hidden = get("num_filters", None)
        self.first_order = get("first_order", None)
        self.update_lr = get("update_lr", None)
        self.beta = get("beta", 0)
        # learnable / per-parameter inner step sizes
        # (reference trainer/maml_trainer.py:96-112; off in every shipped cfg)
        self.learn_step_size = get("learn_step_size", False)
        self.per_param_step_size = get("per_param_step_size", False)
        # inner-loop remat policy: "none" (default, fastest at these episode
        # sizes) | "step" (full per-inner-step remat) | "dots"
        self.maml_remat = get("maml_remat", "none")
        # inner lax.scan unroll factor (0 = fully unrolled)
        self.maml_unroll = get("maml_unroll", 0)

        self.tsne = get("tsne", False)

        self.noise_scale = get("noise_scale", 0.0)
        self.lr = cfg["lr"]
        self.weight_decay = get("weight_decay", False)
        self.optimizer = get("optimizer", "Adam")
        self.bg_gen_freq = get("bg_gen_freq", 1000)
        self.val_iters = get("val_iters", 10)
        self.val_freq = get("val_freq", 50)
        self.iterations = get("iterations", 50000)
        # "device" is kept for YAML compatibility but is advisory only: compute
        # placement is owned by the mesh (wmfml_tpu.parallel.mesh).
        self.device = get("device", "tpu")
        self.seed = cfg["seed"]
        self.timestamp = strftime("%Y-%m-%d_%H-%M-%S")

        # --- TPU-native extension keys ---
        self.compute_dtype = get("compute_dtype", "float32")
        self.mesh_shape = get("mesh_shape", None)  # e.g. {"data": 8}
        self.prefetch = get("prefetch", 2)
        self.data_path = get("data_path", None)  # override dataset root
        self.synthetic_data = get("synthetic_data", False)
        # exact imgaug semantics: per-call random op order (the reference's
        # iaa.Sequential(random_order=True)). False selects the fused
        # fixed-order geometry pipeline (one warp instead of two; perf cfgs)
        self.aug_random_order = get("aug_random_order", True)
        # MMAML task-encoder bidirectional-GRU aggregation (the reference
        # option at networks/conv_embedding_model.py:76-88; its shipped
        # config hard-codes it off, MMAMLShapeNet1D.py:72)
        self.rnn_aggregation = get("rnn_aggregation", False)
        # "rbg": faster counter-based PRNG for the on-device aug/dropout
        # mask streams (measured +~2% headline); default threefry keeps
        # bit-reproducibility with earlier runs. Applied by the CLIs.
        self.prng_impl = get("prng_impl", "threefry")
        # optax.flatten around the optimizer: one concatenated-vector Adam
        # update instead of per-leaf kernels; identical math, different
        # opt_state layout. Default OFF since round 4: xprof attribution
        # showed the flatten retiling reshape alone cost 17.4% of the ANP
        # headline step at 5 GB/s (RESULTS.md round-4 opt sweep)
        self.flatten_opt = get("flatten_opt", False)
        # max-pool lowering for the literature conv encoder: "window"
        # (reduce-window; backward = select-and-scatter) or "slice"
        # (strided slices + maximum; elementwise backward) — see
        # nn/encoders.py:max_pool2 and the round-4 opt sweep in RESULTS.md.
        # Honored by the CNP/ANP family, SingleTaskSmall and the BBB
        # encoder; the MAML/MMAML inner loop pins "slice" (measured 22%
        # faster in the second-order loop, models/maml.py).
        self.pool_impl = get("pool_impl", "window")
        # MAML-family override (separate default: 'window' is measured-wrong
        # inside the second-order inner loop)
        self.maml_pool_impl = get("maml_pool_impl", "slice")
        # conv1 input-gradient lowering in the literature encoder:
        # "phase" = one dense 2x2 conv over output grads + pixel-shuffle,
        # "xla" = the stock input-dilated convolution (nn/encoders.py)
        self.conv_bwd = get("conv_bwd", "xla")
        # literature-encoder stem lowering: "s2d" computes conv0+conv1 in
        # phase (space-to-depth) layout — identical math/params (golden +
        # second-order tested, tests/test_s2d_stem.py), no input-dilated
        # backward. Measured default-on: exact-aug headline 1.92->1.79
        # ms/step, MAML 2nd-order T20 123.8->68.4 ms/step (+81%). "s2dp"
        # additionally folds the following 2x2/s2 max pool into the layout
        # as an elementwise 4-way maximum (no select-and-scatter backward;
        # tie semantics = pool_impl 'slice'; pending TPU A/B). "conv"
        # restores the stock nn.Conv stack. Applies to the non-BBB
        # LiteratureEncoder paths (SmallCNP/MAML/SingleTask families);
        # falls back to stock when H or W % 4 != 0 (s2dp pool: % 8).
        self.stem_impl = get("stem_impl", "s2d")
        # ResNet-trunk analog of stem_impl: "s2d" computes trunk conv1 +
        # layer1 in phase layout (nn/encoders.py:_s2d_trunk_stem) — identical
        # math/params (golden tested, tests/test_s2d_trunk.py), no
        # input-dilated backward at the trunk's largest resolution. Applies
        # to the non-BBB ResNetTrunk paths (LargeCNP/NPDecoder/SingleTask
        # families). Default stays "conv" until the TPU A/B lands
        # (measure-first discipline; see RESULTS.md round 5).
        self.trunk_stem = get("trunk_stem", "conv")
        self.donate = get("donate", True)
        # training steps fused per host dispatch (lax.scan over staged
        # batches); amortizes dispatch latency, huge at small batch sizes
        self.steps_per_call = get("steps_per_call", 1)
        # device-resident train split + on-device episode sampling:
        # "auto" enables it when the split fits the HBM budget; host traffic
        # drops to one PRNG key per fused call
        self.device_data = get("device_data", "auto")

        if self.task not in TASK_SHAPES:
            raise TypeError(f"{self.task} is not implemented in this experiments!")
        self.img_size, self.input_dim, self.output_dim = TASK_SHAPES[self.task]

        qn = get("query_num", DEFAULT_QUERY_NUM.get(self.task))
        self.query_num = int(qn) if qn is not None else int(self.max_ctx_num)

        # run-dir layout mirrors the reference (configs/config.py:106) except
        # aug_list is joined filesystem-safe: tensorstore (orbax checkpoints)
        # cannot read paths containing [ ] ' characters, which str(aug_list)
        # would embed
        aug_tag = "+".join(self.aug_list) if self.aug_list else "noaug"
        self.save_path = (
            f"{self.results_root}/{self.mode}/{self.method}/"
            f"{self.timestamp}_{self.task}_datasize_{self.data_size}_"
            f"{self.agg_mode}_{self.img_agg}{self.loss_type}_{aug_tag}_seed_{self.seed}"
        )
        if make_dirs:
            self.create_dirs()
            self.save_config()
            self.add_logger()
        else:
            self.logger = logging.getLogger("wmfml_tpu")

    # -- side effects --------------------------------------------------------

    def create_dirs(self):
        os.makedirs(self.save_path, exist_ok=True)
        os.makedirs(f"{self.save_path}/models", exist_ok=True)

    def save_config(self):
        payload = {k: v for k, v in self.__dict__.items() if k != "logger"}
        with open(os.path.join(self.save_path, "config.yml"), "w") as f:
            yaml.dump(payload, f)

    def add_logger(self):
        # a named logger with propagate=False: immune to jax/absl's early
        # root-logger basicConfig (which swallowed INFO at WARNING level)
        # and doesn't re-enable INFO chatter from every third-party library
        self.logger = logging.getLogger("wmfml_tpu")
        self.logger.setLevel(logging.INFO)
        self.logger.propagate = False
        if not any(isinstance(h, logging.StreamHandler)
                   and not isinstance(h, logging.FileHandler)
                   for h in self.logger.handlers):
            sh = logging.StreamHandler()
            sh.setFormatter(logging.Formatter("%(message)s"))
            self.logger.addHandler(sh)
        log_file = os.path.abspath(f"{self.save_path}/log.log")
        # the logger is a process-wide singleton: detach any FileHandler
        # pointing at a DIFFERENT run's log.log, or a second run in the
        # same process (sweep drivers, test suites) would append its lines
        # into every earlier run's file
        for h in list(self.logger.handlers):
            if (isinstance(h, logging.FileHandler)
                    and getattr(h, "baseFilename", None) != log_file):
                self.logger.removeHandler(h)
                h.close()
        if not any(isinstance(h, logging.FileHandler)
                   and getattr(h, "baseFilename", None) == log_file
                   for h in self.logger.handlers):
            fh = logging.FileHandler(log_file, "a")
            fh.setLevel(logging.INFO)
            self.logger.addHandler(fh)

    def __repr__(self):
        return f"Config(method={self.method!r}, task={self.task!r}, mode={self.mode!r})"
