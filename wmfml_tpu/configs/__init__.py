from wmfml_tpu.configs.config import Config, TASK_SHAPES

__all__ = ["Config", "TASK_SHAPES"]
