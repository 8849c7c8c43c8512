"""Config loader: reference YAMLs load unchanged; derived dims match."""

import os

import pytest

from wmfml_tpu.configs import Config, TASK_SHAPES

REF_CFG = "/root/reference/cfg/train"


@pytest.mark.skipif(not os.path.isdir(REF_CFG), reason="reference not mounted")
def test_loads_all_reference_train_yamls(tmp_path):
    import glob

    files = glob.glob(f"{REF_CFG}/*.yaml") + glob.glob(f"{REF_CFG}/contrastive/*.yaml")
    assert len(files) >= 45
    for f in files:
        cfg = Config(f, make_dirs=False, results_root=str(tmp_path))
        assert cfg.method
        assert cfg.task in TASK_SHAPES
        img, din, dout = TASK_SHAPES[cfg.task]
        assert cfg.img_size == img
        assert cfg.input_dim == din and cfg.output_dim == dout


def test_overrides_and_derived(tmp_path):
    cfg = Config(
        f"{REF_CFG}/CNP_ShapeNet1D.yaml",
        overrides=["lr=0.01", "tasks_per_batch=4", 'aug_list=["task_aug"]'],
        make_dirs=False,
        results_root=str(tmp_path),
    )
    assert cfg.lr == 0.01
    assert cfg.tasks_per_batch == 4
    assert cfg.aug_list == ["task_aug"]
    assert cfg.query_num == cfg.max_ctx_num  # shapenet_1d default


def test_from_dict_and_dirs(tmp_path):
    cfg = Config.from_dict(
        dict(method="CNPShapeNet1D", task="shapenet_1d", aug_list=[],
             checkpoint="", loss_type="mse", tasks_per_batch=2, max_ctx_num=5,
             noise_scale=0.0, lr=1e-4, weight_decay=False, optimizer="Adam",
             bg_gen_freq=100, val_iters=2, val_freq=10, iterations=20,
             device="cpu", seed=1),
        make_dirs=True,
        results_root=str(tmp_path / "results"),
    )
    assert os.path.isdir(cfg.save_path)
    assert os.path.isdir(os.path.join(cfg.save_path, "models"))
    assert os.path.isfile(os.path.join(cfg.save_path, "config.yml"))


def test_logger_detaches_previous_runs_file_handler(tmp_path):
    """Two runs in one process must not cross-write log.log files: the
    singleton 'wmfml_tpu' logger drops FileHandlers of earlier runs when a
    new run attaches its own (round-3 review fix)."""
    def mk(name):
        return Config.from_dict(
            dict(method="CNPShapeNet1D", task="shapenet_1d", aug_list=[],
                 checkpoint="", loss_type="mse", tasks_per_batch=2,
                 max_ctx_num=5, noise_scale=0.0, lr=1e-4, weight_decay=False,
                 optimizer="Adam", bg_gen_freq=100, val_iters=2, val_freq=10,
                 iterations=20, device="cpu", seed=1),
            make_dirs=True, results_root=str(tmp_path / name))

    cfg_a = mk("run_a")
    cfg_a.logger.info("line-from-a")
    cfg_b = mk("run_b")
    cfg_b.logger.info("line-from-b")
    log_a = open(os.path.join(cfg_a.save_path, "log.log")).read()
    log_b = open(os.path.join(cfg_b.save_path, "log.log")).read()
    assert "line-from-a" in log_a and "line-from-b" not in log_a
    assert "line-from-b" in log_b
