"""Smoke tests for the thin sweep/print CLI entry points — the reference's
multiTrain.py (sequential sweep -> offline evaluate_total) and
printTrain.py (print saved curve npys) surfaces."""

import os

import numpy as np
import pytest


@pytest.mark.parametrize("entry", ["train", "evaluate", "eva_degrade",
                                   "multi_train", "print_train",
                                   "record_video"])
def test_help_renders(entry, capsys):
    """``--help`` must render on every entry point.  Regression: an
    unescaped ``%`` inside an argparse help string (config.py --lr_decay)
    made argparse's %-interpolation raise TypeError on format."""
    mod = __import__(entry)
    with pytest.raises(SystemExit) as e:
        mod.main(["--help"])
    assert e.value.code == 0
    assert "--help" in capsys.readouterr().out


def _tiny_flags(tmp_path):
    return [
        "--chip_size=5", "--exact_steps=300", "--n_parallel_envs=2",
        "--evaluate_cycle=200", "--evaluate_task=2",
        f"--data_dir={tmp_path}", "--buffer_size=16", "--batch_size=4",
    ]


def test_multi_train_sweep_and_print_train_roundtrip(tmp_path, capsys):
    """multi_train with a 1x1 sweep grid trains offline-eval style and
    saves reference-named curve npys (run id 5, multiTrain.py:8-23); then
    print_train's npy path prints those curves back."""
    import multi_train
    import print_train

    multi_train.main(["--sweep_fovs=5", "--sweep_drops=2"]
                     + _tiny_flags(tmp_path))
    out = capsys.readouterr().out
    assert "drop number: 2" in out

    curve_dir = os.path.join(
        str(tmp_path), "TrainResult", "vdn", "fov5", "5by5-2d0b"
    )
    prefix = "vdn_env(5,5,2,0,5,True)"
    success = np.load(
        os.path.join(curve_dir, f"{prefix}success_rate_5.npy")
    )
    assert success.ndim == 1 and len(success) >= 1
    assert np.all((success >= 0) & (success <= 1))

    print_train.main(
        ["dmfb", "--drop_num=2", "--fov=5", "--ith_run=5"]
        + _tiny_flags(tmp_path)
    )
    out = capsys.readouterr().out
    assert "The successful rate are:" in out
    assert "The runtime are:" in out
