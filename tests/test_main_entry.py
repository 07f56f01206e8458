"""Entry-point smoke test: train 2 epochs on synthetic data + resume.

Analog of the reference's end-to-end main.py usage (SURVEY.md §3.1):
verifies run-dir layout (args.json, argsv.txt, metrics.csv, checkpoints,
finished marker), validation metric logging, and the resume subcommand.
"""

import json
import os

import pytest


SMOKE_ARGS = [
    "--dataset", "synthetic",
    "--synthetic-n-samples", "8",
    "--tasks", "semantic", "instance", "orientation", "scene",
    "--enable-panoptic",
    "--input-height", "64",
    "--input-width", "64",
    "--rgb-encoder-backbone", "resnet18",
    "--depth-encoder-backbone", "resnet18",
    "--batch-size", "4",
    "--validation-batch-size", "4",
    "--n-epochs", "2",
    "--validation-force-interval", "1",
    "--validation-skip", "0.0",
    "--checkpointing-metrics", "semantic_miou",
    "--resume-ckpt-interval", "1",
    "--n-workers", "2",
    "--class-weighting", "none",
    "--n-devices", "1",
]


@pytest.mark.slow
def test_main_train_validate_resume(tmp_path):
    import main as main_module

    run_dir = main_module.main(
        SMOKE_ARGS + ["--results-basepath", str(tmp_path)]
    )
    assert os.path.isfile(os.path.join(run_dir, "finished"))
    assert os.path.isfile(os.path.join(run_dir, "args.json"))
    assert os.path.isfile(os.path.join(run_dir, "argsv.txt"))
    assert os.path.isfile(os.path.join(run_dir, "metrics.csv"))
    assert os.path.isfile(
        os.path.join(run_dir, "checkpoints", "ckpt_resume.msgpack")
    )
    # best-metric checkpoint written
    ckpts = os.listdir(os.path.join(run_dir, "checkpoints"))
    assert any(c.startswith("ckpt_semantic_miou") for c in ckpts)

    with open(os.path.join(run_dir, "metrics.csv")) as fh:
        header = fh.readline()
    assert "valid_semantic_miou" in header
    assert "valid_panoptic_all_with_gt_deeplab_pq" in header
    assert "valid_scene_bacc" in header
    assert "valid_orientation_mae_gt_deg" in header

    # resume: replays argv and continues (writes a fresh run dir)
    run_dir2 = main_module.main(["resume", run_dir])
    assert os.path.isfile(os.path.join(run_dir2, "finished"))


@pytest.mark.slow
def test_main_validation_only(tmp_path):
    import main as main_module

    logs = main_module.main(
        SMOKE_ARGS
        + ["--results-basepath", str(tmp_path), "--validation-only"]
    )
    assert "valid_semantic_miou" in logs
    assert "valid_panoptic_all_with_gt_deeplab_pq" in logs
