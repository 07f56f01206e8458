"""CLI flag parity against the reference ArgParserEMSANet.

The reference flag list below is the complete set of option strings
declared in `/root/reference/emsanet/args.py` (extracted with
`grep -oE "'--[a-z0-9-]+'" args.py`, 132 flags incl. the deprecated
shims args.py:1268-1315).  `emsanet_tpu.utils.cli.build_parser` must
accept every one of them so users of the reference can switch with the
same command lines (utils/cli.py module contract).
"""

import pytest

from emsanet_tpu.utils.cli import args_to_config, build_parser

# /root/reference/emsanet/args.py, all declared option strings
REFERENCE_FLAGS = """
--activation --aug-scale-max --aug-scale-min --batch-size --cache-dataset
--checkpointing-best-only --checkpointing-metrics --checkpointing-skip
--context-module --dataset --dataset-path --debug --decoder-normalization
--depth-encoder-backbone --depth-encoder-backbone-block
--depth-encoder-backbone-pretrained-weights-filepath
--depth-encoder-backbone-resnet-block --device --disable-progress-bars
--dropout-p --enable-panoptic --encoder-backbone-pretrained-weights-filepath
--encoder-decoder-fusion --encoder-decoder-skip-downsamplings
--encoder-fusion --encoder-normalization --he-init --hostname
--hypersim-subsample --hypersim-use-old-depth-stats --input-height
--input-modalities --input-width --instance-center-encoding
--instance-center-heatmap-apply-foreground-mask
--instance-center-heatmap-nms-kernel-size
--instance-center-heatmap-threshold --instance-center-heatmap-top-k
--instance-center-loss --instance-center-sigma --instance-decoder
--instance-decoder-block --instance-decoder-block-dropout-p
--instance-decoder-downsamplings --instance-decoder-dropout-p
--instance-decoder-n-blocks --instance-decoder-n-channels
--instance-decoder-upsampling --instance-encoder-decoder-fusion
--instance-no-multiscale-supervision --instance-offset-distance-threshold
--instance-offset-encoding --instance-weighting --learning-rate
--learning-rate-scheduler --momentum --n-epochs --n-workers
--no-pretrained-backbone --no-zero-init-decoder-residuals --normal-decoder
--normal-decoder-block --normal-decoder-block-dropout-p
--normal-decoder-downsamplings --normal-decoder-dropout-p
--normal-decoder-n-blocks --normal-decoder-n-channels
--normal-decoder-upsampling --normal-encoder-decoder-fusion --normal-loss
--normal-no-multiscale-supervision --normalization --notes --optimizer
--orientation-kappa --overfit-n-batches --raw-depth --results-basepath
--resume-ckpt-filepath --resume-ckpt-interval --rgb-encoder-backbone
--rgb-encoder-backbone-block
--rgb-encoder-backbone-pretrained-weights-filepath
--rgb-encoder-backbone-resnet-block --rgbd-encoder-backbone
--rgbd-encoder-backbone-pretrained-weights-filepath
--rgbd-encoder-backbone-resnet-block --scannet-semantic-n-classes
--scannet-subsample --scene-loss-label-smoothing --semantic-class-weighting
--semantic-class-weighting-logarithmic-c --semantic-decoder
--semantic-decoder-block --semantic-decoder-block-dropout-p
--semantic-decoder-downsamplings --semantic-decoder-dropout-p
--semantic-decoder-n-blocks --semantic-decoder-n-channels
--semantic-decoder-upsampling --semantic-encoder-decoder-fusion
--semantic-loss-label-smoothing --semantic-no-multiscale-supervision
--skip-sanity-check --split --subset-deterministic --subset-train
--sunrgbd-depth-do-not-force-mm --sunrgbd-instances-version --tasks
--tasks-weighting --upsampling-context-module --upsampling-decoder
--upsampling-prediction --use-original-scene-labels --validation-batch-size
--validation-force-interval --validation-full-resolution
--validation-input-height --validation-input-width --validation-only
--validation-scannet-benchmark-mode --validation-scannet-subsample
--validation-skip --validation-split --visualization-output-path
--visualize-validation --wandb-mode --wandb-name --wandb-project
--weight-decay --weights-filepath
""".split()


def test_every_reference_flag_is_accepted():
    parser = build_parser()
    ours = set()
    for action in parser._actions:
        ours.update(action.option_strings)
    missing = [f for f in REFERENCE_FLAGS if f not in ours]
    assert not missing, f"reference flags not accepted: {missing}"


def test_multiscale_toggle_flags_reach_config():
    parser = build_parser()
    ns = parser.parse_args(
        ["--tasks", "semantic", "instance", "scene",
         "--enable-panoptic",
         "--semantic-no-multiscale-supervision"]
    )
    cfg = args_to_config(ns)
    assert cfg.model.semantic_no_multiscale_supervision
    assert not cfg.model.instance_no_multiscale_supervision
    assert cfg.model.task_side_output_downscales("semantic") == ()
    assert cfg.model.task_side_output_downscales("instance") == (32, 16, 8)
    # union still covers the instance decoder's needs
    assert cfg.model.side_output_downscales == (32, 16, 8)


def test_multiscale_forced_off_for_mlp_decoder():
    # args.py:1382-1398: non-emsanet decoders cannot emit side outputs
    parser = build_parser()
    ns = parser.parse_args(["--semantic-decoder", "segformermlp"])
    cfg = args_to_config(ns)
    assert cfg.model.semantic_no_multiscale_supervision
    assert cfg.model.side_output_downscales == ()


def test_reference_class_weighting_names():
    parser = build_parser()
    ns = parser.parse_args(
        ["--semantic-class-weighting", "logarithmic",
         "--semantic-class-weighting-logarithmic-c", "1.10"]
    )
    cfg = args_to_config(ns)
    assert cfg.data.class_weighting == "logarithmic"
    assert cfg.data.class_weighting_c == pytest.approx(1.10)


def test_deprecated_class_weighting_alias_wins():
    parser = build_parser()
    ns = parser.parse_args(
        ["--semantic-class-weighting", "logarithmic",
         "--class-weighting", "linear"]
    )
    cfg = args_to_config(ns)
    assert cfg.data.class_weighting == "linear"


def test_per_task_label_smoothing():
    parser = build_parser()
    ns = parser.parse_args(
        ["--semantic-loss-label-smoothing", "0.1",
         "--scene-loss-label-smoothing", "0.2"]
    )
    cfg = args_to_config(ns)
    assert cfg.train.semantic_loss_label_smoothing == pytest.approx(0.1)
    assert cfg.train.scene_loss_label_smoothing == pytest.approx(0.2)
    # deprecated --label-smoothing sets both
    ns = parser.parse_args(["--label-smoothing", "0.3"])
    cfg = args_to_config(ns)
    assert cfg.train.semantic_loss_label_smoothing == pytest.approx(0.3)
    assert cfg.train.scene_loss_label_smoothing == pytest.approx(0.3)


def test_resnet_block_primary_and_deprecated_names():
    parser = build_parser()
    ns = parser.parse_args(
        ["--rgb-encoder-backbone-resnet-block", "basicblock"]
    )
    cfg = args_to_config(ns)
    assert cfg.model.rgb_encoder_backbone_block == "basicblock"
    # deprecated name wins when both given (args.py:1277-1285)
    ns = parser.parse_args(
        ["--rgb-encoder-backbone-resnet-block", "basicblock",
         "--rgb-encoder-backbone-block", "nonbottleneck1d"]
    )
    cfg = args_to_config(ns)
    assert cfg.model.rgb_encoder_backbone_block == "nonbottleneck1d"


def test_deprecated_normalization_alias():
    parser = build_parser()
    ns = parser.parse_args(["--normalization", "groupnorm"])
    cfg = args_to_config(ns)
    assert cfg.model.encoder_normalization == "groupnorm"
    assert cfg.model.decoder_normalization == "groupnorm"


def test_shared_encoder_pretrained_path_propagates():
    parser = build_parser()
    ns = parser.parse_args(
        ["--encoder-backbone-pretrained-weights-filepath", "/tmp/w.ckpt"]
    )
    cfg = args_to_config(ns)
    m = cfg.model
    assert m.rgb_encoder_backbone_pretrained_weights_filepath == "/tmp/w.ckpt"
    assert m.depth_encoder_backbone_pretrained_weights_filepath == "/tmp/w.ckpt"


def test_use_original_scene_labels_polarity():
    # reference default: indoor-domestic labels ON (data.py:178 passes
    # `not use_original_scene_labels`)
    parser = build_parser()
    cfg = args_to_config(parser.parse_args([]))
    assert cfg.data.scene_use_indoor_domestic_labels
    cfg = args_to_config(parser.parse_args(["--use-original-scene-labels"]))
    assert not cfg.data.scene_use_indoor_domestic_labels


def test_misc_new_flags_reach_config():
    parser = build_parser()
    ns = parser.parse_args(
        ["--skip-sanity-check", "--notes", "abc", "--hostname", "host1",
         "--disable-progress-bars", "--validation-scannet-subsample", "200",
         "--visualization-output-path", "/tmp/vis", "--split", "train",
         "--no-zero-init-decoder-residuals",
         "--he-init", "encoder-fusion", "decoder"]
    )
    cfg = args_to_config(ns)
    assert cfg.train.skip_sanity_check
    assert cfg.train.notes == "abc"
    assert cfg.train.hostname == "host1"
    assert cfg.train.disable_progress_bars
    assert cfg.data.validation_scannet_subsample == 200
    assert cfg.train.visualization_output_path == "/tmp/vis"
    assert cfg.model.no_zero_init_decoder_residuals
    assert cfg.model.he_init == ("encoder-fusion", "decoder")
