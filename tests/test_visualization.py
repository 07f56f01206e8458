"""Visualization renderer tests (host-side, fast)."""

import numpy as np

from emsanet_tpu.datasets.metadata import get_metadata_config
from emsanet_tpu.visualization import (
    InstanceColorGenerator,
    PanopticColorGenerator,
    blend,
    visualize_depth,
    visualize_heatmap,
    visualize_instance,
    visualize_instance_offset,
    visualize_orientation,
    visualize_panoptic,
    visualize_semantic,
)
from emsanet_tpu.metrics import LABEL_DIVISOR


def test_semantic_colors():
    config = get_metadata_config("nyuv2")
    colors = config.semantic_label_list.colors_array
    sem = np.array([[0, 1], [2, 40]])
    img = visualize_semantic(sem, colors)
    assert img.shape == (2, 2, 3) and img.dtype == np.uint8
    assert (img[0, 0] == colors[0]).all()
    assert (img[1, 1] == colors[40]).all()


def test_instance_colors_stable():
    gen = InstanceColorGenerator()
    a = gen.colorize(np.array([[0, 1], [2, 1]]))
    b = gen.colorize(np.array([[1, 0], [1, 2]]))
    # same ids get same colors across calls (cross-image consistency)
    assert (a[0, 1] == b[0, 0]).all()
    assert (a[1, 0] == b[1, 1]).all()
    assert (a[0, 0] == 0).all()  # id 0 black


def test_panoptic_colors_stuff_vs_things():
    config = get_metadata_config("nyuv2")
    gen = PanopticColorGenerator(
        config.semantic_label_list.colors_array,
        config.semantic_label_list.classes_is_thing,
    )
    # wall (stuff, idx 1) and two chair instances (thing)
    chair = config.semantic_label_list.index("chair")
    pan = np.array([
        [1 * LABEL_DIVISOR, chair * LABEL_DIVISOR + 1],
        [1 * LABEL_DIVISOR, chair * LABEL_DIVISOR + 2],
    ])
    img = gen.colorize(pan)
    # stuff pixels get exactly the semantic color
    assert (img[0, 0] == config.semantic_label_list.colors_array[1]).all()
    # two instances of the same class get different shades
    assert (img[0, 1] != img[1, 1]).any()


def test_heatmap_and_depth_shapes():
    assert visualize_heatmap(np.random.rand(4, 4)).shape == (4, 4, 3)
    d = np.random.rand(4, 4).astype(np.float32) * 5000
    d[0, 0] = 0
    img = visualize_depth(d)
    assert img.shape == (4, 4, 3)
    assert (img[0, 0] == visualize_heatmap(np.zeros((1, 1)))[0, 0]).all()


def test_offset_and_orientation():
    off = np.zeros((4, 4, 2), np.float32)
    off[..., 1] = 1.0
    img = visualize_instance_offset(off)
    assert img.shape == (4, 4, 3)
    orient = np.zeros((4, 4, 2), np.float32)
    orient[..., 1] = 1.0  # angle 0
    fg = np.zeros((4, 4), bool)
    fg[0, 0] = True
    img2 = visualize_orientation(orient, fg)
    assert (img2[1, 1] == 0).all()  # background masked
    assert img2[0, 0].sum() > 0


def test_blend():
    a = np.zeros((2, 2, 3), np.uint8)
    b = np.full((2, 2, 3), 200, np.uint8)
    out = blend(a, b, alpha=0.5)
    assert (out == 100).all()


def test_instance_orientation_overlay():
    """Arrow/text overlay: colored masks on both bg variants, white arrow
    pixels present, empty orientations -> plain background."""
    from emsanet_tpu.visualization import (
        InstanceColorGenerator,
        visualize_instance_orientations,
    )

    inst = np.zeros((64, 80), np.int32)
    inst[8:40, 10:50] = 1
    inst[45:60, 55:75] = 2
    oris = {1: 0.0, 2: np.pi / 2}
    gen = InstanceColorGenerator()

    black = visualize_instance_orientations(
        inst, oris, shared_color_generator=gen, bg_color=0,
        bg_color_font="black")
    white = visualize_instance_orientations(
        inst, oris, shared_color_generator=gen, bg_color=255,
        bg_color_font="white")
    assert black.shape == (64, 80, 3) and black.dtype == np.uint8
    # background differs between the two variants
    assert (black[0, 0] == 0).all() and (white[0, 0] == 255).all()
    # instance-1 region mostly filled with its shared color
    c1 = np.asarray(gen.color(1))
    region = black[10:38, 12:48].reshape(-1, 3)
    frac = (region == c1).all(-1).mean()
    assert frac > 0.5
    # arrows drawn in white somewhere inside instance 1's bbox
    assert (black[8:40, 10:50] == 255).all(-1).any()

    empty = visualize_instance_orientations(
        inst, {}, shared_color_generator=gen, bg_color=0)
    assert (empty == 0).all()
