"""Per-segment timing breakdown of the flagship forward on the real TPU.

Times each architectural segment as its own jit (queue-difference
timing) to locate where the 69 ms @ b32 actually goes. One process,
one TPU job (CLAUDE.md rules). Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/fwd_breakdown.py
"""

import argparse
import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from emsanet_tpu.models.layers import ConvNormAct, NonBottleneck1D, SqueezeExcitation
from emsanet_tpu.models.backbone import ResNetStem, ResNetStage
from emsanet_tpu.models.context import get_context_module
from emsanet_tpu.models.decoder import PredictionUpsampling
from emsanet_tpu.models.upsampling import Upsampling
from emsanet_tpu.utils.timing import queue_difference_timing

BF = jnp.bfloat16


def time_module(name, module, x, runs=40, **apply_kwargs):
    rng = jax.random.PRNGKey(0)
    v = module.init(rng, x, **apply_kwargs)
    fn = jax.jit(
        lambda v, x: jax.tree.map(
            lambda a: a.astype(jnp.float32).sum(),
            module.apply(v, x, **apply_kwargs),
        )
    )
    probe = jax.jit(lambda v, x: sum(jax.tree.leaves(fn(v, x))))
    t, _ = queue_difference_timing(
        lambda: probe(v, x), n_long=runs, n_short=runs // 4
    )
    print(f"{name:46s} {t*1e3:8.3f} ms   x{x.shape}")
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()
    n = args.batch
    rng = jax.random.PRNGKey(1)
    print(f"device={jax.devices()[0].device_kind} batch={n} bf16")

    total = 0.0
    # stems (per modality)
    x_rgb = jax.random.normal(rng, (n, 480, 640, 3), BF)
    x_d = jax.random.normal(rng, (n, 480, 640, 1), BF)
    total += time_module("stem rgb 7x7/2+pool", ResNetStem(dtype=BF), x_rgb)
    total += time_module("stem depth", ResNetStem(dtype=BF), x_d)

    # SE fusions at each downscale
    for h, w, c in [(120, 160, 64), (120, 160, 64), (60, 80, 128),
                    (30, 40, 256), (15, 20, 512)]:
        f = jax.random.normal(rng, (n, h, w, c), BF)

        class Fus(nn.Module):
            @nn.compact
            def __call__(self, x):
                a = SqueezeExcitation(dtype=BF, name="a")(x)
                b = SqueezeExcitation(dtype=BF, name="b")(x)
                return a + b
        total += time_module(f"se-fusion {c}ch", Fus(), f)

    # encoder stages (full, incl. strided first block) x2 modalities
    for i, (nb, c, h, w, s) in enumerate([
        (3, 64, 120, 160, 1), (4, 128, 120, 160, 2),
        (6, 256, 60, 80, 2), (3, 512, 30, 40, 2),
    ]):
        cin = 64 if i == 0 else (64, 128, 256)[i - 1]
        f = jax.random.normal(rng, (n, h, w, cin), BF)
        st = ResNetStage(block="nonbottleneck1d", n_blocks=nb, features=c,
                         stride=s, dtype=BF)
        t = time_module(f"enc stage{i} ({nb} blk, C{c})", st, f,
                        train=False, deterministic=True)
        total += 2 * t - t  # printed once; counted once (x2 added below)
        total += t  # second modality

    # context module PPM at (15,20,512)
    f = jax.random.normal(rng, (n, 15, 20, 512), BF)
    ppm = get_context_module("ppm", n_channels_out=512,
                             normalization="batchnorm", activation="relu",
                             upsampling="bilinear", dtype=BF)
    total += time_module("context PPM", ppm, f, train=False)

    # decoder modules (conv_in + blocks + side + upsample + skip proj),
    # approximated by pieces; x2 decoders
    for (h, w, cin, cout) in [(15, 20, 512, 512), (30, 40, 512, 256),
                              (60, 80, 256, 128)]:
        f = jax.random.normal(rng, (n, h, w, cin), BF)
        t = time_module(
            f"dec conv_in 3x3 {cin}->{cout} @{h}x{w}",
            ConvNormAct(cout, (3, 3), dtype=BF), f, train=False)
        total += 2 * t

    class Blocks(nn.Module):
        c: int
        k: int = 3

        @nn.compact
        def __call__(self, x):
            for i in range(self.k):
                x = NonBottleneck1D(features=self.c, dtype=BF,
                                    zero_init_residual=True,
                                    name=f"b{i}")(x, train=False)
            return x

    for (h, w, c) in [(15, 20, 512), (30, 40, 512)]:
        # module0 blocks at 1/32?? decoder runs at the *input* downscale
        pass
    for (h, w, c) in [(30, 40, 512), (60, 80, 256), (120, 160, 128)]:
        f = jax.random.normal(rng, (n, h, w, c), BF)
        t = time_module(f"dec blocks x3 C{c} @{h}x{w}", Blocks(c=c), f)
        total += 2 * t

    # learned-3x3 upsample inside decoder modules
    for (h, w, c) in [(30, 40, 512), (60, 80, 256), (120, 160, 128)]:
        f = jax.random.normal(rng, (n, h, w, c), BF)
        t = time_module(f"module upsample x2 C{c} @{h}x{w}",
                        Upsampling(dtype=BF), f)
        total += 2 * t

    # skip fusion projections 1x1 (approx: 256->512 etc.)
    for (h, w, cin, cout) in [(30, 40, 256, 512), (60, 80, 128, 256),
                              (120, 160, 64, 128)]:
        f = jax.random.normal(rng, (n, h, w, cin), BF)
        t = time_module(
            f"skip proj 1x1 {cin}->{cout}",
            ConvNormAct(cout, (1, 1), dtype=BF), f, train=False)
        total += 2 * t

    # heads: semantic 3x3 128->40 @ (120,160); instance shared+tasks
    f = jax.random.normal(rng, (n, 120, 160, 128), BF)

    class SemHead(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(40, (3, 3), dtype=BF)(x)
    total += time_module("semantic head conv 128->40", SemHead(), f)

    class InstHead(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = ConvNormAct(96, (3, 3), dtype=BF)(x, train=False)
            outs = [nn.Conv(c, (3, 3), dtype=BF)(h[..., i*32:(i+1)*32])
                    for i, c in enumerate((1, 2, 2))]
            return jnp.concatenate(outs, -1)
    total += time_module("instance head shared+tasks", InstHead(), f)

    # prediction upsampling x4 to full res
    f40 = jax.random.normal(rng, (n, 120, 160, 40), BF)
    total += time_module("pred upsample x4 (40ch)",
                         PredictionUpsampling(dtype=BF), f40)
    f5 = jax.random.normal(rng, (n, 120, 160, 5), BF)
    total += time_module("pred upsample x4 (5ch)",
                         PredictionUpsampling(dtype=BF), f5)

    print(f"{'SUM of segments':46s} {total*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
