"""Quick CPU interpret-mode exactness check of ops/stem.fused_stems
against the flax ResNetStem oracle (strided 7x7 path)."""

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from emsanet_tpu.models.backbone import ResNetStem
from emsanet_tpu.ops.stem import fused_stems


def run(n, h, w, cs, dtype=jnp.float32, seed=0):
    rng = np.random.RandomState(seed)
    xs, k7s, bns, refs = [], [], [], []
    for i, c in enumerate(cs):
        x = jnp.asarray(rng.randn(n, h, w, c), dtype)
        stem = ResNetStem(dtype=dtype, space_to_depth=False)
        v = stem.init(jax.random.PRNGKey(i), x)
        # randomize BN stats so folding is actually exercised
        v = jax.tree.map(lambda a: a, v)
        p = v["params"]["Norm_0"]["BatchNorm_0"]
        s = v["batch_stats"]["Norm_0"]["BatchNorm_0"]
        p = {
            "scale": jnp.asarray(rng.rand(64) + 0.5, jnp.float32),
            "bias": jnp.asarray(rng.randn(64), jnp.float32),
        }
        s = {
            "mean": jnp.asarray(rng.randn(64) * 0.1, jnp.float32),
            "var": jnp.asarray(rng.rand(64) + 0.5, jnp.float32),
        }
        v = {
            "params": {"Conv_0": v["params"]["Conv_0"], "Norm_0": {"BatchNorm_0": p}},
            "batch_stats": {"Norm_0": {"BatchNorm_0": s}},
        }
        ref = stem.apply(v, x, train=False)
        xs.append(x)
        k7s.append(v["params"]["Conv_0"]["kernel"])
        bns.append((p["scale"], p["bias"], s["mean"], s["var"]))
        refs.append(ref)
    outs = fused_stems(tuple(xs), tuple(k7s), tuple(bns))
    for i, (out, ref) in enumerate(zip(outs, refs)):
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
        rel = err / (float(jnp.max(jnp.abs(ref))) + 1e-9)
        print(f"mod{i} c={cs[i]}: shape {out.shape} vs {ref.shape}  maxabs {err:.3e} rel {rel:.3e}")
        assert out.shape == ref.shape
        assert rel < 1e-5, rel


if __name__ == "__main__":
    run(2, 64, 128, [3, 1])
    run(1, 48, 256, [3])
    run(2, 64, 128, [4])
    print("OK")
