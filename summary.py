"""Model summary CLI — counterpart of the reference `summary.py`: prints the
module tree, parameter count and FLOPs at the given input size.

FLOPs come from XLA's own cost analysis of the compiled forward (instead of
thop hooks); like the reference (`summary.py:23-31`), the reported number uses
the MACs×2 convention — XLA already counts multiply+add separately.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input-shape", type=int, nargs=2, default=[640, 640])
    p.add_argument("--phi", default="n")
    p.add_argument("--num-classes", type=int, default=1)
    args = p.parse_args()

    import jax
    from dcfa_yolo_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp

    from dcfa_yolo_tpu.config import ModelConfig
    from dcfa_yolo_tpu.models.yolo import count_params, init_model

    cfg = ModelConfig(num_classes=args.num_classes, phi=args.phi,
                      input_shape=tuple(args.input_shape))
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    h, w = cfg.input_shape
    x = jnp.zeros((1, h, w, 3))

    print(model.tabulate(jax.random.PRNGKey(0), x, x, train=False,
                         depth=1, console_kwargs={"width": 120}))

    lowered = jax.jit(lambda v, r, n: model.apply(v, r, n, train=False)).lower(
        variables, x, x)
    cost = lowered.compile().cost_analysis()
    flops = cost.get("flops", float("nan")) if cost else float("nan")

    n_params = count_params(variables)
    print(f"Total params: {n_params:,} ({n_params / 1e6:.2f}M)")
    print(f"Total GFLOPs: {flops / 1e9:.3f}G (XLA cost analysis, "
          f"input {h}x{w} pair)")


if __name__ == "__main__":
    main()
