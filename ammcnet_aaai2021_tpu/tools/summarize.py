"""Model summaries: per-module parameter counts for every net_tag.

Rebuild of the reference's torchsummaryX smoke harnesses (the
``test_get_*`` functions in unet.py/vqvae.py whose docstrings record param
totals): prints a table of (module path, params) plus the total, for any
net_tag.

  python -m ammcnet_aaai2021_tpu.tools.summarize [--net_tag unet_vq_twostream]
"""

from __future__ import annotations

import argparse


def summarize(net_tag: str = "unet_vq_twostream", image_size: int = 64,
              depth: int = 2) -> int:
    import jax
    import jax.numpy as jnp

    from ..configs import NetConfig
    from ..models import build_generator

    cfg = NetConfig(net_tag=net_tag, dtype="float32",
                    use_pallas_memory=False)
    gen = build_generator(cfg)
    s = image_size
    inputs = [jnp.zeros((1, s, s, cfg.in_channel[0]))]
    if "twostream" in net_tag:
        inputs.append(jnp.zeros((1, s, s, cfg.in_channel[1])))
    variables = gen.init({"params": jax.random.PRNGKey(0)}, *inputs)

    rows = {}
    for path, leaf in jax.tree.leaves_with_path(variables["params"]):
        keys = [getattr(p, "key", str(p)) for p in path]
        group = "/".join(keys[:depth])
        rows[group] = rows.get(group, 0) + leaf.size
    total = sum(rows.values())
    width = max(len(k) for k in rows) + 2
    print(f"net_tag: {net_tag}")
    for group in sorted(rows):
        print(f"  {group:<{width}} {rows[group]:>12,}")
    print(f"  {'TOTAL (params)':<{width}} {total:>12,}")
    n_state = sum(
        leaf.size for col, tree in variables.items() if col != "params"
        for leaf in jax.tree.leaves(tree))
    print(f"  {'non-param state':<{width}} {n_state:>12,}")
    return total


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--net_tag", default="unet_vq_twostream")
    p.add_argument("--image_size", type=int, default=64)
    p.add_argument("--depth", type=int, default=2)
    args = p.parse_args(argv)
    return summarize(args.net_tag, args.image_size, args.depth)


if __name__ == "__main__":
    main()
