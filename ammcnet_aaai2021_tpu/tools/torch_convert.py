"""torch state_dict -> flax variables converter for the AMMCNet model family.

Converts checkpoints of the reference's ``twostream`` generator
(``Code/models/unet.py:967``) and the single-stream ``UNetMem_v7`` /
``UNetMem_v4`` nets into this package's flax variable tree
({'params', 'batch_stats', 'codebook'}).

Key mappings (verified numerically in tests/test_torch_convert.py by running
the actual reference torch module as an oracle):

==============================================  ================================
torch key                                       flax path
==============================================  ================================
<m>.conv.conv.0.weight      (Conv2d, no bias)   params/<m>/conv0.kernel  [T]
<m>.conv.conv.1.{weight,bias}      (BatchNorm)  params/<m>/bn0.{scale,bias}
<m>.conv.conv.1.running_{mean,var}              batch_stats/<m>/bn0.{mean,var}
<m>.conv.conv.{3,4}.*                           conv1 / bn1 likewise
down*.mpconv.1.*                  (double_conv) down*/conv/...
up*.up.{weight,bias}            (ConvTranspose) up*/up.{kernel,bias}     [T]
up*.conv.*                        (double_conv) up*/conv/...
outc.{weight,bias}                              outc.{kernel,bias}       [T]
vq_down3.quan.enc/dec.{weight,bias}   (1x1)     vq_down3/quan/{enc,dec}  [T]
vq_down3.quan.quantize.{embed,cluster_size,     codebook/vq_down3/quan/
  embed_avg}                                      quantize/...
bridge.O2F/F20.conv.*                           bridge/{O2F,F2O}/...
==============================================  ================================

[T]: both Conv (out,in,kh,kw) and ConvTranspose (in,out,kh,kw) weights map
via ``transpose(2, 3, 1, 0)`` — for ConvTranspose that yields the
(kh, kw, out, in) layout flax's ``transpose_kernel=True`` expects.
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np

# torch Sequential index inside double_conv -> (flax conv name, flax bn name)
_DC_INDEX = {"0": "conv0", "1": "bn0", "3": "conv1", "4": "bn1"}


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


def _conv_w(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _map_double_conv(prefix: Tuple[str, ...], seq_idx: str, leaf: str,
                     value: np.ndarray, params: Dict, stats: Dict) -> None:
    name = _DC_INDEX[seq_idx]
    if name.startswith("conv"):
        assert leaf == "weight"
        _set(params, prefix + (name, "kernel"), _conv_w(value))
    else:  # BatchNorm
        if leaf == "weight":
            _set(params, prefix + (name, "scale"), value)
        elif leaf == "bias":
            _set(params, prefix + (name, "bias"), value)
        elif leaf == "running_mean":
            _set(stats, prefix + (name, "mean"), value)
        elif leaf == "running_var":
            _set(stats, prefix + (name, "var"), value)
        # num_batches_tracked dropped


def convert_unetmem_stream(state_dict: Mapping[str, np.ndarray],
                           prefix: str = ""
                           ) -> Tuple[Dict, Dict, Dict]:
    """Convert one UNetMem_v7/v4 stream (optionally under 'rgb.'/'op.').

    Returns (params, batch_stats, codebook) nested dicts.
    """
    params: Dict = {}
    stats: Dict = {}
    codebook: Dict = {}
    plen = len(prefix)
    for key, val in state_dict.items():
        if prefix and not key.startswith(prefix):
            continue
        parts = key[plen:].split(".")
        arr = np.asarray(val)
        mod = parts[0]
        if mod == "inc":
            # inc.conv.conv.<i>.<leaf>
            _map_double_conv((mod,), parts[3], parts[4], arr, params, stats)
        elif mod.startswith("down"):
            # down1.mpconv.1.conv.<i>.<leaf>
            _map_double_conv((mod, "conv"), parts[4], parts[5], arr,
                             params, stats)
        elif mod.startswith("up"):
            if parts[1] == "up":  # ConvTranspose
                if parts[2] == "weight":
                    _set(params, (mod, "up", "kernel"), _conv_w(arr))
                else:
                    _set(params, (mod, "up", "bias"), arr)
            else:  # up1.conv.conv.<i>.<leaf>
                _map_double_conv((mod, "conv"), parts[3], parts[4], arr,
                                 params, stats)
        elif mod == "outc":
            leaf = "kernel" if parts[1] == "weight" else "bias"
            _set(params, (mod, leaf),
                 _conv_w(arr) if leaf == "kernel" else arr)
        elif mod == "vq_down3":
            # vq_down3.quan.{enc,dec}.{weight,bias} |
            # vq_down3.quan.quantize.{embed,cluster_size,embed_avg}
            sub = parts[2]
            if sub in ("enc", "dec"):
                leaf = "kernel" if parts[3] == "weight" else "bias"
                _set(params, (mod, "quan", sub, leaf),
                     _conv_w(arr) if leaf == "kernel" else arr)
            elif sub == "quantize":
                _set(codebook, (mod, "quan", "quantize", parts[3]), arr)
        # anything else (num_batches_tracked etc.) dropped
    return params, stats, codebook


def convert_twostream(state_dict: Mapping[str, np.ndarray]) -> Dict:
    """Full twostream generator state_dict -> flax variables dict."""
    params: Dict = {}
    stats: Dict = {}
    codebook: Dict = {}
    for stream in ("rgb", "op"):
        p, s, c = convert_unetmem_stream(state_dict, prefix=f"{stream}.")
        if p:
            params[stream] = p
        if s:
            stats[stream] = s
        if c:
            codebook[stream] = c
    # bridge.{O2F,F20}.conv.<i>.<leaf>  (reference spells F2O as 'F20')
    bridge_p: Dict = {}
    bridge_s: Dict = {}
    for key, val in state_dict.items():
        if not key.startswith("bridge."):
            continue
        parts = key.split(".")
        torch_name = parts[1]
        flax_name = {"O2F": "O2F", "F20": "F2O", "dec": "dec",
                     "dec_x": "dec_x", "dec_y": "dec_y"}[torch_name]
        arr = np.asarray(val)
        if torch_name in ("O2F", "F20"):
            _map_double_conv((flax_name,), parts[3], parts[4], arr,
                             bridge_p, bridge_s)
        else:  # plain conv of the ablation bridges
            leaf = "kernel" if parts[2] == "weight" else "bias"
            _set(bridge_p, (flax_name, leaf),
                 _conv_w(arr) if leaf == "kernel" else arr)
    if bridge_p:
        params["bridge"] = bridge_p
    if bridge_s:
        stats["bridge"] = bridge_s
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    if codebook:
        out["codebook"] = codebook
    return out


def convert_flownet_sd_state(state_dict: Mapping[str, np.ndarray]) -> Dict:
    """FlowNet2-SD (batchNorm=False) state_dict -> flax variables for
    :class:`~..models.flownet_sd.FlowNet2SD`.

    torch layout (FlowNetSD.py:7-58): Sequential convs ``convX.0.*`` /
    ``deconvX.0.*`` / ``inter_convX.0.*`` and bare convs
    ``predict_flowX.*`` / ``upsampled_flowX_to_Y.*``.  Checkpoints saved from
    the FlowNet2 release wrap everything in a ``state_dict`` key handled by
    :func:`convert_flownet_sd`.
    """
    params: Dict = {}
    for key, val in state_dict.items():
        parts = key.split(".")
        arr = np.asarray(val)
        mod = parts[0]
        if mod == "upsample1":
            continue
        is_deconv = mod.startswith("deconv") or mod.startswith("upsampled")
        if mod.startswith(("conv", "deconv", "inter_conv")):
            # Sequential: <mod>.0.{weight,bias}; flax leaf name per wrapper
            leaf_mod = ("deconv" if mod.startswith("deconv") else "conv")
            leaf = "kernel" if parts[2] == "weight" else "bias"
            _set(params, ("net", mod, leaf_mod, leaf),
                 _conv_w(arr) if leaf == "kernel" else arr)
        elif mod.startswith(("predict_flow", "upsampled_flow")):
            leaf = "kernel" if parts[1] == "weight" else "bias"
            _set(params, ("net", mod, leaf),
                 _conv_w(arr) if leaf == "kernel" else arr)
    return {"params": params}


def convert_flownet_sd(path: str) -> Dict:
    import torch

    raw = torch.load(path, map_location="cpu")
    if isinstance(raw, dict) and "state_dict" in raw:
        raw = raw["state_dict"]
    return convert_flownet_sd_state({k: v.numpy() for k, v in raw.items()})


def convert_pth(path: str, net_tag: str = "unet_vq_twostream") -> Dict:
    """Load a torch .pth state_dict file and convert (CPU torch)."""
    import torch

    state_dict = torch.load(path, map_location="cpu")
    if hasattr(state_dict, "state_dict"):
        state_dict = state_dict.state_dict()
    state_dict = {k: v.numpy() for k, v in state_dict.items()}
    if net_tag == "unet_vq_twostream":
        return convert_twostream(state_dict)
    if net_tag == "unet_vq_topk_res":
        p, s, c = convert_unetmem_stream(state_dict)
        return {"params": p, "batch_stats": s, "codebook": c}
    if net_tag == "unet_vq_topk":
        raise ValueError(
            "unet_vq_topk checkpoints come from the non-runnable reference "
            "class UNetMem_v3 (SURVEY.md 2.3.6); no converter exists")
    raise ValueError(f"no converter for net_tag {net_tag!r}")


def main(argv=None):
    """CLI: convert a torch .pth checkpoint to a flax .msgpack.

    python -m ammcnet_aaai2021_tpu.tools.torch_convert ckpt.pth out.msgpack \
        [--net_tag unet_vq_twostream | --flownet]
    """
    import argparse

    p = argparse.ArgumentParser(description=main.__doc__)
    p.add_argument("src", help="torch .pth state_dict")
    p.add_argument("dst", help="output flax .msgpack")
    p.add_argument("--net_tag", default="unet_vq_twostream")
    p.add_argument("--flownet", action="store_true",
                   help="convert a FlowNet2-SD checkpoint instead")
    args = p.parse_args(argv)
    variables = (convert_flownet_sd(args.src) if args.flownet
                 else convert_pth(args.src, args.net_tag))
    from ..train.checkpoint import save_msgpack

    save_msgpack(args.dst, variables)
    n = sum(np.asarray(x).size for x in _tree_leaves(variables))
    print(f"converted {args.src} -> {args.dst} ({n:,} values)")
    return args.dst


def _tree_leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _tree_leaves(v)
    else:
        yield tree


if __name__ == "__main__":
    main()
