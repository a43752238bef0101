"""CuTR torch checkpoint -> flax params converter.

Capability target: the reference's checkpoint load path (demo.py:441-446):
``torch.load(model_path)["model"]`` with the ViT width sniffed from
``backbone.0.patch_embed.proj.weight``.  This module maps that state dict
(the torch module tree of reference cubify_transformer.py:1232-1323) onto
the ``boxfusion_tpu.models.cutr`` flax parameter tree.

Layout conventions converted:
  * Linear: torch (out, in) -> flax kernel (in, out).
  * Conv2d: torch (O, I, kh, kw) -> flax HWIO.
  * LayerNorm/GroupNorm weight -> scale.
  * nn.Embedding weight -> flax Embed.embedding.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x, np.float32)


def _lin(sd, p):
    return {"kernel": _t(sd[p + ".weight"]).T, "bias": _t(sd[p + ".bias"])}


def _conv(sd, p):
    return {"kernel": _t(sd[p + ".weight"]).transpose(2, 3, 1, 0), "bias": _t(sd[p + ".bias"])}


def _norm(sd, p):
    return {"scale": _t(sd[p + ".weight"]), "bias": _t(sd[p + ".bias"])}


def _mlp(sd, p, n=3):
    return {f"layers_{i}": _lin(sd, f"{p}.layers.{i}") for i in range(n)}


def convert_cutr_checkpoint(sd: Dict, num_layers: int = 6, vit_depth: int = 12) -> Tuple[Dict, int, bool]:
    """Convert a reference CuTR state dict to flax params.

    Args:
      sd: the torch state dict (``checkpoint["model"]``).

    Returns:
      ({"params": tree}, vit_width, depth_model).
    """
    dim = int(sd["backbone.0.patch_embed.proj.weight"].shape[0])
    depth_model = "backbone.0.patch_embed_depth.proj.weight" in sd

    vit = {
        "patch_embed": {"proj": _conv(sd, "backbone.0.patch_embed.proj")},
        "pos_embed": _t(sd["backbone.0.pos_embed"]),
    }
    if depth_model:
        vit["patch_embed_depth"] = {"proj": _conv(sd, "backbone.0.patch_embed_depth.proj")}
        vit["pos_embed_depth"] = _t(sd["backbone.0.pos_embed_depth"])
    for i in range(vit_depth):
        b = f"backbone.0.blocks.{i}"
        blk = {
            "norm1": _norm(sd, b + ".norm1"),
            "norm2": _norm(sd, b + ".norm2"),
            "attn": {"qkv": _lin(sd, b + ".attn.qkv"), "proj": _lin(sd, b + ".attn.proj")},
            "mlp": {"fc1": _lin(sd, b + ".mlp.fc1"), "fc2": _lin(sd, b + ".mlp.fc2")},
        }
        if b + ".ls1.gamma" in sd:
            blk["ls1_gamma"] = _t(sd[b + ".ls1.gamma"])
            blk["ls2_gamma"] = _t(sd[b + ".ls2.gamma"])
        vit[f"blocks_{i}"] = blk
    if "backbone.0.encoder_norm.weight" in sd:
        vit["encoder_norm"] = _norm(sd, "backbone.0.encoder_norm")

    ep = "prompting.prompters.1"
    enc = {
        "enc_output_proj_1": _conv(sd, ep + ".enc_output_proj.1.0"),
        "enc_output_proj_2_0": _conv(sd, ep + ".enc_output_proj.2.0"),
        "enc_output_proj_2_1": _norm(sd, ep + ".enc_output_proj.2.1.ln"),
        "enc_output_proj_2_3": _conv(sd, ep + ".enc_output_proj.2.3"),
        "enc_output": _lin(sd, ep + ".enc_output"),
        "enc_output_norm": _norm(sd, ep + ".enc_output_norm"),
        "class_predictor": {"linear": _lin(sd, ep + ".predictors.0.linear")},
        "delta_box_predictor": {"mlp": _mlp(sd, ep + ".predictors.1.mlp")},
    }

    params = {
        "vit": vit,
        "input_proj_conv": _conv(sd, "input_proj.0.0"),
        "input_proj_norm": _norm(sd, "input_proj.0.1"),
        "level_embed": _t(sd["level_embed"]),
        "camera_ray": {"proj": _lin(sd, "pos_embedding.proj")},
        "encoder_proposals": enc,
        "query_embed": _t(sd[ep + ".query_embed.weight"]),
        "metric_query_embed": _t(sd["prompting.prompters.0.query_embed.weight"]),
        "box_2d_encoder": {
            n: {"embedding": _t(sd[f"prompting.encoders.box_2d_encoder.{n}.weight"])}
            for n in ("x", "y", "w", "h")
        },
        "decoder_norm": _norm(sd, "decoder.norm"),
    }

    for i in range(num_layers):
        d = f"decoder.layers.{i}"
        params[f"decoder_layer_{i}"] = {
            "norm1": _norm(sd, d + ".norm1"),
            "norm2": _norm(sd, d + ".norm2"),
            "norm3": _norm(sd, d + ".norm3"),
            "self_attn": {
                "in_proj_weight": _t(sd[d + ".self_attn.in_proj_weight"]),
                "in_proj_bias": _t(sd[d + ".self_attn.in_proj_bias"]),
                "out_proj": _lin(sd, d + ".self_attn.out_proj"),
            },
            "xattn": {
                "cpb_mlp1": {
                    "fc1": _lin(sd, d + ".xattn.cpb_mlp1.0"),
                    "fc2": {"kernel": _t(sd[d + ".xattn.cpb_mlp1.2.weight"]).T},
                },
                "cpb_mlp2": {
                    "fc1": _lin(sd, d + ".xattn.cpb_mlp2.0"),
                    "fc2": {"kernel": _t(sd[d + ".xattn.cpb_mlp2.2.weight"]).T},
                },
                "q": _lin(sd, d + ".xattn.q"),
                "k": _lin(sd, d + ".xattn.k"),
                "v": _lin(sd, d + ".xattn.v"),
                "proj": _lin(sd, d + ".xattn.proj"),
            },
            "linear1": _lin(sd, d + ".linear1"),
            "linear2": _lin(sd, d + ".linear2"),
        }
        p = f"decoder.predictors.{i}"
        params[f"scale_predictor_{i}"] = {
            "shift": _lin(sd, p + ".0.shift"),
            "scale": _lin(sd, p + ".0.scale"),
        }
        params[f"class_predictor_{i}"] = {"linear": _lin(sd, p + ".1.linear")}
        params[f"box2d_predictor_{i}"] = {"mlp": _mlp(sd, p + ".2.mlp")}
        params[f"box3d_predictor_{i}"] = {"mlp": _mlp(sd, p + ".3.mlp")}

    return {"params": params}, dim, depth_model


def _sniff_flax(tree: Dict, path: str):
    """(params, width, depth_model) from an already-flax parameter tree."""
    p = tree["params"] if "params" in tree else tree
    try:
        vit = p["vit"]
        dim = int(np.shape(vit["patch_embed"]["proj"]["kernel"])[-1])
    except (KeyError, IndexError) as e:
        raise ValueError(
            f"{path} does not look like a converted CuTR parameter tree "
            f"(missing vit/patch_embed/proj/kernel): {e}"
        )
    return {"params": p}, dim, "patch_embed_depth" in vit


def load_checkpoint(path: str):
    """checkpoint file -> (flax params, vit width, depth_model).

    Accepts the reference's torch ``.pth/.pt`` state dict (width sniffed
    from the patch-embed weight exactly like demo.py:441-446; depth_model
    from the presence of the depth patch embed, so RGB-only CuTR
    checkpoints load too -- the reference hardcodes is_depth_model=True,
    demo.py:444, but its builder supports both, cubify_transformer.py:1232),
    a pre-converted flax ``.msgpack`` (written by this module's CLI), or an
    orbax checkpoint directory (written by utils/checkpoint.save_params)."""
    import os

    if not os.path.exists(path):
        raise FileNotFoundError(
            f"CuTR checkpoint not found: {path} (expected the reference's "
            "cutr_rgbd.pth torch state dict, a pre-converted .msgpack, or "
            "an orbax directory; see README 'Checkpoints')"
        )
    if os.path.isdir(path):  # orbax layout
        from boxfusion_tpu.utils.checkpoint import restore_params

        return _sniff_flax(restore_params(path), path)
    if path.endswith(".msgpack"):
        from flax import serialization

        with open(path, "rb") as f:
            return _sniff_flax(serialization.msgpack_restore(f.read()), path)

    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    sd = ckpt["model"] if "model" in ckpt else ckpt
    key = "backbone.0.patch_embed.proj.weight"  # width sniff (demo.py:442)
    if key not in sd:
        raise ValueError(
            f"{path} does not look like a CuTR state dict: missing '{key}' "
            f"(found {len(sd)} keys, e.g. {sorted(sd)[:3]})"
        )
    return convert_cutr_checkpoint(sd)


def flax_to_torch_template(params: Dict) -> Dict[str, np.ndarray]:
    """Inverse mapping (flax -> torch-format state dict).

    Used to round-trip-test the converter without a real checkpoint, and to
    export trained flax weights for the reference's torch stack.
    """
    p = params["params"] if "params" in params else params
    sd: Dict[str, np.ndarray] = {}

    def lin(prefix, node):
        sd[prefix + ".weight"] = np.asarray(node["kernel"]).T
        sd[prefix + ".bias"] = np.asarray(node["bias"])

    def conv(prefix, node):
        sd[prefix + ".weight"] = np.asarray(node["kernel"]).transpose(3, 2, 0, 1)
        sd[prefix + ".bias"] = np.asarray(node["bias"])

    def norm(prefix, node):
        sd[prefix + ".weight"] = np.asarray(node["scale"])
        sd[prefix + ".bias"] = np.asarray(node["bias"])

    vit = p["vit"]
    conv("backbone.0.patch_embed.proj", vit["patch_embed"]["proj"])
    sd["backbone.0.pos_embed"] = np.asarray(vit["pos_embed"])
    if "patch_embed_depth" in vit:
        conv("backbone.0.patch_embed_depth.proj", vit["patch_embed_depth"]["proj"])
        sd["backbone.0.pos_embed_depth"] = np.asarray(vit["pos_embed_depth"])
    i = 0
    while f"blocks_{i}" in vit:
        b = vit[f"blocks_{i}"]
        t = f"backbone.0.blocks.{i}"
        norm(t + ".norm1", b["norm1"])
        norm(t + ".norm2", b["norm2"])
        lin(t + ".attn.qkv", b["attn"]["qkv"])
        lin(t + ".attn.proj", b["attn"]["proj"])
        lin(t + ".mlp.fc1", b["mlp"]["fc1"])
        lin(t + ".mlp.fc2", b["mlp"]["fc2"])
        if "ls1_gamma" in b:
            sd[t + ".ls1.gamma"] = np.asarray(b["ls1_gamma"])
            sd[t + ".ls2.gamma"] = np.asarray(b["ls2_gamma"])
        i += 1
    if "encoder_norm" in vit:
        norm("backbone.0.encoder_norm", vit["encoder_norm"])

    conv("input_proj.0.0", p["input_proj_conv"])
    norm("input_proj.0.1", p["input_proj_norm"])
    sd["level_embed"] = np.asarray(p["level_embed"])
    lin("pos_embedding.proj", p["camera_ray"]["proj"])

    enc = p["encoder_proposals"]
    ep = "prompting.prompters.1"
    conv(ep + ".enc_output_proj.1.0", enc["enc_output_proj_1"])
    conv(ep + ".enc_output_proj.2.0", enc["enc_output_proj_2_0"])
    norm(ep + ".enc_output_proj.2.1.ln", enc["enc_output_proj_2_1"])
    conv(ep + ".enc_output_proj.2.3", enc["enc_output_proj_2_3"])
    lin(ep + ".enc_output", enc["enc_output"])
    norm(ep + ".enc_output_norm", enc["enc_output_norm"])
    lin(ep + ".predictors.0.linear", enc["class_predictor"]["linear"])
    for j in range(3):
        lin(ep + f".predictors.1.mlp.layers.{j}", enc["delta_box_predictor"]["mlp"][f"layers_{j}"])
    sd[ep + ".query_embed.weight"] = np.asarray(p["query_embed"])
    sd["prompting.prompters.0.query_embed.weight"] = np.asarray(p["metric_query_embed"])
    # the torch prompt encoder is ONE shared module whose tensors the state
    # dict repeats under prompting.encoders AND both prompter paths
    # (cubify_transformer.py:1014 ``prompter.encoders = self.encoders``); a
    # strict load_state_dict needs every alias, plus the constant
    # min/max clamp buffers (cubify_transformer.py:370-371)
    for prefix in (
        "prompting.encoders.box_2d_encoder",
        "prompting.prompters.0.encoders.box_2d_encoder",
        "prompting.prompters.1.encoders.box_2d_encoder",
    ):
        for n in ("x", "y", "w", "h"):
            sd[f"{prefix}.{n}.weight"] = np.asarray(
                p["box_2d_encoder"][n]["embedding"]
            )
        sd[f"{prefix}.min_bounds"] = np.zeros(4, np.float32)
        sd[f"{prefix}.max_bounds"] = np.full(4, 1280.0 - 1.0, np.float32)
    norm("decoder.norm", p["decoder_norm"])

    i = 0
    while f"decoder_layer_{i}" in p:
        d = p[f"decoder_layer_{i}"]
        t = f"decoder.layers.{i}"
        for nn_ in ("norm1", "norm2", "norm3"):
            norm(t + "." + nn_, d[nn_])
        sd[t + ".self_attn.in_proj_weight"] = np.asarray(d["self_attn"]["in_proj_weight"])
        sd[t + ".self_attn.in_proj_bias"] = np.asarray(d["self_attn"]["in_proj_bias"])
        lin(t + ".self_attn.out_proj", d["self_attn"]["out_proj"])
        lin(t + ".xattn.cpb_mlp1.0", d["xattn"]["cpb_mlp1"]["fc1"])
        sd[t + ".xattn.cpb_mlp1.2.weight"] = np.asarray(d["xattn"]["cpb_mlp1"]["fc2"]["kernel"]).T
        lin(t + ".xattn.cpb_mlp2.0", d["xattn"]["cpb_mlp2"]["fc1"])
        sd[t + ".xattn.cpb_mlp2.2.weight"] = np.asarray(d["xattn"]["cpb_mlp2"]["fc2"]["kernel"]).T
        for nn_ in ("q", "k", "v", "proj"):
            lin(t + ".xattn." + nn_, d["xattn"][nn_])
        lin(t + ".linear1", d["linear1"])
        lin(t + ".linear2", d["linear2"])
        pr = f"decoder.predictors.{i}"
        lin(pr + ".0.shift", p[f"scale_predictor_{i}"]["shift"])
        lin(pr + ".0.scale", p[f"scale_predictor_{i}"]["scale"])
        lin(pr + ".1.linear", p[f"class_predictor_{i}"]["linear"])
        for j in range(3):
            lin(pr + f".2.mlp.layers.{j}", p[f"box2d_predictor_{i}"]["mlp"][f"layers_{j}"])
            lin(pr + f".3.mlp.layers.{j}", p[f"box3d_predictor_{i}"]["mlp"][f"layers_{j}"])
        i += 1

    return sd


def main(argv=None) -> int:
    """Pre-conversion CLI: torch .pth -> flax .msgpack.

    Usage: python -m boxfusion_tpu.models.cutr.convert cutr_rgbd.pth out.msgpack

    The msgpack loads back through ``load_checkpoint`` (and the main CLI's
    --model-path) without needing torch at inference time.
    """
    import argparse

    p = argparse.ArgumentParser(prog="cutr-convert", description=main.__doc__)
    p.add_argument("src", help="reference torch checkpoint (.pth/.pt)")
    p.add_argument("dst", help="output flax params (.msgpack)")
    args = p.parse_args(argv)

    # load_checkpoint dispatches on the extension: any other suffix would
    # write bytes that can never be loaded back
    if not args.dst.endswith(".msgpack"):
        p.error(f"dst must end with .msgpack (got {args.dst!r})")

    from flax import serialization

    params, dim, depth_model = load_checkpoint(args.src)
    with open(args.dst, "wb") as f:
        f.write(serialization.msgpack_serialize(params))
    kind = "RGB-D" if depth_model else "RGB-only"
    print(f"converted {args.src} -> {args.dst} (ViT width {dim}, {kind})")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
