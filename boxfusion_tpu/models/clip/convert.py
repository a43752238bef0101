"""Convert open_clip / OpenAI CLIP torch checkpoints to flax params.

The reference consumes CLIP through external weights
(``open_clip_pytorch_model.bin``, reference demo.py:395; tools/utils.py:
342-353 loads ViT-H-14).  This converter maps those state dicts onto
``boxfusion_tpu.models.clip.model`` parameter trees.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from boxfusion_tpu.models.clip.model import CLIPConfig


def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x, np.float32)


def _ln(sd, prefix):
    return {"scale": _t(sd[prefix + ".weight"]), "bias": _t(sd[prefix + ".bias"])}


def _dense(sd, prefix):
    return {"kernel": _t(sd[prefix + ".weight"]).T, "bias": _t(sd[prefix + ".bias"])}


def _resblock(sd, prefix):
    return {
        "ln_1": _ln(sd, prefix + ".ln_1"),
        "attn_in_proj_weight": _t(sd[prefix + ".attn.in_proj_weight"]),
        "attn_in_proj_bias": _t(sd[prefix + ".attn.in_proj_bias"]),
        "attn_out_proj": _dense(sd, prefix + ".attn.out_proj"),
        "ln_2": _ln(sd, prefix + ".ln_2"),
        "mlp_fc": _dense(sd, prefix + ".mlp.c_fc"),
        "mlp_proj": _dense(sd, prefix + ".mlp.c_proj"),
    }


# open_clip vision-tower head counts by width: head_dim is 64 for B/L but
# grows for the larger towers (H: 80, g: 88, bigG: 104), so width alone
# cannot be divided by a fixed head size.
_VISION_HEADS = {768: 12, 1024: 16, 1280: 16, 1408: 16, 1664: 16}


def infer_config(sd: Dict, quick_gelu: bool | None = None) -> CLIPConfig:
    width = sd["visual.conv1.weight"].shape[0]
    patch = sd["visual.conv1.weight"].shape[-1]
    # grid side from the positional-embedding token count (CLS + side**2)
    grid = int(round((sd["visual.positional_embedding"].shape[0] - 1) ** 0.5))
    layers = max(
        int(k.split(".")[3]) for k in sd if k.startswith("visual.transformer.resblocks.")
    ) + 1
    text_width = sd["ln_final.weight"].shape[0]
    text_layers = max(
        int(k.split(".")[2]) for k in sd if k.startswith("transformer.resblocks.")
    ) + 1
    embed_dim = sd["text_projection"].shape[1]
    return CLIPConfig(
        patch=int(patch),
        image_size=int(grid * patch),
        vocab_size=int(sd["token_embedding.weight"].shape[0]),
        context_length=int(sd["positional_embedding"].shape[0]),
        width=int(width),
        layers=int(layers),
        heads=_VISION_HEADS.get(int(width), int(width) // 64),
        embed_dim=int(embed_dim),
        text_width=int(text_width),
        text_layers=int(text_layers),
        text_heads=int(text_width) // 64,
        # The activation is NOT recoverable from tensor shapes: OpenAI L/14
        # uses QuickGELU while laion open_clip L/14 (identical shapes) uses
        # exact GELU.  Callers that know the checkpoint's provenance should
        # pass quick_gelu explicitly; the shape heuristic is only a default.
        quick_gelu=bool(width == 1024 and embed_dim == 768)
        if quick_gelu is None
        else bool(quick_gelu),
    )


def convert_image_tower(sd: Dict, quick_gelu: bool | None = None) -> Tuple[Dict, CLIPConfig]:
    cfg = infer_config(sd, quick_gelu)
    p = {
        "conv1": {"kernel": _t(sd["visual.conv1.weight"]).transpose(2, 3, 1, 0)},
        "class_embedding": _t(sd["visual.class_embedding"]),
        "positional_embedding": _t(sd["visual.positional_embedding"]),
        "ln_pre": _ln(sd, "visual.ln_pre"),
        "ln_post": _ln(sd, "visual.ln_post"),
        "proj": _t(sd["visual.proj"]),
    }
    for i in range(cfg.layers):
        p[f"resblocks_{i}"] = _resblock(sd, f"visual.transformer.resblocks.{i}")
    return {"params": p}, cfg


def convert_text_tower(sd: Dict, quick_gelu: bool | None = None) -> Tuple[Dict, CLIPConfig]:
    cfg = infer_config(sd, quick_gelu)
    p = {
        "token_embedding": {"embedding": _t(sd["token_embedding.weight"])},
        "positional_embedding": _t(sd["positional_embedding"]),
        "ln_final": _ln(sd, "ln_final"),
        "text_projection": _t(sd["text_projection"]),
    }
    for i in range(cfg.text_layers):
        p[f"resblocks_{i}"] = _resblock(sd, f"transformer.resblocks.{i}")
    return {"params": p}, cfg


def load_clip_image_params(path: str):
    """Load a torch CLIP checkpoint -> (flax params, CLIPConfig)."""
    import os

    import torch

    if not os.path.exists(path):
        raise FileNotFoundError(
            f"CLIP checkpoint not found: {path} (expected open_clip/OpenAI "
            "torch weights, e.g. ViT-H-14; see README 'Checkpoints')"
        )
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k.replace("module.", ""): v for k, v in sd.items()}
    return convert_image_tower(sd)


def load_clip_text_params(path: str):
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k.replace("module.", ""): v for k, v in sd.items()}
    return convert_text_tower(sd)
