"""Convert reference (PyTorch) OsuFusion checkpoints to this framework.

The reference saves ``model.state_dict()`` to ``model.safetensors``
(reference trainer.py:143-145) or a ``checkpoint.pt`` dict with a
``model_state_dict`` entry (:159-171); its inference app loads either
(reference inference_gradio.py:32-42). A reference user migrating here
brings those files, so this module maps every torch parameter onto the flax
UNet tree: name translation (`resolve_reference_key`) plus layout transposes
(torch conv ``(out, in, k)`` -> flax ``(k, in, out)``; torch linear
``(out, in)`` -> flax ``(in, out)``; torch 1x1 conv -> flax Dense).

The mapping covers all three backbones: the UNet (the only backbone the
reference's CLIs can train) plus the DiT and MMDiT (orphan alt backbones in
the reference, SURVEY.md §2.4, trainable here — mapped so weights transplant
both ways for parity testing and for anyone who trained one by editing the
reference).

Continuously validated: tests/test_torch_parity.py builds the reference
torch UNet, converts its live ``state_dict()`` through these exact
functions, and pins forward/gradient agreement with the flax model;
tests/test_torch_parity_transformers.py does the same for DiT and MMDiT.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict

import jax
import numpy as np


def strip_reference_prefixes(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Drop the wrapper prefixes a reference checkpoint may carry:
    ``module.`` (DDP/Accelerate) and ``unet.`` (the OsuFusion wrapper holds
    the denoiser as ``self.unet``; reference models/diffusion.py:33)."""
    out = {}
    for k, v in sd.items():
        for prefix in ("module.", "unet."):
            if k.startswith(prefix):
                k = k[len(prefix) :]
        out[k] = v
    return out


def resolve_reference_key(path: str, sd: Dict[str, Any]) -> str:
    """Translate a flax param path (``/``-joined) to the reference
    state_dict key. ``sd`` is consulted only to disambiguate the sampler
    (the reference's last-level sampler is either a conv or an fn list)."""
    parts = path.split("/")
    out: list[str] = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p == "params":
            pass
        elif p in ("init_x", "init_conv", "preprocess"):
            out.append(p)
        elif p.startswith("Conv_") and out and out[-1] in ("init_x", "init_conv", "preprocess"):
            out[-1] = out[-1] + f".convs.{p.split('_')[1]}"
        elif p == "audio_encoder":
            out.append("audio_encoder")
        elif p.startswith("layer_"):
            out.append(f"layers.{p.split('_')[1]}")
        elif p.startswith("down_"):
            out.append(f"down_layers.{p.split('_')[1]}")
        elif p.startswith("up_"):
            out.append(f"up_layers.{p.split('_')[1]}")
        elif p.startswith("middle_transformer_"):
            out.append(f"middle_transformer.{p.rsplit('_', 1)[1]}")
        elif p in ("middle_resnet1", "middle_resnet2", "final_resnet", "init_resnet"):
            out.append(p)
        elif p.startswith("resnet_"):
            out.append(f"resnets.{p.split('_')[1]}")
        elif p.startswith("transformer_"):
            out.append(f"transformers.{p.split('_')[1]}")
        elif p == "sampler":
            nxt = parts[i + 1]
            base = ".".join(out + ["sampler"])
            if f"{base}.conv.weight" in sd:
                out.append("sampler.conv")
            else:
                out.append(f"sampler.fns.{nxt.split('_')[1]}")
            i += 1  # consumed Conv_i
        elif p == "Dense_0" and out and out[-1].endswith(
            ("init_resnet", "middle_resnet1", "middle_resnet2", "final_resnet")
        ):
            out.append("mlp.1")
        elif p == "Dense_0" and "resnet" in out[-1]:
            out.append("mlp.1")
        elif p == "FiLMBlock_0":
            nxt = parts[i + 1]
            out.append("block1.proj" if nxt.startswith("Conv") else "block1.norm")
            i += 1
        elif p == "FiLMBlock_1":
            nxt = parts[i + 1]
            out.append("block2.proj" if nxt.startswith("Conv") else "block2.norm")
            i += 1
        elif p == "GlobalContext_0":
            nxt = parts[i + 1]
            out.append({"Dense_0": "se.to_k", "Dense_1": "se.layers.0", "Dense_2": "se.layers.2"}[nxt])
            i += 1
        elif p == "Conv_0":
            out.append("res_conv")
        elif p == "attn":
            out.append("attn")
        elif p == "LayerNorm_0":
            out.append("norm")
        elif p in ("to_q", "to_kv", "to_out"):
            out.append(p)
        elif p == "ff":
            nxt = parts[i + 1]
            out.append("ff." + {"Dense_0": "0", "Dense_1": "2"}[nxt])
            i += 1
        elif p == "time_mlp":
            nxt = parts[i + 1]
            out.append("time_mlp." + {"Dense_0": "1", "Dense_1": "3"}[nxt])
            i += 1
        elif p == "cond_mlp":
            nxt = parts[i + 1]
            out.append("cond_mlp." + {"Dense_0": "0", "Dense_1": "2"}[nxt])
            i += 1
        elif p == "final_conv":
            out.append("final_conv")
        elif p == "null_cond":
            return "null_cond"
        # ------------------------------------------------ DiT (reference dit.py)
        elif p.startswith("block_"):
            out.append(f"blocks.{p.split('_')[1]}")
        elif p in ("mlp_audio_0", "mlp_audio_1"):
            out.append("mlp_audio." + ("0" if p.endswith("0") else "2"))
        elif p in ("mlp_time_0", "mlp_time_1"):
            out.append("mlp_time." + ("1" if p.endswith("0") else "3"))
        elif p in ("mlp_cond_0", "mlp_cond_1"):
            out.append("mlp_cond." + ("0" if p.endswith("0") else "2"))
        elif p == "feature_extractor_a":
            out.append("feature_extractor_a")
        elif p in ("modulation", "modulation_x", "modulation_a"):
            out.append(f"{p}.1")  # Sequential(SiLU, Linear): params live at [1]
        elif p == "to_qkv":
            out.append("to_qkv")
        elif p in ("q_norm", "k_norm", "q_x_norm", "k_x_norm", "q_a_norm", "k_a_norm"):
            out.append(p)
        elif p == "gamma":
            out.append("gamma")
        elif p == "final":
            nxt = parts[i + 1]
            out.append("final." + ("modulation.1" if nxt == "modulation" else "linear"))
            i += 1
        elif p == "postprocess":
            out.append("postprocess")
        # --------------------------------------------- MMDiT (reference mmdit.py)
        elif p in ("emb_x", "emb_a"):
            out.append(f"{p}.proj")
            if parts[i + 1].startswith("Conv_"):
                i += 1  # our PatchEmbedding holds one anonymous Conv_0
        elif p in ("mlp_x", "mlp_a"):
            nxt = parts[i + 1]
            out.append(f"{p}." + {"Dense_0": "0", "Dense_1": "2"}[nxt])
            i += 1
        elif p == "mlp_time":
            nxt = parts[i + 1]
            out.append("mlp_time.1." + {"Dense_0": "0", "Dense_1": "2"}[nxt])
            i += 1
        elif p == "mlp_cond_in":
            out.append("mlp_cond.0")
        elif p == "mlp_cond":
            nxt = parts[i + 1]
            out.append("mlp_cond.1." + {"Dense_0": "0", "Dense_1": "2"}[nxt])
            i += 1
        elif p in ("attn_out_x", "attn_out_a"):
            out.append(p)
        elif p.startswith("to_") and p.endswith(("_x", "_a")):
            out.append(p)  # to_{q,k,v}_{x,a}
        elif p == "final_modulation":
            out.append("final_layer.modulation.1")
        elif p == "final_linear":
            out.append("final_layer.linear")
        elif p == "out":
            out.append("out")
        # -------------------------------------------------------------- leaves
        elif p in ("kernel", "scale"):
            out.append("weight")
        elif p == "bias":
            out.append("bias")
        else:
            raise KeyError(f"unmapped path component {p!r} in {path}")
        i += 1
    return ".".join(out)


def convert_reference_state_dict(sd: Dict[str, np.ndarray], params_like: Any) -> Any:
    """Fill a flax UNet param tree (arrays or ShapeDtypeStructs) with the
    reference torch weights, transposing layouts. Raises KeyError on an
    unmapped path and ValueError on a shape mismatch."""

    def convert(kp, v):
        path = "/".join(str(getattr(k, "key", k)) for k in kp)
        key = resolve_reference_key(path, sd)
        if key not in sd:
            raise KeyError(f"reference checkpoint is missing {key!r} (for our {path})")
        w = np.asarray(sd[key])
        if key.endswith("gamma") and w.ndim == 3:
            # MultiHeadRMSNorm gamma: torch (heads, 1, dim) -> ours (heads, dim)
            w = w[:, 0, :]
        elif v.ndim == 3 and w.ndim == 3:  # torch conv (out, in, k) -> flax (k, in, out)
            w = w.transpose(2, 1, 0)
        elif v.ndim == 2 and w.ndim == 3:  # torch 1x1 conv -> flax Dense
            w = w[:, :, 0].T
        elif v.ndim == 2 and w.ndim == 2:  # torch linear (out, in) -> flax (in, out)
            w = w.T
        if w.shape != v.shape:
            raise ValueError(f"{path}: reference {key!r} has shape {w.shape}, expected {v.shape}")
        return np.asarray(w, dtype=v.dtype)

    return jax.tree_util.tree_map_with_path(convert, params_like)


def load_torch_checkpoint(path: Path) -> Dict[str, np.ndarray]:
    """Read a reference checkpoint into a numpy state dict.

    ``.safetensors``: read directly (torch only needed if it holds bf16).
    ``.pt``: ``torch.load`` and unwrap ``model_state_dict`` (reference
    trainer.py:166-171).
    """
    path = Path(path)
    if path.suffix == ".safetensors":
        try:
            from safetensors.numpy import load_file

            return strip_reference_prefixes(load_file(str(path)))
        except Exception:
            from safetensors.torch import load_file as load_torch

            sd = load_torch(str(path))
            return strip_reference_prefixes({k: v.float().numpy() for k, v in sd.items()})
    import torch

    ckpt = torch.load(str(path), map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    return strip_reference_prefixes(
        {k: v.float().numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    )
