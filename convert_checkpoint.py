"""Migrate a reference (PyTorch) OsuFusion checkpoint into this framework.

Reads the reference's ``model.safetensors`` (trainer.py:143-145) or
``checkpoint.pt`` (:159-171), maps every weight onto the flax UNet tree
(name translation + layout transposes; see utils/torch_convert.py), and
writes ``model.safetensors`` + ``config.json`` that ``inference.py``,
``inference_gradio.py`` and ``trainer_peft.py`` load directly.

    python convert_checkpoint.py --torch-checkpoint ref/model.safetensors \
        --output-dir runs/migrated --model-dim 128 --model-type diffusion
"""

from __future__ import annotations

from argparse import ArgumentParser
from pathlib import Path

import jax
import numpy as np


def main() -> None:
    p = ArgumentParser()
    p.add_argument("--torch-checkpoint", type=Path, required=True, help=".safetensors or .pt")
    p.add_argument("--output-dir", type=Path, required=True)
    p.add_argument("--model-dim", type=int, default=128, help="dim_h the checkpoint was trained at (reference inference hardcodes 128)")
    p.add_argument("--model-type", type=str, default="diffusion", choices=["diffusion", "rectified-flow"])
    p.add_argument("--attn-context-len", type=int, default=4096)
    args = p.parse_args()

    from osufusion_tpu.config import Config, DiffusionConfig, ModelConfig
    from osufusion_tpu.models import build_model
    from osufusion_tpu.utils.serialization import save_safetensors
    from osufusion_tpu.utils.torch_convert import (
        convert_reference_state_dict,
        load_torch_checkpoint,
    )

    cfg = Config(
        model=ModelConfig(dim_h=args.model_dim, attn_context_len=args.attn_context_len),
        diffusion=DiffusionConfig(objective=args.model_type),
    )
    model = build_model(cfg.model, cfg.diffusion)
    # abstract init: shapes/dtypes only, no compute
    params_like = jax.eval_shape(lambda: model.init_params(jax.random.PRNGKey(0)))

    sd = load_torch_checkpoint(args.torch_checkpoint)
    params = convert_reference_state_dict(sd, params_like)

    args.output_dir.mkdir(parents=True, exist_ok=True)
    save_safetensors(params, args.output_dir / "model.safetensors")
    cfg.save(args.output_dir / "config.json")
    n = sum(int(np.prod(v.shape)) for v in jax.tree.leaves(params))
    print(f"converted {len(sd)} reference tensors -> {args.output_dir}/model.safetensors ({n:,} params)")


if __name__ == "__main__":
    from osufusion_tpu.utils.platform import pin_platform_from_env

    pin_platform_from_env()
    main()
