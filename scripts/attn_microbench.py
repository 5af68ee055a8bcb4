"""Micro-benchmark the flash-attention kernels at production shapes.

Times the Pallas forward and the fused backward in isolation so kernel
changes can be A/B'd in seconds instead of through a 4-minute train-step
compile. Prints one JSON line per shape with achieved TF/s against the
matmul-FLOP count (fwd: QK^T + PV = 4*B*H*T*S*D; bwd: the fused one-sweep
kernel's 5 block matmuls = 2.5x fwd).

Usage (real chip):   python scripts/attn_microbench.py
Tiny CPU smoke:      JAX_PLATFORMS=cpu python scripts/attn_microbench.py --cpu-smoke

Axon-tunnel gotchas handled here: result-cache dodged by varying an input
scalar per rep; sync forced by a host read (block_until_ready is unreliable
through the tunnel, CLAUDE.md).
"""

from __future__ import annotations

import argparse
import contextlib
import json
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu-smoke", action="store_true", help="tiny shapes, interpret mode, CPU")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    if args.cpu_smoke:
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu_smoke:
        jax.config.update("jax_platforms", "cpu")
        try:
            jax.extend.backend.clear_backends()
        except Exception:
            pass
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from osufusion_tpu.ops.pallas_attention import flash_attention

    # production train-step sites (dim_h=512 UNet, B=4, T=4096): per-level
    # (T, heads) with kv_heads=1, D=64; plus the fullsong serving shape
    shapes = (
        [(1, 256, 4, 64)] if args.cpu_smoke else [
            (4, 4096, 16, 64),  # level 0 transformers
            (4, 2048, 16, 64),  # level 1
            (4, 1024, 16, 64),  # level 2
            (1, 22656, 16, 64),  # fullsong gen (dim_h=128 model uses same D)
        ]
    )

    for B, T, H, D in shapes:
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(0, 1, (B, T, H, D)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(0, 1, (B, T, 1, D)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(0, 1, (B, T, 1, D)), jnp.bfloat16)

        # the scale stays in q's dtype — a f32 scalar would silently promote
        # the whole q to f32 and time the wrong kernel; 1 + i/256 increments
        # are exactly representable in bf16
        fwd = jax.jit(lambda s, q, k, v: flash_attention(q * s.astype(q.dtype), k, v))
        loss = jax.jit(
            jax.grad(
                lambda qkv, s: (
                    flash_attention(qkv[0] * s.astype(qkv[0].dtype), qkv[1], qkv[2]).astype(jnp.float32) ** 2
                ).sum(),
                argnums=0,
            )
        )

        def run(fn, *xs):
            ts = []
            for i in range(args.reps):
                s = jnp.float32(1.0 + i / 256.0)  # dodge the repeat-call result cache
                t0 = time.perf_counter()
                out = fn(s, *xs) if fn is fwd else fn(xs, s)
                _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])  # host read = sync
                ts.append(time.perf_counter() - t0)
            return min(ts[1:]) if len(ts) > 1 else ts[0]  # drop compile rep

        ctx = pltpu.force_tpu_interpret_mode() if args.cpu_smoke else contextlib.nullcontext()
        with ctx:
            t_fwd = run(fwd, q, k, v)
            t_grad = run(loss, q, k, v)

        f_fwd = 4.0 * B * H * T * T * D
        # the timed grad executes the custom_vjp FORWARD rule (1.0x fwd) plus
        # the fused one-sweep backward (5 block matmuls = 2.5x fwd)
        f_grad = 3.5 * f_fwd
        print(
            json.dumps(
                {
                    "shape": [B, T, H, D],
                    "fwd_ms": round(t_fwd * 1e3, 2),
                    "fwd_tfs": round(f_fwd / t_fwd / 1e12, 1),
                    "grad_ms": round(t_grad * 1e3, 2),
                    "grad_tfs": round(f_grad / t_grad / 1e12, 1),
                    "bwd_only_ms_est": round((t_grad - t_fwd) * 1e3, 2),
                    "bwd_only_tfs_est": round(2.5 * f_fwd / max(t_grad - t_fwd, 1e-9) / 1e12, 1),
                }
            )
        )


if __name__ == "__main__":
    main()
