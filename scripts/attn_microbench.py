"""Micro-benchmark the flash-attention kernels at production shapes.

Times the Pallas forward and the fused backward in isolation so kernel
changes can be A/B'd in seconds instead of through a multi-minute train-step
compile. Prints one JSON line per shape with achieved TF/s against the
matmul-FLOP count (fwd: QK^T + PV = 4*B*H*T*S*D; bwd: the fused one-sweep
kernel's 5 block matmuls = 2.5x fwd).

Usage (real chip):   python scripts/attn_microbench.py
Tiny CPU smoke:      JAX_PLATFORMS=cpu python scripts/attn_microbench.py --cpu-smoke

Axon-tunnel gotchas handled here: the kernel is applied CHAIN times inside
one jit (each iteration feeding the previous output back in) so per-call
dispatch/RTT amortizes away; the repeat-call result cache is dodged by a
per-rep input scale; sync fetches a SINGLE element (a full-array host read
moves tens of MB through the ~25 ms-RTT tunnel and was measured at seconds
per rep — it times the tunnel, not the kernel).
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
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--chain", type=int, default=8, help="kernel applications per timed call")
    ap.add_argument("--rope", action="store_true", help="bench the fused-RoPE training path")
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
    # (T, heads) with kv_heads=1, D=64; plus the fullsong serving shape and
    # the full-MHA (H == Kv, timestep-fold) shapes the DiT/MMDiT backbones
    # run. Tuple = (B, T, H, Kv, D, with_grad) — the fullsong serving shape
    # is inference-only: its fused-backward dq-partial stack would not fit
    # HBM at T=22656 anyway (177 kv blocks), and nothing differentiates it
    shapes = (
        [(1, 256, 4, 1, 64, True)] if args.cpu_smoke else [
            (4, 4096, 16, 1, 64, True),  # UNet level 0 transformers
            (4, 2048, 16, 1, 64, True),  # level 1
            (4, 1024, 16, 1, 64, True),  # level 2
            (1, 22656, 16, 1, 64, False),  # fullsong gen (dim_h=128 model uses same D)
            (4, 4096, 8, 8, 64, True),  # DiT dim_h=512: full MHA -> timestep fold
            (4, 1024, 8, 2, 64, True),  # MMDiT dim_h=512 kv_heads=2, patch 4
        ]
    )
    chain = 1 if args.cpu_smoke else args.chain

    for B, T, H, Kv, D, with_grad in shapes:
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(0, 1, (B, T, H, D)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(0, 1, (B, T, Kv, D)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(0, 1, (B, T, Kv, D)), jnp.bfloat16)
        rope_kw = {}
        if args.rope:
            from osufusion_tpu.ops.rope import rope_tables

            rope_kw = {"rope": rope_tables(T, D, scale_base=float(T))}
        flash = lambda q, k, v: flash_attention(q, k, v, **rope_kw)

        # chain the kernel: iteration i feeds the (renormalized) previous
        # output back as q, so one dispatch times `chain` kernel runs
        # back-to-back; timing the DIFFERENCE between a 2x-chain and a 1x-
        # chain call cancels both the per-dispatch RTT (~25 ms through the
        # axon tunnel) and the first/last transfer — what remains is the
        # pure marginal kernel cost. The scale stays in q's dtype (a f32
        # scalar would silently promote q) and varies per rep to dodge the
        # result cache.
        def mk_fwd(n):
            @jax.jit
            def fwd(s, q, k, v):
                for _ in range(n):
                    q = flash(q * s.astype(q.dtype), k, v)
                return q[0, 0, 0, 0]

            return fwd

        grad_1 = jax.grad(
            lambda qkv, s: (
                flash(qkv[0] * s.astype(qkv[0].dtype), qkv[1], qkv[2]).astype(jnp.float32) ** 2
            ).sum(),
            argnums=0,
        )

        def mk_grad(n):
            @jax.jit
            def grad(s, q, k, v):
                for _ in range(n):
                    q, k, v = grad_1((q, k, v), s)
                    q, k, v = q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)
                return q[0, 0, 0, 0]

            return grad

        def run(mk, *xs):
            def best(fn):
                ts = []
                for i in range(args.reps):
                    s = jnp.bfloat16(1.0 + i / 256.0)
                    t0 = time.perf_counter()
                    _ = float(fn(s, *xs))  # scalar host read = sync, no bulk transfer
                    ts.append(time.perf_counter() - t0)
                return min(ts[1:]) if len(ts) > 1 else ts[0]  # drop compile rep
            if chain == 1:
                return best(mk(1))
            return (best(mk(2 * chain)) - best(mk(chain))) / chain

        ctx = pltpu.force_tpu_interpret_mode() if args.cpu_smoke else contextlib.nullcontext()
        with ctx:
            t_fwd = run(mk_fwd, q, k, v)
            t_grad = run(mk_grad, q, k, v) if with_grad else float("nan")

        f_fwd = 4.0 * B * H * T * T * D
        # the timed grad executes the custom_vjp FORWARD rule (1.0x fwd) plus
        # the fused one-sweep backward (5 block matmuls = 2.5x fwd)
        f_grad = 3.5 * f_fwd
        out = {
            "shape": [B, T, H, Kv, D],
            "fwd_ms": round(t_fwd * 1e3, 2),
            "fwd_tfs": round(f_fwd / t_fwd / 1e12, 1),
        }
        if with_grad:
            out.update(
                grad_ms=round(t_grad * 1e3, 2),
                grad_tfs=round(f_grad / t_grad / 1e12, 1),
                bwd_only_ms_est=round((t_grad - t_fwd) * 1e3, 2),
                bwd_only_tfs_est=round(2.5 * f_fwd / max(t_grad - t_fwd, 1e-9) / 1e12, 1),
            )
        print(json.dumps(out))


if __name__ == "__main__":
    main()
