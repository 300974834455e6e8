"""Sweep flash-attention block sizes at the UNet's hot shapes."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import importlib
import time

import jax
import jax.numpy as jnp

import vgen_tpu  # noqa: F401

attn = importlib.import_module("vgen_tpu.ops.attention")

CASES = [
    ("c320 self  BH=160 S=1792 D=64", 160, 1792, 64),
    ("c640 self  BH=320 S=448  D=64", 320, 448, 64),
    ("temporal   BH=17920 S=16 D=64", 0, 0, 0),  # placeholder, skipped
]


def bench(name, fn, *args, n=30):
    @jax.jit
    def many(x0, *rest):
        def step(x, _):
            return fn(x, *rest).astype(x0.dtype), ()
        out, _ = jax.lax.scan(step, x0, None, length=n)
        return out

    o = jax.block_until_ready(many(*args))
    _ = float(o.astype(jnp.float32).mean())
    t0 = time.time()
    o = many(*args)
    _ = float(o.astype(jnp.float32).mean())
    print(f"{name:44s}: {(time.time() - t0) / n * 1e3:6.2f} ms")


def main():
    bh, s, d = 160, 1792, 64
    q = jnp.zeros((bh, s, d), jnp.bfloat16)
    scale = 1.0 / d ** 0.5
    for bq in (128, 256):
        for bk in (896, 1792, 2048):
            if bq > s or bk > s:
                continue
            try:
                bench(f"flash bq={bq} bk={bk}",
                      lambda x, _bq=bq, _bk=bk: attn._flash_fwd_tpu(
                          x, x, x, scale, bq=_bq, bk=_bk)[0], q)
            except Exception as e:  # noqa: BLE001
                print(f"flash bq={bq} bk={bk}: FAILED {type(e).__name__}")


if __name__ == "__main__":
    main()

# Negative result (round 2): folding log2(e) into the scale and using
# exp2 in the kernel (base-2 online softmax) measured 6.9-7.3 ms vs
# 6.6 ms for the exp version at S=1792 bf16 — no win; Mosaic's exp
# lowering is already exp2-based. Reverted.
