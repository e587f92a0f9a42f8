"""Alternative lowerings for HAT's thin-channel CAB conv pair.

The CAB branch (3x3 C->C/3 -> GELU -> 3x3 -> C, hat_arch.py:61-74 in the
reference) is HAT-L's largest non-kernel cost: PERF.md's r3 roofline puts
the 36 CABs at ~411 ms of the 1074 ms whole-image HAT forward, running at
~25% MXU utilization — XLA's conv lowering keeps the 60/180-wide channel
dims on the 128-lane grid, wasting most of each pass. These reformulations
trade that for matmul shapes the MXU tiles well:

  conv    — jax.lax.conv_general_dilated NHWC (XLA's native lowering)
  shift9  — sum of 9 shifted pointwise matmuls (one per tap)
  im2col  — concat the 9 shifted views -> one [*, 9*Cin] @ [9*Cin, Cout]
            matmul (K = 1620 for conv1: 97% of the 128-padded tile)
  cnmajor — transpose to channel-major [C, N_px]: pixels ride the lane
            dim (perfectly tiled), channels sit in sublanes

All variants are exact reformulations of SAME-padded 3x3 convolution
(parity-tested in tests/test_convchain.py); the production pick is
FREQFUSION_CAB_IMPL (default conv until a TPU probe crowns a winner —
scripts/probe_cab.py measures all four at the bench shape).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


def _shift9(x):
    """The 9 zero-padded shifted views of [B,H,W,C], tap order (dy, dx)."""
    b, h, w, c = x.shape
    xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)])
    return [xp[:, dy:dy + h, dx:dx + w, :]
            for dy in range(3) for dx in range(3)]


def _conv_xla(x, w, b):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b


def _conv_shift9(x, w, b):
    acc = None
    for i, tv in enumerate(_shift9(x)):
        contrib = jnp.einsum("bhwc,cd->bhwd", tv, w[i // 3, i % 3],
                             preferred_element_type=jnp.float32)
        acc = contrib if acc is None else acc + contrib
    return acc.astype(x.dtype) + b


def _conv_im2col(x, w, b):
    cin = x.shape[-1]
    patches = jnp.concatenate(_shift9(x), axis=-1)  # [B,H,W,9*cin]
    out = jnp.einsum("bhwk,kd->bhwd", patches, w.reshape(9 * cin, -1),
                     preferred_element_type=jnp.float32)
    return out.astype(x.dtype) + b


def _chain_cnmajor(x, w1, b1, w2, b2):
    """Both convs + GELU in channel-major [B, C, N] layout: one transpose
    in, one out, pixels on the lane grid throughout."""
    b_, h, w_, cin = x.shape
    mid, cout = w1.shape[-1], w2.shape[-1]
    n = h * w_

    def conv(tc, wk, cin_, cout_):  # tc: [B, cin_, N]
        imgp = jnp.pad(tc.reshape(b_, cin_, h, w_),
                       [(0, 0), (0, 0), (1, 1), (1, 1)])
        acc = None
        for dy in range(3):
            for dx in range(3):
                tv = imgp[:, :, dy:dy + h, dx:dx + w_].reshape(b_, cin_, n)
                contrib = jnp.einsum("oc,bcn->bon", wk[dy, dx].T, tv,
                                     preferred_element_type=jnp.float32)
                acc = contrib if acc is None else acc + contrib
        return acc.astype(tc.dtype)

    tc = jnp.transpose(x, (0, 3, 1, 2)).reshape(b_, cin, n)
    tc = _gelu(conv(tc, w1, cin, mid) + b1[None, :, None])
    tc = conv(tc.astype(x.dtype), w2, mid, cout) + b2[None, :, None]
    return jnp.transpose(tc.reshape(b_, cout, h, w_), (0, 2, 3, 1))


_CONVS = {"conv": _conv_xla, "shift9": _conv_shift9, "im2col": _conv_im2col}


def cab_impl() -> str:
    return os.environ.get("FREQFUSION_CAB_IMPL", "conv")


def conv3x3_chain(x, w1, b1, w2, b2, impl: str | None = None):
    """conv3x3(GELU(conv3x3(x, w1)+b1), w2)+b2 under the chosen lowering.

    w1: [3,3,Cin,Mid], w2: [3,3,Mid,Cout]; SAME zero padding, NHWC."""
    impl = impl or cab_impl()
    if impl == "cnmajor":
        return _chain_cnmajor(x, w1, b1, w2, b2)
    conv = _CONVS[impl]
    return conv(_gelu(conv(x, w1, b1)).astype(x.dtype), w2, b2)
