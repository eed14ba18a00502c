"""MXU-first generator: conv-transposes as single im2col matmuls.

The projection defense runs the frozen generator (and its z-gradient) ~2000x
per reconstructed image — it is THE hot path of the framework (reference:
models/gan.py::reconstruct; SURVEY.md section 3.5). XLA's generic lowering of
small-spatial conv-transposes leaves MXU throughput on the table, so this
module rewrites the inference generator as pure matmuls:

  1. BatchNorm (inference mode) is FOLDED into the preceding layer's weights
     on the host — the compiled program has no normalization ops at all.
  2. A stride-2 kxk conv-transpose from [N,H,W,Cin] to [N,2H,2W,Cout] is
     computed as ONE matmul: gather the 3x3 input neighborhood (im2col via
     9 static padded shifts), multiply [N*H*W, 9*Cin] @ [9*Cin, 4*Cout]
     where the weight matrix holds the kernel taps rearranged per output
     phase (2x2 sub-pixel positions, zero where a tap doesn't exist), then
     depth-to-space the [N,H,W,2,2,Cout] result. Autodiff through this is
     again matmuls + static slices, so the z-gradient inherits the layout.
  3. The final conv-transpose to `out_channels` (1-4 output columns — too
     narrow to feed the MXU as a matmul) stays on lax.conv_transpose; it is
     ~1% of generator FLOPs.

Equivalence to the Flax generator (models/generator.py) is tested to fp
tolerance in tests/test_matmul_generator.py.
"""

from __future__ import annotations

from typing import Any, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from defensegan_tpu.models.generator import Generator

EPS = 1e-5  # flax BatchNorm default epsilon


class DeconvMM(NamedTuple):
    """One conv-transpose block packed as an im2col matmul."""

    w: jnp.ndarray          # [9*Cin, 4*Cout] phase-packed taps (BN folded)
    b: jnp.ndarray          # [Cout] bias (BN folded)
    relu: bool


class PackedGenerator(NamedTuple):
    """Inference-packed generator params (BN folded everywhere)."""

    fc_w: jnp.ndarray       # [z_dim, S*S*C0] (BN folded)
    fc_b: jnp.ndarray       # [S*S*C0]
    base_hw: int
    deconvs: Tuple[DeconvMM, ...]
    out_kernel: jnp.ndarray  # [k, k, Clast, out_c] final conv-transpose
    out_bias: jnp.ndarray
    kernel: int
    dtype: Any


def _bn_fold(scale_gamma, bias_beta, mean, var):
    s = scale_gamma / np.sqrt(var + EPS)
    return s, bias_beta - mean * s


def _pack_deconv(kernel: np.ndarray, bias: np.ndarray, s: np.ndarray,
                 t: np.ndarray, pad_lo: int) -> Tuple[np.ndarray, np.ndarray]:
    """Rearrange a [k,k,Cin,Cout] stride-2 conv-transpose kernel into the
    phase-packed [9*Cin, 4*Cout] matmul weight.

    Derivation: lax.conv_transpose = correlation of the stride-2 lhs-dilated
    input with the HWIO kernel (no flip), left-padded by pad_lo (= 3 for k=5,
    s=2, SAME: pad_a = ceil((k+s-2)/2) in lax._conv_transpose_padding). So
    out[y] = sum_dy K[dy] * dilated[y + dy - pad_lo], and with y = 2i + py
    the nonzero (even) dilated positions give input offset
        ay = (py + dy - pad_lo) / 2  in {-1, 0, 1}   (k<=5, stride 2),
    i.e. taps dy = pad_lo - py + 2*ay. Exact-match vs flax is tested in
    tests/test_matmul_generator.py.
    """
    k = kernel.shape[0]
    c_in, c_out = kernel.shape[2], kernel.shape[3]
    w = np.zeros((3, 3, c_in, 2, 2, c_out), kernel.dtype)
    for py in range(2):
        for px in range(2):
            for ay in (-1, 0, 1):
                dy = pad_lo - py + 2 * ay
                if not (0 <= dy < k):
                    continue
                for ax in (-1, 0, 1):
                    dx = pad_lo - px + 2 * ax
                    if not (0 <= dx < k):
                        continue
                    w[ay + 1, ax + 1, :, py, px, :] = kernel[dy, dx]
    # fold BN output scale
    w = w * s[None, None, None, None, None, :]
    b = bias * s + t
    return w.reshape(9 * c_in, 4 * c_out), b


def pack_generator(gen: Generator, variables: dict,
                   dtype=jnp.bfloat16) -> PackedGenerator:
    """Fold BN + rearrange kernels; host-side, done once per checkpoint."""
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables.get("batch_stats", {}))

    # fc + bn_in
    s, t = _bn_fold(params["bn_in"]["scale"], params["bn_in"]["bias"],
                    stats["bn_in"]["mean"], stats["bn_in"]["var"])
    c0 = gen.channels[0]
    fc_w = params["fc_in"]["kernel"]          # [z, S*S*C0]
    fc_b = params["fc_in"]["bias"]
    # channel c is the fastest-varying index of the fc output
    s_full = np.tile(s, gen.base_hw * gen.base_hw)
    t_full = np.tile(t, gen.base_hw * gen.base_hw)
    fc_w = fc_w * s_full[None, :]
    fc_b = fc_b * s_full + t_full

    deconvs: List[DeconvMM] = []
    # SAME-padding stride-2 conv_transpose: lax pad_a = ceil((k+s-2)/2)
    k, s = gen.kernel, 2
    pad_lo = k - 1 if s > k - 1 else int(np.ceil((k + s - 2) / 2))
    for i, c in enumerate(gen.channels[1:]):
        kern = params[f"deconv_{i}"]["kernel"]     # [k,k,Cin,Cout]
        bias = params[f"deconv_{i}"]["bias"]
        s, t = _bn_fold(params[f"bn_{i}"]["scale"], params[f"bn_{i}"]["bias"],
                        stats[f"bn_{i}"]["mean"], stats[f"bn_{i}"]["var"])
        w, b = _pack_deconv(kern, bias, s, t, pad_lo)
        deconvs.append(DeconvMM(w=jnp.asarray(w, dtype),
                                b=jnp.asarray(b, jnp.float32), relu=True))

    return PackedGenerator(
        fc_w=jnp.asarray(fc_w, dtype),
        fc_b=jnp.asarray(fc_b, jnp.float32),
        base_hw=gen.base_hw,
        deconvs=tuple(deconvs),
        out_kernel=jnp.asarray(params["deconv_out"]["kernel"], dtype),
        out_bias=jnp.asarray(params["deconv_out"]["bias"], jnp.float32),
        kernel=gen.kernel,
        dtype=dtype,
    )


def _neighborhood(h: jnp.ndarray) -> jnp.ndarray:
    """[N,H,W,C] -> [N,H,W,9,C]: 3x3 shifted copies (zero-padded edges)."""
    n, hh, ww, c = h.shape
    padded = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
    views = [padded[:, ay:ay + hh, ax:ax + ww, :]
             for ay in range(3) for ax in range(3)]
    return jnp.stack(views, axis=3)


def _deconv_mm(h: jnp.ndarray, layer: DeconvMM, dtype) -> jnp.ndarray:
    """[N,H,W,Cin] -> [N,2H,2W,Cout] via one matmul + depth-to-space."""
    n, hh, ww, c_in = h.shape
    c_out = layer.b.shape[0]
    patches = _neighborhood(h).reshape(n * hh * ww, 9 * c_in)
    out = jnp.dot(patches.astype(dtype), layer.w,
                  preferred_element_type=jnp.float32)
    out = out.reshape(n, hh, ww, 2, 2, c_out) + layer.b
    # depth-to-space: [N,H,2,W,2,C] -> [N,2H,2W,C]
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * hh, 2 * ww, c_out)
    if layer.relu:
        out = jax.nn.relu(out)
    return out.astype(dtype)


def apply_packed(packed: PackedGenerator, z: jnp.ndarray) -> jnp.ndarray:
    """Same function as Generator.apply(train=False): z -> tanh image."""
    dtype = packed.dtype
    n = z.shape[0]
    h = jnp.dot(z.astype(dtype), packed.fc_w,
                preferred_element_type=jnp.float32) + packed.fc_b
    h = jax.nn.relu(h).astype(dtype)
    h = h.reshape(n, packed.base_hw, packed.base_hw, -1)
    for layer in packed.deconvs:
        h = _deconv_mm(h, layer, dtype)
    # keep the conv in the compute dtype end-to-end: a f32
    # preferred_element_type here would make the VJP feed a f32 cotangent
    # into a bf16-kernel conv, which lax.conv rejects
    out = jax.lax.conv_transpose(
        h, packed.out_kernel, strides=(2, 2), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = out.astype(jnp.float32) + packed.out_bias
    return jnp.tanh(out).astype(jnp.float32)
