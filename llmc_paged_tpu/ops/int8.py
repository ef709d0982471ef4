"""Weight-only INT8: per-output-channel quantization + fused
dequant-matmul Pallas kernel (BASELINE config 4 / north-star INT8 path).

Decode is weight-bandwidth-bound, so INT8 weights cut the per-step HBM
traffic 4x vs fp32. The fused kernel streams int8 weight tiles HBM→VMEM,
multiplies against the activations at fp32 precision (int8 values are
exact in fp32 — quantization error comes only from the quantize step), and
applies the per-channel scale once at the end:

    out[b, oc] = s[oc] * sum_ic x[b, ic] * wq[oc, ic]     (+ bias outside)

The XLA fallback (`int8_linear_xla`) computes the same expression; it
materialises dequantized weights, which XLA usually fuses, but the Pallas
version guarantees int8-sized weight reads.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_per_row(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-output-channel (row) int8 quantization.
    w: (OC, IC) float → (wq int8 (OC, IC), scales f32 (OC,)).
    Delegates to kv.layouts.quantize_rows so weight and KV quantization
    share ONE formula (changing the scheme in one place changes both)."""
    from llmc_paged_tpu.kv.layouts import quantize_rows

    assert w.dtype != jnp.int8, \
        "already quantized — re-quantizing would overwrite the scales"
    return quantize_rows(w)


def dequantize(wq: jax.Array, scale: jax.Array) -> jax.Array:
    return wq.astype(jnp.float32) * scale[:, None]


def pad_weight_for_tpu(wq: jax.Array, scale: jax.Array, multiple: int = 128
                       ) -> Tuple[jax.Array, jax.Array]:
    """Zero-pad a quantized (OC, IC) weight to 128-multiples on BOTH dims
    so the fused kernel always gets Mosaic-aligned tiles (GPT-2 1.5B's
    1600/4800/6400 channels have no 128-multiple divisors; the unaligned
    escape-hatch kernel measured ~2x slower end-to-end). Padded out rows
    produce zeros that callers slice off (int8_linear slices by the bias
    length; the logits path slices to vocab_size); padded in columns
    multiply zero-padded activations."""
    oc, ic = wq.shape
    po, pi = (-oc) % multiple, (-ic) % multiple
    if po or pi:
        wq = jnp.pad(wq, ((0, po), (0, pi)))
        scale = jnp.pad(scale, (0, po), constant_values=1.0)
    return wq, scale


def int8_linear_xla(x: jax.Array, wq: jax.Array, scale: jax.Array,
                    b: jax.Array | None = None) -> jax.Array:
    """Reference/fallback: x(..., IC) @ dequant(wq)(OC, IC)^T + b."""
    out = jax.lax.dot_general(
        x, wq.astype(x.dtype),
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=x.dtype)
    out = out * scale.astype(x.dtype)
    if b is not None:
        out = out + b
    return out


def _int8_matmul_kernel(x_ref, wq_ref, s_ref, out_ref, acc_ref, *,
                        bf16_compute: bool):
    j = pl.program_id(2)
    nj = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]                                 # (RT, ICT) f32
    if bf16_compute:
        # int8 weight values are EXACT in bf16 (8-bit mantissa covers
        # ±127); the multiply runs single-pass on the MXU with f32
        # accumulation. Only the activation loses bits (f32 → bf16) —
        # the same rounding class as the bf16 serving mode, covered by
        # the loss-delta gate. The fp32 path (bf16_compute=False) keeps
        # the multiply exact for oracle tests.
        x = x.astype(jnp.bfloat16)
        w = wq_ref[...].astype(jnp.bfloat16)
        prec = jax.lax.Precision.DEFAULT
    else:
        w = wq_ref[...].astype(jnp.float32)
        prec = jax.lax.Precision.HIGHEST
    acc_ref[...] += jax.lax.dot_general(
        x, w, dimension_numbers=(((1,), (1,)), ((), ())),
        precision=prec,
        preferred_element_type=jnp.float32)

    @pl.when(j == nj - 1)
    def _():
        scaled = acc_ref[...] * s_ref[...][:, 0][None, :]
        out_ref[...] = scaled.reshape(out_ref.shape)


# escape-hatch OC tiles for UNPADDED weights only (128-multiples are
# always claimed first by the divisor scan in _pick_oc_tile)
_OC_CANDS = (1600, 1200, 960, 800, 400, 320, 200, 192, 96, 64, 32, 16, 8)
_IC_CANDS = (4096, 3072, 2048, 1536, 1280, 1024, 768, 640, 512, 384, 256,
             128)


def _pick_oc_tile(oc: int) -> Tuple[int, bool]:
    """Pick the OC tile. Returns (OCT, aligned): aligned means OCT is a
    multiple of 128 so the (B, OC) output can be tiled directly. Weights
    quantized through quantize_params are PADDED to 128-multiples
    (pad_weight_for_tpu), so the aligned path is the norm; the unaligned
    3D-output escape hatch remains for raw unpadded weights."""
    # largest 128-multiple divisor (bounded by VMEM-friendly 4096)
    for c in range(min(oc, 4096) // 128 * 128, 127, -128):
        if oc % c == 0:
            return c, True
    for c in _OC_CANDS:
        if oc % c == 0:
            return c, False
    return oc, False


def _pick_ic_tile(ic: int, oct_: int, rt: int,
                  vmem_budget: int = 16 << 20) -> int:
    """Last block dim: Mosaic wants a multiple of 128 or the full dim.
    Prefer the full row when the WHOLE working set fits the VMEM budget —
    fragmented IC tiles measured badly at 1.5B shapes (OCT=2432/ICT=128 =
    13 accumulation grid steps cost ~7 ms/step over bf16). The budget
    counts double-buffered int8 weights AND the RT-scaled x/out/acc f32
    buffers (many-row prefill calls would otherwise oversubscribe VMEM on
    16MB-class cores)."""
    def fits(ict: int) -> bool:
        weights = 2 * oct_ * ict              # double-buffered int8
        xb = 2 * rt * ict * 4                 # double-buffered x
        ob = 3 * rt * oct_ * 4                # out blocks + accumulator
        return weights + xb + ob <= vmem_budget

    if fits(ic):
        return ic
    # largest 128-multiple divisor that fits the budget (scanning ALL of
    # them, not just _IC_CANDS, so the fallback never returns an unchecked
    # full row that could oversubscribe VMEM and fail in Mosaic)
    for c in range(min(ic, 4096) // 128 * 128, 127, -128):
        if ic % c == 0 and fits(c):
            return c
    # no 128-multiple divisor fits: the full (unfit) row is the only legal
    # Mosaic block left — caller-side RT is capped at 64 so this is
    # unreachable for GPT-2 shapes
    return 128 if (ic % 128 == 0 and fits(128)) else ic


def _pad_rows(x: jax.Array, multiple: int = 8) -> Tuple[jax.Array, int]:
    rows = x.shape[0]
    pad = (-rows) % multiple
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return x, rows


def int8_linear(x: jax.Array, wq: jax.Array, scale: jax.Array,
                b: jax.Array | None = None,
                interpret: bool | None = None,
                bf16_compute: bool = True) -> jax.Array:
    """The serving int8 linear: XLA dot with the int8→bf16 dequant FUSED
    into the operand stream.

    Measured at 1.5B decode shapes inside one big program
    (probe_decode matmul_suite): XLA streams the int8 weight bytes and
    converts in the gemm pipeline at 625 GB/s effective — slightly ahead
    of the fused Pallas kernel (599 GB/s) — and, decisively, costs ZERO
    custom calls: with the Pallas kernel the full decode chunk ran
    ~1.8 ms/step SLOWER than these isolated numbers predict (4 extra
    custom calls per layer serialize against the attention kernel),
    while the XLA form schedules freely. The Pallas kernel remains as
    `int8_matmul` for the kernel lab and the fp32-exact oracle mode.

    bf16_compute=True: bf16 multiply / f32 accumulate (int8 weights are
    exact in bf16; only the activation rounds — the same class as bf16
    serving, covered by the loss-delta gate). False: fp32-exact multiply
    for oracle comparisons. Handles weights padded by pad_weight_for_tpu:
    activations zero-pad to the weight's IC and, when a bias is given,
    the output is sliced back to the bias length."""
    del interpret  # the XLA path runs identically on all backends
    if x.shape[-1] < wq.shape[1]:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, wq.shape[1] - x.shape[-1])]
        x = jnp.pad(x, pad)
    if bf16_compute:
        out = jax.lax.dot_general(
            x.astype(jnp.bfloat16), wq.astype(jnp.bfloat16),
            dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        out = out * scale
    else:
        out = jax.lax.dot_general(
            x.astype(jnp.float32), wq.astype(jnp.float32),
            dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        out = out * scale
    if b is not None:
        out = out[..., : b.shape[-1]] + b
    return out


@functools.partial(jax.jit, static_argnames=("interpret", "bf16_compute"))
def int8_matmul(x: jax.Array, wq: jax.Array, scale: jax.Array,
                interpret: bool = False,
                bf16_compute: bool = True) -> jax.Array:
    """Fused dequant-matmul: x (B, IC) f32 × wq (OC, IC) int8 → (B, OC) f32.
    Bias and activation fusions are left to XLA outside the kernel.
    bf16_compute=True (default, serving): bf16 multiply / f32 accumulate —
    the int8 weight side is exact; False: fully fp32-exact multiply for
    oracle comparisons."""
    B, IC = x.shape
    OC, _ = wq.shape
    OCT, aligned = _pick_oc_tile(OC)
    # cap the row tile at 64 so its out/acc buffers leave VMEM room for a
    # full-row weight tile (weight reads repeat per row tile, but >=64
    # rows amortize them); take the LARGEST sublane-aligned divisor so an
    # odd batch like 24 tiles as 24, not 8 (8 would re-read every weight
    # tile 3x) — callers pad rows to a multiple of 8 (_pad_rows)
    RT = next((c for c in range(min(B, 64) // 8 * 8, 7, -8) if B % c == 0),
              B)
    ICT = _pick_ic_tile(IC, OCT, RT)
    s2 = scale.reshape(OC, 1)
    grid = (B // RT, OC // OCT, IC // ICT)
    kwargs = dict(
        grid=grid,
        in_specs=[
            pl.BlockSpec((RT, ICT), lambda r, i, j: (r, j)),
            pl.BlockSpec((OCT, ICT), lambda r, i, j: (i, j)),
            pl.BlockSpec((OCT, 1), lambda r, i, j: (i, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((RT, OCT), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * OC * IC,
            bytes_accessed=OC * IC + B * IC * 4 + B * OC * 4 + OC * 4,
            transcendentals=0),
    )
    kern = functools.partial(_int8_matmul_kernel,
                             bf16_compute=bf16_compute)
    if aligned:
        return pl.pallas_call(
            kern,
            out_specs=pl.BlockSpec((RT, OCT), lambda r, i, j: (r, i)),
            out_shape=jax.ShapeDtypeStruct((B, OC), jnp.float32),
            **kwargs,
        )(x.astype(jnp.float32), wq, s2)
    # OCT not a 128-multiple (e.g. 1.5B's OC ∈ {1600, 4800}): emit a
    # (tiles, B, OCT) output whose block spans the whole minor axis
    # (Mosaic's "equal to the respective dimension" escape hatch), then
    # fold tiles back into OC.
    out3 = pl.pallas_call(
        kern,
        out_specs=pl.BlockSpec((1, RT, OCT), lambda r, i, j: (i, r, 0)),
        out_shape=jax.ShapeDtypeStruct((OC // OCT, B, OCT), jnp.float32),
        **kwargs,
    )(x.astype(jnp.float32), wq, s2)
    return out3.transpose(1, 0, 2).reshape(B, OC)


# ---- whole-model weight quantization ---------------------------------------

QUANT_KEYS = ("qkvw", "attprojw", "fcw", "fcprojw", "wte")


def quantize_params(params: Dict[str, jax.Array], keys=QUANT_KEYS
                    ) -> Dict[str, jax.Array]:
    """Quantize the matmul weights of a params pytree; adds '<k>_scale'
    entries. Per-layer stacked tensors get per-(layer, row) scales.
    Layernorms, biases and wpe stay float (the same split as the
    reference's bf16 checkpoints, train_gpt2.py:267-298)."""
    out = dict(params)
    for k in keys:
        w = params[k]
        if w.ndim == 2:
            wq, s = quantize_per_row(w)
            wq, s = pad_weight_for_tpu(wq, s)
        else:  # (L, OC, IC) → vmap over layers
            wq, s = jax.vmap(quantize_per_row)(w)
            wq, s = jax.vmap(pad_weight_for_tpu)(wq, s)
        out[k] = wq
        out[k + "_scale"] = s
    return out
