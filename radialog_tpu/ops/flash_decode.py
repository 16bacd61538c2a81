"""Pallas TPU flash-decode over an int8 KV cache (single-token attention).

MXU design (the "block-diagonal q" trick). Per-head decode attention is a
batch of matvecs — per-head MXU matmuls are latency-bound (measured
~180GB/s) and a VPU dequant/multiply/reduce is vector-throughput-bound
(measured ~270GB/s). Instead, the cache stores K/V FLAT per token
((L, B, S, H*D) int8, per-token-per-head scales (L, B, S, H)) so each
(bs, H*D) block feeds the MXU with no relayout:

  * scores: one int8 x int8 -> int32 MXU matmul (NT contraction)
        (bs, H*D) x block_diag(q8) (H, H*D)  -> (bs, H)
    where block_diag(q8) has head h's 128 q values on row h at lanes
    [h*D, (h+1)*D) — built IN-KERNEL from the flat (1, H*D) q row by a
    sublane broadcast + the head-expansion mask (a lane-dense layout;
    the earlier XLA-side s8[B, H*D, H] materialization put H=32 on the
    minor dim and wasted 4x of every lane tile — 2.6 ms/step of fusion
    plus ~0.9 ms/step of padded qbd DMA at batch 56, docs/PERF.md
    per-op profile). The per-token k scale, per-head q scale and
    1/sqrt(D) fold in AFTER the matmul on the tiny (bs, H) result, so
    the VPU never touches a K element.
  * values: per-token v scales fold into the softmax weights
    (pv = p * v_scale, a (bs, H) op), V converts int8->bf16 (the only
    per-element VPU op left, 1 op/elem), then one bf16 MXU matmul
        pv^T (H, bs) @ (bs, H*D) -> (H, H*D)
    whose block diagonal (a masked sublane reduction) is the per-head
    output, accumulated flat as (1, H*D) under the online-softmax rescale.
  * head->lane broadcasts ((1, H) -> (1, H*D) for the softmax rescale and
    the final 1/l) go through one more tiny MXU matmul against the 0/1
    head-expansion mask E (h, H*D), E[c, j] = (j // D == c) — Mosaic has
    no (1, H) -> (1, H*D) repeat, and MXU cycles are free here.

The 32x MXU "waste" on the off-diagonal zeros is free: the kernel is HBM
bound and the MXU was idle. This is the quantized-serving DEFAULT cache
(apps/pipeline.py use_kv_int8): its teacher-forced logit error vs the
bf16 cache is 0.048 of the logit std at Vicuna-7B widths — statistically
identical to the accepted W8A8 weight default itself (0.049,
tools/measure_kv_logit_err.py / measure_quant.py). The halved cache
bytes both cut per-step traffic and move the batch OOM wall out; with
shared-prefix serving the single-chip map is b32 5.39 / b40 6.29 /
b48 6.69 reports/s (docs/PERF.md). The historical b28+ remat cliff
(XLA compressing the lane-padded scale buffers in the decode loop) is
fixed by the dense (..., 128)-lane scale layout (models/llama.py
KVCache); lane blocks beyond the live static-slot bound clamp their
index maps so their DMAs are elided.

Masking matches decode_bias_static_slot
(models/llama.py): kv slot j is valid iff j < length_b (prefill region) or
prompt_pad <= j <= prompt_pad + step (generated region). lengths /
prompt_pad / step arrive via scalar prefetch.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _process_block(k2d, ks_row, v2d, vs_row, valid, qbt, qs,
                   m_ref, l_ref, acc_ref, ef, scale):
    """One online-softmax accumulation over a KV block.

    k2d/v2d: (rows, H*D) int8; ks_row/vs_row: (rows, H) float scales;
    valid: (rows, H) bool; qbt: (H, H*D) block-diagonal int8 q (row c holds
    head c's 128 q values at lanes [c*D, (c+1)*D), zeros elsewhere — built
    ONCE PER LANE into VMEM scratch, see _kernel); qs: (1, H);
    ef: (H, H*D) f32 head-expansion mask (E[c, j] = j//D == c, also scratch).
    """
    # ---- scores on the int8 MXU, NT contraction over the H*D lanes:
    #      (rows, H*D) x (H, H*D) -> (rows, H) int32
    scores = jax.lax.dot_general(
        k2d, qbt, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32)
    # ks arrives bf16 (the cache stores bf16 scales to starve XLA's
    # remat-compression pass — see models/llama.py KVCache); fold in f32.
    scores = scores * ks_row.astype(jnp.float32) * qs * scale
    scores = jnp.where(valid, scores, NEG_INF)

    m_prev = m_ref[:]                         # (1, H)
    m_cur = jnp.max(scores, axis=0, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)           # (1, H)
    p = jnp.exp(scores - m_new)               # (rows, H)
    p = jnp.where(valid, p, 0.0)
    l_ref[:] = l_ref[:] * alpha + p.sum(axis=0, keepdims=True)
    m_ref[:] = m_new

    # ---- values on the bf16 MXU: pv^T @ V2d -> (H, H*D), keep block diag
    pv = (p * vs_row.astype(jnp.float32)).astype(jnp.bfloat16)
    vbf = v2d.astype(jnp.bfloat16)            # the one VPU pass
    mat = jax.lax.dot_general(
        pv, vbf, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)   # (H, H*D)
    block_o = jnp.sum(mat * ef, axis=0, keepdims=True)  # (1, H*D) per-head
    # (1, H) -> (1, H*D) lane broadcast via MXU: alpha @ E. f32, like the
    # _finish inv_l path — the denominator l is rescaled with f32 alpha, so
    # a bf16 numerator rescale would drift ~0.4% relative per KV block.
    alpha_exp = jax.lax.dot_general(
        alpha, ef,
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    acc_ref[:] = acc_ref[:] * alpha_exp + block_o


def _kernel(lens_ref,                       # scalar prefetch: (5B[+1],) int32
            *refs,
            bs: int, heads: int, head_dim: int, scale: float,
            n0: int = 0):
    """Per-lane validity is interval-encoded in the prefetched scalars
    (B = num lanes): slot s of lane b is valid iff

        s < lens[b]                                  (prompt region)
      | a1[b] <= s <= b1[b]                          (generated interval 1)
      | a2[b] <= s <= b2[b]                          (generated interval 2)

    layout [lens(B) | a1(B) | b1(B) | a2(B) | b2(B) | p0?]. The batch
    engine's static-slot mask is the special case a1=prompt_pad,
    b1=prompt_pad+step, interval 2 empty (a2=0, b2=-1); the RingBatcher's
    rotating generation window needs both intervals (it wraps the ring at
    most once). An empty interval MUST use b=-1 so the live-bound clamp
    ignores it.

    n0=1 adds a leading SHARED-PREFIX grid step: s_i == 0 accumulates the
    batch-wide int8 prefix block (k0/v0 (P0p, H*D), scales (P0p, SL); valid
    rows < p0, prefetched at lens_ref[5B]) before the per-lane cache blocks
    — the prefix bytes are DMA'd once (constant index map), not once per
    lane (decode/engine.py generate_shared_prefix, kv_int8 mode)."""
    if n0:
        (q8_ref, qs_ref, k8_ref, ks_ref, v8_ref, vs_ref,
         k0_ref, ks0_ref, v0_ref, vs0_ref,
         o_ref, m_ref, l_ref, acc_ref, qbt_ref, ef_ref) = refs
    else:
        (q8_ref, qs_ref, k8_ref, ks_ref, v8_ref, vs_ref,
         o_ref, m_ref, l_ref, acc_ref, qbt_ref, ef_ref) = refs
    s_i = pl.program_id(1)
    h, d = heads, head_dim
    hd = h * d

    @pl.when(s_i == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)
        # Per-lane scratch builds (s is the inner grid dim, so s_i == 0 runs
        # once per lane): the head-expansion mask E[c, j] = (j // d == c)
        # and the block-diagonal q — the flat (1, hd) q row broadcast along
        # sublanes, masked by E. Building once per lane instead of every
        # grid step drops ~5 VPU passes over (h, hd) per KV block. (The i32
        # select: Mosaic crashes on an int8 select whose on-true operand is
        # a sublane broadcast.)
        e_row = jax.lax.broadcasted_iota(jnp.int32, (h, hd), 0)
        e_col_h = jax.lax.broadcasted_iota(jnp.int32, (h, hd), 1) // d
        e_mask = e_row == e_col_h
        ef_ref[:] = e_mask.astype(jnp.float32)
        qbt_ref[:] = jnp.where(e_mask, q8_ref[0].astype(jnp.int32),
                               0).astype(jnp.int8)           # (h, hd)

    b = pl.program_id(0)
    nb = pl.num_programs(0)
    length = lens_ref[b]
    a1, b1 = lens_ref[nb + b], lens_ref[2 * nb + b]
    a2, b2 = lens_ref[3 * nb + b], lens_ref[4 * nb + b]

    if n0:
        p0 = lens_ref[5 * nb]

        @pl.when(s_i == 0)
        def _shared():
            p0p = k0_ref.shape[1]
            row = jax.lax.broadcasted_iota(jnp.int32, (p0p, h), 0)
            _process_block(k0_ref[0], ks0_ref[0][:, :h], v0_ref[0],
                           vs0_ref[0][:, :h],
                           row < p0, qbt_ref[:], qs_ref[0],
                           m_ref, l_ref, acc_ref, ef_ref[:], scale)

    # Live-bound clamp: slots beyond this lane's last valid row can never
    # contribute, so later blocks are DEAD — their index maps clamp to the
    # last live block (same index as the previous grid step => the pipeline
    # elides the DMA) and compute is skipped here. Early decode steps read
    # ~prompt_pad rows instead of the whole cache.
    last_live = jnp.maximum(jnp.maximum(length - 1, b1), b2)

    @pl.when((s_i >= n0) & ((s_i - n0) * bs <= last_live))
    def _lane():
        s_pos = ((s_i - n0) * bs
                 + jax.lax.broadcasted_iota(jnp.int32, (bs, h), 0))
        valid = ((s_pos < length) | ((s_pos >= a1) & (s_pos <= b1))
                 | ((s_pos >= a2) & (s_pos <= b2)))
        # stored scales are lane-padded (..., SL >= h) — slice the live heads
        _process_block(k8_ref[0, 0], ks_ref[0, 0][:, :h], v8_ref[0, 0],
                       vs_ref[0, 0][:, :h], valid, qbt_ref[:], qs_ref[0],
                       m_ref, l_ref, acc_ref, ef_ref[:], scale)

    @pl.when(s_i == pl.num_programs(1) - 1)
    def _finish():
        # broadcast 1/l to lanes through the same E matmul (f32 for accuracy)
        inv_l = 1.0 / jnp.maximum(l_ref[:], 1e-30)          # (1, H)
        inv_exp = jax.lax.dot_general(
            inv_l, ef_ref[:],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        o_ref[0] = (acc_ref[:] * inv_exp).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("layer_idx", "scale", "bs",
                                             "interpret"))
def flash_decode_int8(q: jax.Array, k8: jax.Array, ks: jax.Array,
                      v8: jax.Array, vs: jax.Array, lengths: jax.Array,
                      prompt_pad=None, step=None, layer_idx: int = 0,
                      scale: float | None = None,
                      bs: int | None = None, interpret: bool = False,
                      shared=None, p0=None,
                      gen_intervals=None) -> jax.Array:
    """Single-token attention over one layer of a FULL stacked int8 cache.

    q: (B, H, D) float; k8/v8: (L, B, S, H*D) int8 (token-flat layout);
    ks/vs: (L, B, S, SL) float with SL = scale_lanes(H) >= H — bf16 in the
    serving cache, DENSE-lane-padded (models/llama.py KVCache: a (..., 32)
    minor dim wastes 4x in lane tiles and XLA's remat pass compresses the
    loop carry under HBM pressure = the b28+ capacity cliff; the kernel
    slices lanes [:H] back out); lengths: (B,) int32 prompt-region lengths;
    prompt_pad/step: int32 scalars (the batch engine's static-slot mask —
    the generated region is [prompt_pad, prompt_pad+step] for every lane);
    gen_intervals: alternative per-lane mask (a1, b1, a2, b2), each (B,)
    int32 — slot s is valid iff s < lengths[b] or it falls in one of the
    two CLOSED intervals (the RingBatcher's rotating generation window,
    which wraps the ring at most once; mark an empty interval with b=-1).
    Exactly one of (prompt_pad, step) / gen_intervals must be given.
    layer_idx: STATIC layer index, baked into
    the BlockSpec index maps — the kernel DMAs blocks straight out of the
    stacked cache. (Slicing the layer in XLA first would materialize a
    100MB copy per operand per step, since custom calls cannot consume
    fused slices.)  Returns (B, H, D) in q.dtype.

    shared: optional (k0_8, ks0, v0_8, vs0) — an int8-quantized batch-wide
    shared prompt prefix, k0_8/v0_8 (L, P0p, H*D) int8 with scales
    (L, P0p, H); p0: int32 scalar, the live prefix length (rows >= p0 are
    padding). The prefix is accumulated in an extra leading grid step whose
    block index maps are constant, so its bytes move HBM->VMEM once per
    kernel launch instead of once per lane (prefix-sharing serving,
    decode/engine.py generate_shared_prefix).
    """
    b, h, d = q.shape
    hd = h * d
    s_len = k8.shape[2]
    assert k8.shape[-1] == hd, (k8.shape, h, d)
    sl = ks.shape[-1]   # stored scale lane width (dense-padded, >= h)
    assert sl >= h and vs.shape[-1] == sl, (ks.shape, vs.shape, h)
    scale = float(scale if scale is not None else d ** -0.5)
    # Block size: the largest divisor of s_len that is <= the requested bs
    # and a multiple of the int8 sublane tile (32). The old halving rule
    # degraded badly off the power-of-two buckets: s_len=448 halved
    # 256->128->64 (64-row blocks) when 224 divides it, and s_len=400 fell
    # all the way to 16-row blocks (26 grid steps/lane, ~5x step time).
    if bs is None:
        # 256 measured best at serving shapes; RADIALOG_FLASH_BS is the
        # sweep knob (tools/bench_sweep.py A/Bs without code edits)
        bs = int(os.environ.get("RADIALOG_FLASH_BS", "256"))
    bs_req = min(bs, s_len)
    bs = 0
    for cand in range(32, bs_req + 1, 32):
        if s_len % cand == 0:
            bs = cand
    if bs == 0:             # s_len not a multiple of 32: legacy halving
        bs = bs_req
        while s_len % bs:
            bs //= 2
    assert bs >= 1 and s_len % bs == 0, (s_len, bs)
    li = layer_idx
    n0 = 1 if shared is not None else 0

    # per-head symmetric int8 quantization of q, kept FLAT (B, hd): the
    # block-diagonal expansion happens inside the kernel (a sublane
    # broadcast + the E mask) — materializing s8[B, hd, h] here wasted 4x
    # of every lane tile (h=32 minor dim) in both the XLA fusion and the
    # per-lane kernel DMA (2.6 + ~0.9 ms/step at batch 56, per-op profile
    # in docs/PERF.md).
    qf = q.astype(jnp.float32)
    qscale = jnp.maximum(jnp.max(jnp.abs(qf), axis=-1), 1e-8) / 127.0  # (B,H)
    q8 = jnp.clip(jnp.round(qf / qscale[..., None]), -127, 127).astype(jnp.int8)
    q8 = q8.reshape(b, 1, hd)  # (B, 1, hd): trailing block dims must equal
    # the array dims (Pallas lane/sublane rule); the extra sublane padding
    # on this 229KB array is noise next to the 7.3MB-per-layer it replaces

    if gen_intervals is None:
        assert prompt_pad is not None and step is not None
        pp = jnp.asarray(prompt_pad, jnp.int32)
        st = jnp.asarray(step, jnp.int32)
        a1 = jnp.full((b,), pp, jnp.int32)
        b1 = jnp.full((b,), pp + st, jnp.int32)
        a2 = jnp.zeros((b,), jnp.int32)
        b2 = jnp.full((b,), -1, jnp.int32)      # empty second interval
    else:
        assert prompt_pad is None and step is None
        a1, b1, a2, b2 = (jnp.asarray(x, jnp.int32) for x in gen_intervals)

    scalars = jnp.concatenate([
        lengths.astype(jnp.int32), a1, b1, a2, b2,
        jnp.asarray([0 if p0 is None else p0], jnp.int32).reshape(1)])

    nb = b  # scalar layout: [lens(B) | a1(B) | b1(B) | a2(B) | b2(B) | p0]

    def lane_idx(bi, si, sc):
        # clamp below n0 (the shared step reuses lane block 0) AND above the
        # lane's last LIVE block (later slots are dead — repeating the
        # previous index elides the DMA; the kernel skips their compute)
        last_live = jnp.maximum(jnp.maximum(sc[bi] - 1, sc[2 * nb + bi]),
                                sc[4 * nb + bi]) // bs
        return jnp.minimum(jnp.maximum(si - n0, 0),
                           jnp.maximum(last_live, 0))

    in_specs = [
        # q8/qs index maps ignore s_i -> DMA'd once per sequence
        pl.BlockSpec((1, 1, hd), lambda bi, si, sc: (bi, 0, 0)),
        pl.BlockSpec((1, 1, h), lambda bi, si, sc: (bi, 0, 0)),
        pl.BlockSpec((1, 1, bs, hd),
                     lambda bi, si, sc: (li, bi, lane_idx(bi, si, sc), 0)),
        pl.BlockSpec((1, 1, bs, sl),
                     lambda bi, si, sc: (li, bi, lane_idx(bi, si, sc), 0)),
        pl.BlockSpec((1, 1, bs, hd),
                     lambda bi, si, sc: (li, bi, lane_idx(bi, si, sc), 0)),
        pl.BlockSpec((1, 1, bs, sl),
                     lambda bi, si, sc: (li, bi, lane_idx(bi, si, sc), 0)),
    ]
    operands = [q8, qscale[:, None, :], k8, ks, v8, vs]
    if shared is not None:
        # PER-LAYER prefix arrays with a leading dummy axis (1, P0p, ...) —
        # the caller slices its stacked (L, ...) prefix outside the kernel
        # (a ~1MB copy per layer per step: custom calls cannot consume
        # fused slices, and the prefix is tiny). Constant index maps: the
        # prefix blocks are DMA'd once per launch, not once per lane.
        k0_8, ks0, v0_8, vs0 = shared
        p0p = k0_8.shape[1]
        sl0 = ks0.shape[-1]
        assert k0_8.shape[0] == 1 and k0_8.shape[-1] == hd \
            and sl0 >= h, (k0_8.shape, ks0.shape)
        in_specs += [
            pl.BlockSpec((1, p0p, hd), lambda bi, si, sc: (0, 0, 0)),
            pl.BlockSpec((1, p0p, sl0), lambda bi, si, sc: (0, 0, 0)),
            pl.BlockSpec((1, p0p, hd), lambda bi, si, sc: (0, 0, 0)),
            pl.BlockSpec((1, p0p, sl0), lambda bi, si, sc: (0, 0, 0)),
        ]
        operands += [k0_8, ks0, v0_8, vs0]

    grid = (b, n0 + s_len // bs)
    kernel = functools.partial(_kernel, bs=bs, heads=h, head_dim=d,
                               scale=scale, n0=n0)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 1, hd),
                                   lambda bi, si, sc: (bi, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((1, h), jnp.float32),
                pltpu.VMEM((1, h), jnp.float32),
                pltpu.VMEM((1, hd), jnp.float32),
                pltpu.VMEM((h, hd), jnp.int8),      # per-lane block-diag q
                pltpu.VMEM((h, hd), jnp.float32),   # head-expansion mask E
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, 1, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s_len * d,
            bytes_accessed=2 * b * s_len * hd,
            transcendentals=b * h * s_len),
        interpret=interpret,
    )(scalars, *operands)
    return out.reshape(b, h, d)
