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


def flash_decode_force_interpret() -> bool:
    """Test override: RADIALOG_FLASH_DECODE_FORCE=interpret runs the kernel
    in Pallas interpret mode on CPU, letting the CPU suite drive the
    kernel-consuming decode paths (incl. the deferred-cache-write path,
    which only exists when the kernel is taken) end-to-end. Resolved at
    trace time, like the flash-attention env knobs."""
    return os.environ.get("RADIALOG_FLASH_DECODE_FORCE", "") == "interpret"


def flash_decode_available() -> bool:
    """True when decode attention should take the Pallas kernel path: a real
    TPU backend, or the interpret-mode test override above."""
    return (jax.default_backend() in ("tpu", "axon")
            or flash_decode_force_interpret())


def _process_block(k2d, ks_row, v2d, vs_row, valid, qbt, qs,
                   m_ref, l_ref, acc_ref, ef, scale, g: int = 0):
    """One online-softmax accumulation over a KV block.

    k2d/v2d: (rows, H*D) int8; ks_row/vs_row: (rows, H) float scales;
    valid: (rows, H) bool; qbt: (H, H*D) block-diagonal int8 q (row c holds
    head c's 128 q values at lanes [c*D, (c+1)*D), zeros elsewhere — built
    ONCE PER LANE into VMEM scratch, see _kernel); qs: (1, H);
    ef: (H, H*D) f32 head-expansion mask (E[c, j] = j//D == c, also scratch).
    g: STATIC row into the (gl, ...) m/l/acc stats scratch — the lane-grouped
    kernel (gl > 1) keeps one online-softmax state per lane of the group.
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

    m_prev = m_ref[g:g + 1, :]                # (1, H)
    m_cur = jnp.max(scores, axis=0, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)           # (1, H)
    p = jnp.exp(scores - m_new)               # (rows, H)
    p = jnp.where(valid, p, 0.0)
    l_ref[g:g + 1, :] = (l_ref[g:g + 1, :] * alpha
                         + p.sum(axis=0, keepdims=True))
    m_ref[g:g + 1, :] = m_new

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
    acc_ref[g:g + 1, :] = acc_ref[g:g + 1, :] * alpha_exp + block_o


def _kernel(lens_ref,                       # scalar prefetch: (5B[+1],) int32
            *refs,
            bs: int, heads: int, head_dim: int, scale: float,
            n0: int = 0, nc: int = 0, nw: int = 0, gl: int = 1):
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
    lane (decode/engine.py generate_shared_prefix, kv_int8 mode).

    nc=1 adds a CURRENT-TOKEN block (kc/vc (B, 1, H*D) int8 + scales): the
    step's own K/V arrive as a direct operand instead of being read back
    from the cache. The caller shrinks the generated interval to exclude
    the current slot (b1 = prompt_pad + step - 1) — the kernel always
    attends the current row.

    nw=1 (requires nc=1) additionally WRITES the current row into the
    cache IN-KERNEL: the cache buffers come back as aliased outputs
    (input_output_aliases) and the kernel rebuilds the 8-row slab that
    contains write slot b1[b]+1 — rows below the slot captured from the
    resident read block, the slot row replaced with the current K/V,
    rows above the slot left stale/zero (they are dead until a later
    step writes each in turn as THE slot). This removes the decode
    loop's per-layer dynamic_update_slice chain entirely (4·L tiny DUS
    ops); measured perf-neutral-to-negative at the serving default —
    the DUS writes overlap the kernels' DMA queues, so it stays OPT-IN
    (docs/PERF.md "In-kernel cache writes"). The one-stacked-write
    alternative made XLA double-buffer the 2.6 GB cache carry
    (read-by-32-kernels-then-write) and OOMed at batch 56.

    gl: LANES PER GRID PROGRAM (lane grouping). The per-lane grid pays a
    fixed per-grid-step cost (~1-2 us of bookkeeping per program on this
    part, docs/PERF.md flash-bs A/B) that at B=56 x 3 steps rivals the
    kernel's DMA time; grouping gl lanes into one program divides the
    step count by gl while DMA'ing the same cache bytes in gl-times
    larger transfers. Per-lane state lives in row g of the (gl, ...)
    stats scratch; the group's block index map clamps at the MAX live
    bound over its lanes (static-slot serving: b1 identical across
    lanes, so elision granularity is nearly unchanged). nc/nw require
    gl == 1 (enforced by the wrapper)."""
    refs = list(refs)
    q8_ref, qs_ref, k8_ref, ks_ref, v8_ref, vs_ref = refs[:6]
    at = 6
    if nc:
        kc_ref, kcs_ref, vc_ref, vcs_ref = refs[at:at + 4]
        at += 4
    if n0:
        k0_ref, ks0_ref, v0_ref, vs0_ref = refs[at:at + 4]
        at += 4
    if nw:
        (o_ref, ko_ref, kso_ref, vo_ref, vso_ref,
         m_ref, l_ref, acc_ref, qbt_ref, ef_ref) = refs[at:]
    else:
        o_ref, m_ref, l_ref, acc_ref, qbt_ref, ef_ref = refs[at:]
    s_i = pl.program_id(1)
    h, d = heads, head_dim
    hd = h * d

    @pl.when(s_i == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)
        # Per-lane scratch builds (s is the inner grid dim, so s_i == 0 runs
        # once per lane group): the head-expansion mask E[c, j] = (j//d == c)
        # and the block-diagonal q — each lane's flat (1, hd) q row broadcast
        # along sublanes, masked by E, into rows [g*h, (g+1)*h) of the
        # (gl*h, hd) scratch. Building once per group instead of every
        # grid step drops ~5 VPU passes over (h, hd) per KV block. (The i32
        # select: Mosaic crashes on an int8 select whose on-true operand is
        # a sublane broadcast.)
        e_row = jax.lax.broadcasted_iota(jnp.int32, (h, hd), 0)
        e_col_h = jax.lax.broadcasted_iota(jnp.int32, (h, hd), 1) // d
        e_mask = e_row == e_col_h
        ef_ref[:] = e_mask.astype(jnp.float32)
        for g in range(gl):
            qbt_ref[g * h:(g + 1) * h, :] = jnp.where(
                e_mask, q8_ref[g].astype(jnp.int32), 0).astype(jnp.int8)

    b = pl.program_id(0)          # lane-GROUP index (gl lanes per program)
    nb = pl.num_programs(0) * gl  # total lanes B (scalar layout stride)

    def lane_scalars(g):
        ln = b * gl + g
        return (lens_ref[ln], lens_ref[nb + ln], lens_ref[2 * nb + ln],
                lens_ref[3 * nb + ln], lens_ref[4 * nb + ln])

    length, a1, b1, a2, b2 = lane_scalars(0)

    if n0:
        p0 = lens_ref[5 * nb]

        @pl.when(s_i == 0)
        def _shared():
            p0p = k0_ref.shape[1]
            row = jax.lax.broadcasted_iota(jnp.int32, (p0p, h), 0)
            for g in range(gl):
                _process_block(k0_ref[0], ks0_ref[0][:, :h], v0_ref[0],
                               vs0_ref[0][:, :h],
                               row < p0, qbt_ref[g * h:(g + 1) * h, :],
                               qs_ref[g], m_ref, l_ref, acc_ref,
                               ef_ref[:], scale, g=g)

    if nc:
        @pl.when(s_i == 0)
        def _current():
            # the step's own K/V row — always valid (every lane forwards
            # every step; done lanes' outputs are masked by the caller, as
            # with the old in-cache slot). Online softmax is order-invariant,
            # so accumulating it first is exact up to fp reassociation.
            ones = jnp.ones((1, h), jnp.bool_)
            _process_block(kc_ref[0], kcs_ref[0][:, :h], vc_ref[0],
                           vcs_ref[0][:, :h], ones, qbt_ref[:], qs_ref[0],
                           m_ref, l_ref, acc_ref, ef_ref[:], scale)

    if nw:
        # In-kernel cache write: rebuild the 8-row slab holding write slot
        # b1+1 in the aliased (1, 1, 8, ·) out blocks (the pipeline flushes
        # each lane's slab once, at lane end). Selects run in i32/f32 —
        # Mosaic crashes on narrow-dtype selects with sublane-broadcast
        # operands (same workaround as the qbt build above).
        slot = b1 + 1
        r = slot % 8
        s0 = slot - r
        slw = kso_ref.shape[-1]
        rsel_hd = jax.lax.broadcasted_iota(jnp.int32, (8, hd), 0) == r
        rsel_sl = jax.lax.broadcasted_iota(jnp.int32, (8, slw), 0) == r

        @pl.when(s_i == 0)
        def _winit():
            # rows != slot zeroed; the capture below overlays the live rows
            # (always runs when r > 0; when r == 0 the rows above are dead)
            ko_ref[0, 0] = jnp.where(rsel_hd, kc_ref[0].astype(jnp.int32),
                                     0).astype(ko_ref.dtype)
            vo_ref[0, 0] = jnp.where(rsel_hd, vc_ref[0].astype(jnp.int32),
                                     0).astype(vo_ref.dtype)
            kso_ref[0, 0] = jnp.where(rsel_sl,
                                      kcs_ref[0].astype(jnp.float32),
                                      0.0).astype(kso_ref.dtype)
            vso_ref[0, 0] = jnp.where(rsel_sl,
                                      vcs_ref[0].astype(jnp.float32),
                                      0.0).astype(vso_ref.dtype)

        @pl.when((s_i == n0 + s0 // bs) & (r > 0))
        def _wcapture():
            # the read block holding rows [s0, slot) is resident this step
            # (s0 <= b1 <= the lane's live bound, so the clamp never skips
            # it); rows above the slot write back stale cache content
            off = pl.multiple_of(s0 % bs, 8)
            ko_ref[0, 0] = jnp.where(
                rsel_hd, kc_ref[0].astype(jnp.int32),
                k8_ref[0, 0, pl.ds(off, 8), :].astype(jnp.int32)
            ).astype(ko_ref.dtype)
            vo_ref[0, 0] = jnp.where(
                rsel_hd, vc_ref[0].astype(jnp.int32),
                v8_ref[0, 0, pl.ds(off, 8), :].astype(jnp.int32)
            ).astype(vo_ref.dtype)
            kso_ref[0, 0] = jnp.where(
                rsel_sl, kcs_ref[0].astype(jnp.float32),
                ks_ref[0, 0, pl.ds(off, 8), :].astype(jnp.float32)
            ).astype(kso_ref.dtype)
            vso_ref[0, 0] = jnp.where(
                rsel_sl, vcs_ref[0].astype(jnp.float32),
                vs_ref[0, 0, pl.ds(off, 8), :].astype(jnp.float32)
            ).astype(vso_ref.dtype)

    # Live-bound clamp: slots beyond this GROUP's last valid row can never
    # contribute, so later blocks are DEAD — their index maps clamp to the
    # last live block (same index as the previous grid step => the pipeline
    # elides the DMA) and compute is skipped here. Early decode steps read
    # ~prompt_pad rows instead of the whole cache. With gl > 1 the bound is
    # the max over the group's lanes (index map group_idx below matches).
    group_live = jnp.maximum(jnp.maximum(length - 1, b1), b2)
    for g in range(1, gl):
        lg, a1g, b1g, a2g, b2g = lane_scalars(g)
        group_live = jnp.maximum(group_live,
                                 jnp.maximum(jnp.maximum(lg - 1, b1g), b2g))

    @pl.when((s_i >= n0) & ((s_i - n0) * bs <= group_live))
    def _lane():
        s_pos = ((s_i - n0) * bs
                 + jax.lax.broadcasted_iota(jnp.int32, (bs, h), 0))
        for g in range(gl):
            lg, a1g, b1g, a2g, b2g = lane_scalars(g)
            valid = ((s_pos < lg) | ((s_pos >= a1g) & (s_pos <= b1g))
                     | ((s_pos >= a2g) & (s_pos <= b2g)))
            # stored scales are lane-padded (..., SL >= h) — slice live heads
            _process_block(k8_ref[0, g], ks_ref[0, g][:, :h], v8_ref[0, g],
                           vs_ref[0, g][:, :h], valid,
                           qbt_ref[g * h:(g + 1) * h, :], qs_ref[g],
                           m_ref, l_ref, acc_ref, ef_ref[:], scale, g=g)

    @pl.when(s_i == pl.num_programs(1) - 1)
    def _finish():
        # broadcast 1/l to lanes through the same E matmul (f32 for accuracy)
        for g in range(gl):
            inv_l = 1.0 / jnp.maximum(l_ref[g:g + 1, :], 1e-30)   # (1, H)
            inv_exp = jax.lax.dot_general(
                inv_l, ef_ref[:],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            o_ref[g] = (acc_ref[g:g + 1, :] * inv_exp).astype(o_ref.dtype)


def default_gl(bs: int, intervals: bool = False) -> int:
    """Lane-group default for the resolved block row count `bs` (the
    measured round-5 rule, docs/PERF.md "Lane grouping"): interval-mask
    (ring) callers stay ungrouped (ragged per-lane fills defeat the
    group's shared live bound, 942 -> 911 tok/s at 96 lanes); lockstep
    static-slot serving groups 8 lanes at the fine bs <= 64 blocks
    (b56 A/B: gl=4 8.478, 7 8.610, 8 8.618, 14 8.203 reports/s) and 4 at
    the coarser walked-up blocks (96/128/192/256), where the 192-row
    sweep showed gl >= 7 regressing."""
    if intervals:
        return 1
    return 8 if bs <= 64 else 4


@functools.partial(jax.jit, static_argnames=("layer_idx", "scale", "bs",
                                             "interpret", "write_cache",
                                             "gl"))
def flash_decode_int8(q: jax.Array, k8: jax.Array, ks: jax.Array,
                      v8: jax.Array, vs: jax.Array, lengths: jax.Array,
                      prompt_pad=None, step=None, layer_idx: int = 0,
                      scale: float | None = None,
                      bs: int | None = None, interpret: bool = False,
                      shared=None, p0=None,
                      gen_intervals=None, current=None,
                      write_cache: bool = False,
                      gl: int | None = None):
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

    current: optional (kc8, kcs, vc8, vcs) — THE STEP'S OWN K/V as a direct
    per-lane operand: kc8/vc8 (B, 1, H*D) int8, kcs/vcs (B, 1, SL) scales
    (the same quantize_kv rounding the cache stores, so the math is
    identical to reading the row back from the cache). The caller must
    exclude the current slot from its mask (pass step-1 / shrink the
    interval) — the kernel always attends the current row.

    write_cache=True (requires current) makes the kernel ALSO write the
    current row into the cache in-place: the four cache buffers come back
    as ALIASED outputs and the return value becomes
    (o, (k8', ks', v8', vs')). The write slot is b1[b]+1 per lane
    (= prompt_pad + step + 1 under the shrunk static-slot mask, i.e. the
    true current slot). The kernel rebuilds the 8-row slab around the slot
    (Mosaic's packed-sublane tiling forbids 1-row blocked writes): rows
    below the slot are recaptured from the resident read block, rows ABOVE
    the slot within the slab are left stale or zeroed — callers must treat
    rows past the write slot as undefined (the decode loop overwrites each
    in turn as THE slot, and every mask already excludes them). This kills
    the decode loop's per-layer dynamic_update_slice chain (4·L tiny DUS)
    without the 2.6 GB carry double-buffering XLA creates for a
    read-by-all-layers-then-write-once stacked deferral (models/llama.py
    llama_apply defer path) — but measured perf-neutral-to-negative at
    the b56 serving default (the DUS writes overlap the kernels' DMA
    queues; docs/PERF.md "In-kernel cache writes"), so it is OPT-IN.
    The caller must guarantee slot < S.

    gl: lanes per grid program (default: RADIALOG_FLASH_LANES, else 8 at
    the resolved bs <= 64, 4 at coarser walked-up blocks) — groups gl
    lanes into one program to amortize the ~1-2 us fixed per-grid-step
    cost over gl-times larger DMAs (same total bytes; the group's
    dead-block clamp uses the max live bound over its lanes).
    Measured at the b56 serving default (round-5 A/Bs, runs=3 each): at
    the old 192-row blocks gl=1 7.862, 2 8.034, 4 8.130, 7 7.911,
    8 7.905; at the shipped 64-row blocks gl=4 8.478, 7 8.610,
    **8 8.618 (the default)**, 14 8.203 reports/s — the fine-block
    live-bound clamp and the gl-wide DMA compose, until the grouped
    (gl x bs)-row blocks grow past the double-buffering sweet spot
    (docs/PERF.md "Lane grouping"). Bitwise-exact vs gl=1 on TPU at every
    setting (tests + `tools/tpu_smoke.py`, the repeatable real-chip check).
    Resolved DOWN to the largest divisor of B <= the request; forced to 1
    when current/write_cache is used (the slab write is per-lane).
    NOTE: like RADIALOG_FLASH_DECODE_FORCE/RADIALOG_FLASH_BS (and
    RADIALOG_DEFER_KV in llama_apply), the env default is read at TRACE
    time — the jit cache key does not include the env value, so flipping
    it after the first compile in a process is ignored; pass gl= (a
    static arg) explicitly, or set the env before the first call
    (tools/bench_sweep.py A/Bs in fresh processes for this reason).
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
    def resolve_bs(req: int) -> int:
        req = min(req, s_len)
        best = 0
        for cand in range(32, req + 1, 32):
            if s_len % cand == 0:
                best = cand
        if best == 0:       # s_len not a multiple of 32: legacy halving
            best = req
            while s_len % best:
                best //= 2
        return best

    if bs is None:
        # Round-5 (gl, bs) grid at the b56 serving default (lane 384,
        # gl=4; docs/PERF.md "Lane grouping"): bs=192 8.130, 128 8.262,
        # 96 8.345, 64 8.389 (8.474 with unroll=3; 8.618 with the gl=8
        # default below — the shipped config),
        # 32 7.16 reports/s — with lanes grouped, FINER blocks win down to
        # 64 rows (the live-bound clamp elides more dead rows early in
        # the decode while the gl-wide DMA stays large), then the fixed
        # per-grid-step cost bites at 32. Default request 64; when
        # s_len's divisor structure resolves it below 64 rows, walk up
        # through 96/128/256 for the first >= 64-row resolution.
        env = os.environ.get("RADIALOG_FLASH_BS")
        if env is not None:
            bs = resolve_bs(int(env))
        else:
            for req in (64, 96, 128, 256):
                bs = resolve_bs(req)
                if bs >= 64:
                    break
    else:
        bs = resolve_bs(bs)
    assert bs >= 1 and s_len % bs == 0, (s_len, bs)
    li = layer_idx
    n0 = 1 if shared is not None else 0
    if gl is None:
        env = os.environ.get("RADIALOG_FLASH_LANES")
        if env is not None:
            gl = int(env)
        else:
            gl = default_gl(bs, intervals=gen_intervals is not None)
    if current is not None or write_cache:
        gl = 1          # the current-row/slab-write paths are per-lane
    gl = max(1, min(gl, b))
    while b % gl:       # largest divisor of B <= the request
        gl -= 1

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
        # GROUP's last LIVE block (later slots are dead — repeating the
        # previous index elides the DMA; the kernel skips their compute).
        # bi is the lane-GROUP index; the bound is the max over its lanes.
        last_live = None
        for g in range(gl):
            ln = bi * gl + g
            lg = jnp.maximum(jnp.maximum(sc[ln] - 1, sc[2 * nb + ln]),
                             sc[4 * nb + ln])
            last_live = lg if last_live is None else jnp.maximum(last_live,
                                                                 lg)
        return jnp.minimum(jnp.maximum(si - n0, 0),
                           jnp.maximum(last_live // bs, 0))

    in_specs = [
        # q8/qs index maps ignore s_i -> DMA'd once per sequence
        pl.BlockSpec((gl, 1, hd), lambda bi, si, sc: (bi, 0, 0)),
        pl.BlockSpec((gl, 1, h), lambda bi, si, sc: (bi, 0, 0)),
        pl.BlockSpec((1, gl, bs, hd),
                     lambda bi, si, sc: (li, bi, lane_idx(bi, si, sc), 0)),
        pl.BlockSpec((1, gl, bs, sl),
                     lambda bi, si, sc: (li, bi, lane_idx(bi, si, sc), 0)),
        pl.BlockSpec((1, gl, bs, hd),
                     lambda bi, si, sc: (li, bi, lane_idx(bi, si, sc), 0)),
        pl.BlockSpec((1, gl, bs, sl),
                     lambda bi, si, sc: (li, bi, lane_idx(bi, si, sc), 0)),
    ]
    operands = [q8, qscale[:, None, :], k8, ks, v8, vs]
    nc = 0
    if current is not None:
        # per-lane current-token row: tiny (B, 1, hd) blocks, index maps
        # constant in s_i -> DMA'd once per lane (kernel unpacks these
        # BEFORE the shared-prefix refs — keep the order in sync)
        kc8, kcs, vc8, vcs = current
        slc = kcs.shape[-1]
        assert kc8.shape == (b, 1, hd) and vc8.shape == (b, 1, hd), \
            (kc8.shape, vc8.shape, b, hd)
        assert slc >= h and vcs.shape[-1] == slc, (kcs.shape, vcs.shape, h)
        in_specs += [
            pl.BlockSpec((1, 1, hd), lambda bi, si, sc: (bi, 0, 0)),
            pl.BlockSpec((1, 1, slc), lambda bi, si, sc: (bi, 0, 0)),
            pl.BlockSpec((1, 1, hd), lambda bi, si, sc: (bi, 0, 0)),
            pl.BlockSpec((1, 1, slc), lambda bi, si, sc: (bi, 0, 0)),
        ]
        operands += [kc8, kcs, vc8, vcs]
        nc = 1
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

    out_specs = [pl.BlockSpec((gl, 1, hd), lambda bi, si, sc: (bi, 0, 0))]
    out_shape = [jax.ShapeDtypeStruct((b, 1, hd), q.dtype)]
    aliases = {}
    nw = 0
    if write_cache:
        assert current is not None, "write_cache requires the current row"
        assert bs % 8 == 0 and s_len % 8 == 0, (bs, s_len)
        assert current[1].shape[-1] == sl, (current[1].shape, sl)
        nw = 1

        def slab_idx(bi, si, sc):
            # the 8-row slab holding write slot b1[bi]+1; constant in si
            # -> flushed once per lane. Clamped like dynamic_update_slice
            # clamps its start: engine/session bounds checks keep slots
            # < S, the clamp only turns a missed bound into the same
            # last-slab corruption the DUS path had instead of UB.
            return (li, bi,
                    jnp.minimum((sc[2 * nb + bi] + 1) // 8,
                                s_len // 8 - 1), 0)

        out_specs += [
            pl.BlockSpec((1, 1, 8, hd), slab_idx),
            pl.BlockSpec((1, 1, 8, sl), slab_idx),
            pl.BlockSpec((1, 1, 8, hd), slab_idx),
            pl.BlockSpec((1, 1, 8, sl), slab_idx),
        ]
        out_shape += [jax.ShapeDtypeStruct(k8.shape, k8.dtype),
                      jax.ShapeDtypeStruct(ks.shape, ks.dtype),
                      jax.ShapeDtypeStruct(v8.shape, v8.dtype),
                      jax.ShapeDtypeStruct(vs.shape, vs.dtype)]
        # operand order: [scalars, q8, qs, k8, ks, v8, vs, ...] — the four
        # cache buffers alias the four slab outputs (in-place row insert)
        aliases = {3: 1, 4: 2, 5: 3, 6: 4}

    grid = (b // gl, n0 + s_len // bs)
    kernel = functools.partial(_kernel, bs=bs, heads=h, head_dim=d,
                               scale=scale, n0=n0, nc=nc, nw=nw, gl=gl)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs if write_cache else out_specs[0],
            scratch_shapes=[
                pltpu.VMEM((gl, h), jnp.float32),
                pltpu.VMEM((gl, h), jnp.float32),
                pltpu.VMEM((gl, hd), jnp.float32),
                pltpu.VMEM((gl * h, hd), jnp.int8),  # per-lane block-diag q
                pltpu.VMEM((h, hd), jnp.float32),    # head-expansion mask E
            ],
        ),
        out_shape=out_shape if write_cache else out_shape[0],
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # Mosaic's default scoped-vmem limit is 16 MB; lane-grouped
            # blocks (gl x bs rows, double-buffered k+v) legitimately
            # exceed it (gl=8 x bs=192 needs ~28 MB of a 128 MB VMEM).
            # Only raised when needed — a higher limit costs Mosaic
            # allocator time on every compile.
            **({"vmem_limit_bytes": 100 * 1024 * 1024}
               if 2 * 2 * gl * bs * (hd + 2 * sl) > 14 * 1024 * 1024
               else {})),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s_len * d,
            bytes_accessed=2 * b * s_len * hd,
            transcendentals=b * h * s_len),
        interpret=interpret,
    )(scalars, *operands)
    if write_cache:
        o, k8n, ksn, v8n, vsn = out
        return o.reshape(b, h, d), (k8n, ksn, v8n, vsn)
    return out.reshape(b, h, d)
