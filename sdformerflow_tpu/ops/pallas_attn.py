"""Fused spiking-QK window attention (the SDformerFlow/MS attention path).

Parity target: Spiking_QK_WindowAttention3D
(/root/reference/models/STSwinNet_SNN/Spiking_swin_transformer3D.py:605-717)
— the linear-complexity attention every MS block runs: input PSN spike ->
q/k linear+BN+spike (k gets a pre-spike positional encoding) -> per-group
``att_token = spike(sum q)`` -> ``attn = k * att_token`` (through the raw
time-fold) -> head-scrambled refold -> proj linear + BN. The reference's
``.reshape`` calls fold the window-time axis into the window-batch / token /
head axes with raw row-major semantics (the RAW-REFOLD quirk, see
ops/windows.py) — in XLA these folds lower to the distributed relayout-copy
tax the round-4 train profile attributes 14.6 ms/step to.

The re-derivation this kernel rests on (verified numerically in
tests/test_pallas_attn.py against the reference-parity flax module):

1. The ``k``/``att_token`` folds ``(T, B_) -> (B_, 2·)`` use the SAME
   leading-ravel regroup, so the head-scrambled ``k * att_token`` product is
   SLAB-LOCAL: ``A[i,j][p, c] = k[i,j][p, c] * att[i,j][p, c // hd]`` —
   the scramble cancels in the product.
2. The output refold ``attn.reshape(B_, nh, T, h, w, hd).transpose(...)``
   routes elements between the two RASTER-ADJACENT slabs ``{2·j2, 2·j2+1}``
   (the pair fold) and the two raster HALVES ``{j2, M+j2}`` (the time
   fold). Per pair it is a pure reshape of the pair's ravel
   ``(2, N_s, C) -> (2·nh, N_s, hd)`` followed by an even/odd deinterleave
   of the leading axis into (head, time): entirely local to one column
   pair.
3. The PSN time-mix pairs raster halves ``{j, M+j}`` (the partition's
   ``view(wd, -1, ...)``), so gridding over COLUMNS ``j`` keeps every
   neuron's temporal pair inside one kernel instance.

Consequently one Pallas instance over an even block of columns computes the
column-local interior — spikes, q/k dots, positional encoding, att_token
(as a 0/1 pooling-matrix dot; Mosaic rejects lane-splitting shape casts),
and the fold product — with zero HBM round-trips between those stages. The
remaining pair-regroup (one relayout) + proj matmul + BN affine run as the
XLA tail, which XLA fuses with the downstream window_reverse.

Measured on one v5e chip (scripts/bench_fused_attn.py, bf16, chained
medians): 1.23x / 1.21x / 1.08x over the XLA module at en4 stages 0-2.
Stage3 (M=30, ns=81 odd — no sublane-divisible block at the native token
count) runs the kernel with TOKEN PADDING (ns 81->84,
:func:`_pick_block_padded`); at that scale all variants sit at the ~1.5 ms
dispatch floor (bf16 3-way: module 1.83 / pair-local 1.59 / padded kernel
1.63 ms) so the kernel is neutral-vs-pair-local and uniform across stages.
On-chip routing guard: fused == pair-local to THE BIT (max|d| = 0) at
every stage incl. the padded codegen, with matmuls forced HIGHEST on both
sides (``bench_fused_attn --check``; comparing against the flax module
instead measures precision composition — its dots run at TPU default
precision and its BN is unfolded — not routing).

Scope (falls back to the XLA module outside it): eval mode (BN as running-
stat affine), PSN neurons, ``wd == 2``, M even, norm == "BN". f32 at
C >= ~512 falls back to the pair-local form (the two CxC f32 weight
buffers crowd scoped VMEM: measured 17.0 MB > 16 MB at stage3's minimal
block; production inference is bf16, where everything fits). The time-mix
weights enter as explicit [2, 2] matrices in SMEM. The TRAIN-capable
sibling is ``cfg.pairlocal_attn`` (models/spiking_swin.py): the same
algebra expressed in XLA with the real BN/neuron modules.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class QKAttnParams(NamedTuple):
    """Everything the fused kernel needs, in kernel-ready form.

    BN sites are eval-mode affines: ``a = scale / sqrt(var + eps)``,
    ``c = bias - mean * a``. PSN sites are [T, T] weights + [T] biases with
    T == wd == 2. ``pe`` is the k positional encoding reshaped to
    [wd, N_s, C] (the reference's ``reshape(T, 1, H, W, C)``,
    Spiking_swin_transformer3D.py:680-682).
    """

    w_in: jax.Array    # [2, 2] proj_sn PSN weight
    b_in: jax.Array    # [2]    proj_sn PSN bias
    wq: jax.Array      # [C, C] q linear kernel (input-major, flax Dense)
    aq: jax.Array      # [C]    q BN eval affine scale
    cq: jax.Array      # [C]    q BN eval affine shift
    w_q: jax.Array     # [2, 2] q PSN weight
    b_q: jax.Array     # [2]
    wk: jax.Array      # [C, C]
    ak: jax.Array      # [C]
    ck: jax.Array      # [C]
    pe: jax.Array      # [2, N_s, C] positional encoding (pre-spike on k)
    w_k: jax.Array     # [2, 2] k PSN weight
    b_k: jax.Array     # [2]
    w_t: jax.Array     # [2, 2] sn2_q (att_token) PSN weight
    b_t: jax.Array     # [2]
    wp: jax.Array      # [C, C] proj kernel
    bp: jax.Array      # [C]    proj bias
    ap: jax.Array      # [C]    proj BN eval affine scale
    cp: jax.Array      # [C]    proj BN eval affine shift


def bn_eval_affine(scale, bias, mean, var, eps=1e-5):
    """TorchBatchNorm eval as an affine: y = a * x + c.

    Statistics promote to >= f32 (and STAY f64 under enable_x64, matching
    TorchBatchNorm's compute dtype for the f64 parity harness)."""
    cdt = jnp.promote_types(var.dtype, jnp.float32)
    a = scale.astype(cdt) * jax.lax.rsqrt(var.astype(cdt) + eps)
    return a, bias.astype(cdt) - mean.astype(cdt) * a


def _heaviside(x):
    return (x >= 0.0).astype(x.dtype)


def _psn2(x0, x1, w, b):
    """2-step PSN over an explicit pair: returns (spike_0, spike_1)."""
    h0 = w[0, 0] * x0 + w[0, 1] * x1 + b[0]
    h1 = w[1, 0] * x0 + w[1, 1] * x1 + b[1]
    return _heaviside(h0), _heaviside(h1)


def qk_attention_pairlocal(x_windows, p: QKAttnParams, num_heads: int):
    """Pure-jnp mirror of the fused dataflow (the kernel's oracle).

    ``x_windows``: [2, M, wh, ww, C] from window_partition_v2_tm. Returns
    the attention output in the same layout (pre window_reverse), i.e. what
    the XLA module returns as its first output. M must be even.
    """
    wd, M, wh, ww, C = x_windows.shape
    assert wd == 2 and M % 2 == 0
    ns = wh * ww
    nh = num_heads
    hd = C // nh
    x = x_windows.reshape(2, M, ns, C)
    f32 = jnp.promote_types(x.dtype, jnp.float32)  # stays f64 under x64
    xf = x.astype(f32)

    xs0, xs1 = _psn2(xf[0], xf[1], p.w_in.astype(f32), p.b_in.astype(f32))

    def branch(w, a, c, pe=None):
        y0 = xs0 @ w.astype(f32)
        y1 = xs1 @ w.astype(f32)
        y0 = a * y0 + c
        y1 = a * y1 + c
        if pe is not None:
            y0 = y0 + pe[0]
            y1 = y1 + pe[1]
        return y0, y1

    q0p, q1p = branch(p.wq, p.aq.astype(f32), p.cq.astype(f32))
    q0, q1 = _psn2(q0p, q1p, p.w_q.astype(f32), p.b_q.astype(f32))
    k0p, k1p = branch(p.wk, p.ak.astype(f32), p.ck.astype(f32),
                      p.pe.astype(f32))
    k0, k1 = _psn2(k0p, k1p, p.w_k.astype(f32), p.b_k.astype(f32))

    # att_token: per (position, head-group) sum of hd consecutive channels
    def tok(q):
        return q.reshape(M, ns, nh, hd).sum(axis=-1)

    t0, t1 = _psn2(tok(q0), tok(q1), p.w_t.astype(f32), p.b_t.astype(f32))

    # slab-local masked product (the head scramble cancels — module header)
    def amul(k, t):
        return (k.reshape(M, ns, nh, hd)
                * t[..., None]).reshape(M, ns, C)

    a0 = amul(k0, t0)
    a1 = amul(k1, t1)

    # pair regroup: per raster half hsel, per pair (2j2', 2j2'+1):
    # ravel (2, N_s, C) -> (nh, 2, N_s, hd); deinterleave (head, time).
    def regroup(a):  # [M, ns, C] -> [2(t4), M//2, ns, C]
        v = a.reshape(M // 2, nh, 2, ns, hd)   # pure reshape of the ravel
        v = v.transpose(2, 0, 3, 1, 4)          # t4, j2', p4, n4, hd
        return v.reshape(2, M // 2, ns, C)

    o0 = regroup(a0)   # outputs (t4, j2) for j2 in [0, M/2)
    o1 = regroup(a1)   # outputs (t4, j2) for j2 in [M/2, M)
    out = jnp.concatenate([o0, o1], axis=1)     # [2, M, ns, C]

    out = out @ p.wp.astype(f32) + p.bp.astype(f32)
    out = p.ap.astype(f32) * out + p.cp.astype(f32)
    return out.reshape(2, M, wh, ww, C).astype(x_windows.dtype)


def _pick_block(M: int, ns: int = 81, C: int = 96,
                budget_bytes: int = 2 << 20):
    """Largest even divisor of M whose per-array VMEM footprint
    (2 * cols * ns * C f32) stays under ``budget_bytes`` (the kernel keeps
    ~6 such intermediates live; 2 MB/array ~ 12 MB peak, inside the 16 MB
    VMEM with the in/out pipeline buffers accounted by Mosaic) AND whose
    row count ``cols * ns`` is sublane-divisible (Mosaic requires block
    second-minor % 8 == 0 unless it spans the array). Returns None when no
    such divisor exists (e.g. en4 stage3's M=30 with odd ns=81) — callers
    then try :func:`_pick_block_padded`."""
    target = max(2, min(64, budget_bytes // max(2 * ns * C * 4, 1)))
    best = None
    for d in range(2, min(M, target) + 1, 2):
        if M % d == 0 and (d * ns) % 8 == 0:
            best = d
    return best


def _pick_block_padded(M: int, ns: int, C: int,
                       budget_bytes: int = 2 << 20):
    """Fallback block search with TOKEN PADDING: pad each window's token
    rows ``ns -> ns_p`` (zeros) until some even divisor of M gives a
    sublane-divisible block row count. Every kernel stage is row-local
    (2D dots / per-row lane ops / slab-aligned PSN FMAs — see ``_kernel``),
    so padded rows never mix with real rows and are sliced away after the
    call; the only cost is ``ns_p/ns`` extra FLOPs/bytes. Minimal padding
    wins first, then the largest in-budget divisor (same budget rule as
    :func:`_pick_block`). Returns ``(jb, ns_p)`` or None. Unlocks en4
    stage3 (M=30, ns=81 -> ns_p=84, jb=2)."""
    for ns_p in range(ns + 1, ns + 8):
        target = max(2, min(64, budget_bytes // max(2 * ns_p * C * 4, 1)))
        best = None
        for d in range(2, min(M, target) + 1, 2):
            if M % d == 0 and (d * ns_p) % 8 == 0:
                best = d
        if best is not None:
            return best, ns_p
    return None


def _kernel(x_ref, pe_ref, pool_ref, bcast_ref, win_ref, bin_ref,
            wq_ref, aq_ref, cq_ref, wq2_ref, bq2_ref,
            wk_ref, ak_ref, ck_ref, wk2_ref, bk2_ref,
            wt_ref, bt_ref, out_ref):
    """Column-local half of the fused attention, Mosaic-friendly ops only:
    every array is 2D (rows = block columns x window tokens, lanes = C),
    every contraction a 2D MXU dot, PSN time-mixes are SMEM-scalar FMAs.
    The head-group sum (att_token) and its hd-wide broadcast are expressed
    as dots with 0/1 pooling matrices instead of lane reshapes (Mosaic
    rejects shape casts that split the lane dim). The pair-regroup + proj
    tail runs in XLA (fused_qk_attention) — it is one relayout + one
    matmul, which XLA fuses with the downstream window_reverse."""
    f32 = jnp.float32
    x0 = x_ref[0]            # (jb*ns, C)
    x1 = x_ref[1]
    cdt = x0.dtype

    h0 = (win_ref[0, 0] * x0.astype(f32) + win_ref[0, 1] * x1.astype(f32)
          + bin_ref[0, 0])
    h1 = (win_ref[1, 0] * x0.astype(f32) + win_ref[1, 1] * x1.astype(f32)
          + bin_ref[1, 0])
    xs0 = _heaviside(h0).astype(cdt)
    xs1 = _heaviside(h1).astype(cdt)

    prec = (jax.lax.Precision.HIGHEST if cdt == jnp.float32
            else jax.lax.Precision.DEFAULT)

    def dense(z, w_ref):
        return jnp.dot(z, w_ref[:], preferred_element_type=f32,
                       precision=prec)

    def branch(w_ref, a_ref, c_ref, w2_ref, b2_ref, use_pe):
        y0 = dense(xs0, w_ref)
        y1 = dense(xs1, w_ref)
        a = a_ref[:].astype(f32)   # (1, C) broadcasts over rows
        c = c_ref[:].astype(f32)
        y0 = a * y0 + c
        y1 = a * y1 + c
        if use_pe:
            y0 = y0 + pe_ref[0].astype(f32)
            y1 = y1 + pe_ref[1].astype(f32)
        g0 = w2_ref[0, 0] * y0 + w2_ref[0, 1] * y1 + b2_ref[0, 0]
        g1 = w2_ref[1, 0] * y0 + w2_ref[1, 1] * y1 + b2_ref[1, 0]
        return _heaviside(g0), _heaviside(g1)

    q0, q1 = branch(wq_ref, aq_ref, cq_ref, wq2_ref, bq2_ref, False)
    k0, k1 = branch(wk_ref, ak_ref, ck_ref, wk2_ref, bk2_ref, True)

    # att_token: per-(row, head-group) sum of hd consecutive lanes == a dot
    # with the (C, nh) 0/1 pooling matrix; broadcast back via its (nh, C)
    # transpose. q/att spikes are exact 0/1 so cdt dots are exact.
    s0 = dense(q0.astype(cdt), pool_ref)   # (jb*ns, nh)
    s1 = dense(q1.astype(cdt), pool_ref)
    t0 = _heaviside(wt_ref[0, 0] * s0 + wt_ref[0, 1] * s1 + bt_ref[0, 0])
    t1 = _heaviside(wt_ref[1, 0] * s0 + wt_ref[1, 1] * s1 + bt_ref[1, 0])
    b0 = dense(t0.astype(cdt), bcast_ref)  # (jb*ns, C) 0/1
    b1 = dense(t1.astype(cdt), bcast_ref)

    out_ref[0] = (k0 * b0).astype(out_ref.dtype)
    out_ref[1] = (k1 * b1).astype(out_ref.dtype)


def fused_qk_attention(x_windows, p: QKAttnParams, num_heads: int,
                       *, block_cols: int | None = None,
                       interpret: bool | None = None):
    """Pallas-fused Spiking_QK_WindowAttention3D forward (eval mode).

    ``x_windows``: [2, M, wh, ww, C] (window_partition_v2_tm output, wd==2,
    M even). Returns [2, M, wh, ww, C] — bit-compatible with the flax
    module's first output (tests/test_pallas_attn.py: f64 oracle +
    on-device A/B).
    """
    wd, M, wh, ww, C = x_windows.shape
    if wd != 2 or M % 2:
        raise ValueError(f"fused path needs wd==2 and even M, got {wd},{M}")
    if interpret is None:
        # no Mosaic on CPU hosts/tests: run interpreted there
        interpret = jax.default_backend() in ("cpu",)
    ns = wh * ww
    nh = num_heads
    hd = C // nh
    # VMEM block budget: calibrated at 2 MB/array for bf16 I/O (measured
    # ~12.6 MB scoped footprint at en4 stage0, inside the 16 MB limit);
    # f32 I/O doubles the in/out pipeline buffers, so halve the budget
    # (f32 stage0 at the bf16 block size OOMs scoped vmem by 9.2 MB).
    itemsize = jnp.dtype(x_windows.dtype).itemsize
    if itemsize > 2 and 2 * C * C * itemsize > (4 << 20):
        # f32 + large C: the two CxC weight buffers alone crowd VMEM —
        # measured at en4 stage3 (C=768, f32): 17.0 MB scoped stack at the
        # MINIMAL block, over the 16 MB limit with no smaller block to
        # retreat to. f32 is the debugging path (production inference is
        # bf16, where the weights halve and the kernel fits); use the
        # pair-local XLA form there. The padded-block Mosaic codegen stays
        # on-chip-verified in f32 at smaller C (bench_fused_attn --check).
        return qk_attention_pairlocal(x_windows, p, num_heads)
    budget = (2 << 20) if itemsize <= 2 else (1 << 20)
    jb = block_cols or _pick_block(M, ns, C, budget)
    ns_p = ns
    if jb is None:
        # no Mosaic-legal block at the native token count (tiny M with odd
        # ns, e.g. en4 stage3): pad token rows per window until one exists
        # (row-local kernel — padding is sliced away after the call)
        picked = _pick_block_padded(M, ns, C, budget)
        if picked is None:
            # the pair-local XLA re-expression — same math, f64-tested, and
            # already free of the module path's q/k/att fold relayouts
            return qk_attention_pairlocal(x_windows, p, num_heads)
        jb, ns_p = picked
    assert M % jb == 0 and jb % 2 == 0, (M, jb)
    pe_win = p.pe.reshape(2, ns, C)
    if ns_p != ns:
        x = jnp.pad(x_windows.reshape(2, M, ns, C),
                    ((0, 0), (0, 0), (0, ns_p - ns), (0, 0))
                    ).reshape(2, M * ns_p, C)
        pe_win = jnp.pad(pe_win, ((0, 0), (0, ns_p - ns), (0, 0)))
    else:
        x = x_windows.reshape(2, M * ns, C)
    # pe pre-tiled to one block's rows (tiny; shared by every instance)
    pe = jnp.tile(pe_win, (1, jb, 1)).reshape(
        2, jb * ns_p, C).astype(x.dtype)
    # 0/1 head-pooling matrices (att_token sum + hd-wide broadcast as dots)
    eye = jnp.eye(nh, dtype=x.dtype)
    pool = jnp.repeat(eye, hd, axis=0)         # (C, nh)
    bcast = jnp.repeat(eye, hd, axis=1)        # (nh, C)

    def mat2(a):  # 2x2 PSN weight -> SMEM
        return jnp.asarray(a, jnp.float32).reshape(2, 2)

    def col2(b):  # PSN bias [2]/[2,1] -> (2, 1) SMEM
        return jnp.asarray(b, jnp.float32).reshape(2, 1)

    def row(a):   # per-channel affine -> (1, C) VMEM
        return jnp.asarray(a, jnp.float32).reshape(1, C)

    grid = (M // jb,)
    vmem = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    smem = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.SMEM)

    in_specs = [
        pl.BlockSpec((2, jb * ns_p, C), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        vmem((2, jb * ns_p, C)),                   # pe
        vmem((C, nh)), vmem((nh, C)),              # pool / bcast
        smem((2, 2)), smem((2, 1)),                # proj_sn psn
        vmem((C, C)), vmem((1, C)), vmem((1, C)),  # q dense + affine
        smem((2, 2)), smem((2, 1)),                # q psn
        vmem((C, C)), vmem((1, C)), vmem((1, C)),  # k dense + affine
        smem((2, 2)), smem((2, 1)),                # k psn
        smem((2, 2)), smem((2, 1)),                # att_token psn
    ]
    out_spec = pl.BlockSpec((2, jb * ns_p, C), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
    a_pairs = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((2, M * ns_p, C), x_windows.dtype),
        interpret=interpret,
    )(x, pe, pool, bcast,
      mat2(p.w_in), col2(p.b_in),
      p.wq.astype(x.dtype), row(p.aq), row(p.cq),
      mat2(p.w_q), col2(p.b_q),
      p.wk.astype(x.dtype), row(p.ak), row(p.ck),
      mat2(p.w_k), col2(p.b_k),
      mat2(p.w_t), col2(p.b_t))

    # XLA tail: the pair-regroup (ops/pallas_attn.py header, step 2 — one
    # relayout) + proj matmul + BN affine; XLA fuses these with the
    # surrounding window_reverse.
    f32 = jnp.promote_types(x_windows.dtype, jnp.float32)
    a = a_pairs.reshape(2, M, ns_p, C)
    if ns_p != ns:
        a = a[:, :, :ns, :]  # drop the Mosaic-legality token padding

    def regroup(ah):  # [M, ns, C] -> [2, M//2, ns, C]
        v = ah.reshape(M // 2, nh, 2, ns, hd)
        v = v.transpose(2, 0, 3, 1, 4)
        return v.reshape(2, M // 2, ns, C)

    out = jnp.concatenate([regroup(a[0]), regroup(a[1])], axis=1)
    out = out.astype(f32) @ p.wp.astype(f32) + p.bp.astype(f32)
    out = p.ap.astype(f32) * out + p.cp.astype(f32)
    return out.reshape(2, M, wh, ww, C).astype(x_windows.dtype)
