"""Pallas fused sign-matmul + per-subblock min for exact top-k serving.

The exact-top-k pipeline (ops/retrieval.exact_topk_blocked) is a subblock-min
hierarchy whose first stage — compute Hamming distances, reduce each
S-entry subblock to its min — is pure bandwidth: XLA materializes the
(Q, block) distance tile to HBM out of the matmul and reads it back for the
reduction (plus a relayout copy for the row-major consumers), ~3 full-matrix
HBM passes for what is arithmetically one MXU sweep. At 100M gallery entries
that tax is ~20ms/block x 50 blocks and dominates the exact streaming path
(153 qps, PARITY.md round-3 log).

This kernel keeps the distance tile in VMEM: grid over db row-blocks, one
int8xint8 MXU matmul per step (int8 runs 2x bf16 MACs/cycle on v5e), the
(block_rows, Q) similarity tile is group-max-reduced over sublane groups of
S in registers, and only the (block_rows/S, Q) subblock mins are written to
HBM — a Q/S-fold write reduction and NO distance matrix anywhere. The
selection stages downstream (top_k over mins, db-row gather, rescore, final
top_k) stay in XLA where its TopK custom call is already the right tool.

No reference counterpart (the reference scores galleries with a full torch
cdist/matmul + sort, utils reconstruction SURVEY.md §2.6); TPU-native
serving work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def pack_serving_gallery(db_signs):
    """(N, nbit) ±1 -> ((N_pad//P, 128) int8, N_pad) with P = 128//nbit rows
    packed per 128-lane row.

    Why: Mosaic tiles int8 operands to 128 lanes, so a (N, 64) gallery fed
    to the kernel is relayout-COPIED with 2x lane padding (+12G HBM at N=1e8
    — the OOM in the round-3 log). A 128-lane packed gallery matches the
    tile exactly: zero copy, zero padding, and the MXU contraction runs at
    K=128 instead of K=nbit. Pad rows are all-zero codes (distance nbit/2)
    — the same convention as ops/sharded.shard_gallery padding; callers
    account for them via the returned count.
    """
    # strict ±1 (0 -> -1, the pack_bits convention): keeps the kernel's
    # dot-sims consistent with the bit-packed popcount rescore for codes
    # carrying exact-0 components
    db = jnp.where(jnp.asarray(db_signs) > 0, 1, -1).astype(jnp.int8)
    N, nbit = db.shape
    assert 128 % nbit == 0, "nbit must divide 128 for the packed layout"
    P = 128 // nbit
    pad = (-N) % P
    if pad:
        db = jnp.concatenate([db, jnp.zeros((pad, nbit), jnp.int8)])
    return db.reshape((N + pad) // P, 128), N + pad


def _block_diag_queries(qi, P: int):
    """(Q, nbit) int8 -> (P*Q, 128) block-diagonal: row p*Q+q holds q_q in
    lane group p, zeros elsewhere — so (packed_db @ qc^T)[:, p*Q+q] is the
    similarity of packed-slot-p originals with query q."""
    Q, nbit = qi.shape
    eye = jnp.eye(P, dtype=jnp.int8)
    return (eye[:, None, :, None] * qi[None, :, None, :]).reshape(
        P * Q, P * nbit)


# VMEM budget for the packed kernel's per-chunk (chunk2, P*Q) int32 sim
# tile; 4MB leaves room for the db block + double buffering under the 16MB
# scoped-vmem limit (P*Q=1024 measured 76KB over the limit at 8MB tiles)
_SIM_TILE_BYTES = 4 << 20


def _mins_kernel_packed(qc_ref, db_ref, o_ref, *, nbit: int, P: int,
                        subblock: int, block_rows2: int, n_rows2: int,
                        Q: int, chunk2: int, out_dtype):
    """Packed-gallery variant: db rows are 128-lane packs of P originals;
    qc is the block-diagonal query matrix. An inner static loop walks
    ``chunk2``-row chunks of the tile (keeps the (chunk2, P*Q) int32 sim
    tile small while amortizing grid-step overhead — the plain kernel's
    one-dot-per-step form measured grid-bound at 10M+ galleries). Group-max
    over sublane groups of subblock//P packed rows, then over the P lane
    groups.

    The tail-row mask runs ONLY on the last grid step (pl.when): the
    per-chunk iota+compare+select over the (chunk2, P*Q) int32 sim tile
    is pure VPU work that the round-4 probe showed dominating the gap
    between the shipped kernel (163 Tops) and the dot-only form (227 Tops
    — the v5e int8 MXU double-rate IS engaged, probe_int8_mxu)."""
    i = pl.program_id(0)
    spp = subblock // P                                    # packed rows/subblock

    def compute(mask: bool):
        for c in range(block_rows2 // chunk2):             # static inner loop
            sim2 = jax.lax.dot_general(
                db_ref[c * chunk2:(c + 1) * chunk2, :], qc_ref[...],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)          # (chunk2, P*Q)
            if mask:
                row = (jax.lax.broadcasted_iota(jnp.int32, sim2.shape, 0)
                       + i * block_rows2 + c * chunk2)
                sim2 = jnp.where(row < n_rows2, sim2, -(nbit + 2))
            g = sim2.reshape(chunk2 // spp, spp, sim2.shape[1])
            gmax = jnp.max(g, axis=1)                      # (nblk, P*Q)
            m = gmax[:, 0:Q]
            for p in range(1, P):                          # static lane-group max
                m = jnp.maximum(m, gmax[:, p * Q:(p + 1) * Q])
            nblk = chunk2 // spp
            o_ref[c * nblk:(c + 1) * nblk, :] = (
                0.5 * (nbit - m).astype(jnp.float32)).astype(out_dtype)

    if n_rows2 % block_rows2:
        last = pl.num_programs(0) - 1
        pl.when(i == last)(lambda: compute(True))
        pl.when(i != last)(lambda: compute(False))
    else:
        compute(False)


def subblock_min_dists_packed(q_signs, db_packed, subblock: int = 64,
                              block_rows2: int | None = None,
                              interpret: bool = False,
                              out_dtype=jnp.float32):
    """Packed-gallery per-subblock min distances: (Q, nbit) x (Np, 128)
    int8 (P = 128//nbit originals per row, ops from pack_serving_gallery)
    -> (ceil(Np*P/S), Q) transposed mins in ``out_dtype``.

    ``out_dtype=jnp.bfloat16`` is EXACT for nbit <= 128: every Hamming
    half-integer distance (and the nbit+1 pad value) is <= 129 < 256, all
    representable in bf16's 8-bit mantissa — and it halves the mins write
    plus every downstream pass over them (the 1.6GB mins array at the 1e8
    serving point).

    The packed layout matches Mosaic's int8 tile exactly (128 lanes), so
    the kernel reads the gallery IN PLACE — the (N, nbit<128) form costs a
    whole-gallery relayout copy with 128/nbit lane padding (the 12G OOM at
    N=1e8 in PARITY.md's round-3 log) — and the MXU contracts over K=128.
    """
    Q, nbit = q_signs.shape
    assert 128 % nbit == 0
    P = 128 // nbit
    Np = db_packed.shape[0]
    N = Np * P
    assert subblock % P == 0
    spp = subblock // P
    # size the inner chunk so the (chunk2, P*Q) int32 sim tile stays within
    # ~4MB of VMEM — the old step heuristic (2048 below P*Q=1024) left the
    # tile at 8MB at exactly P*Q=1024 (nbit=32, Q=256), 76KB past the 16MB
    # scoped-vmem limit once double buffering is counted (measured OOM)
    budget_rows = (_SIM_TILE_BYTES // 4 // max(P * Q, 1)) // spp * spp
    chunk2 = max(spp, min(2048, budget_rows))
    chunk2 = max(spp, min(chunk2, _cdiv(Np, spp) * spp))   # tiny-gallery safe
    if block_rows2 is None:
        block_rows2 = 4 * chunk2
    else:
        assert block_rows2 % spp == 0
        chunk2 = min(chunk2, block_rows2)
        while block_rows2 % chunk2:        # largest spp-multiple divisor
            chunk2 -= spp
    assert block_rows2 % chunk2 == 0 and chunk2 % spp == 0, (
        block_rows2, chunk2, spp)
    grid = _cdiv(Np, block_rows2)
    qi = jnp.where(q_signs > 0, 1, -1).astype(jnp.int8)  # strict ±1
    m_pad = grid * (block_rows2 // spp)

    if not _HAS_PALLAS or (not interpret
                           and jax.default_backend() != "tpu"):
        return _mins_reference(qi, db_packed.reshape(N, nbit), subblock,
                               m_pad, out_dtype)

    if (not interpret and out_dtype == jnp.bfloat16
            and (block_rows2 // spp) % 16):
        # bf16 tiles are (16, 128): an out block whose row count isn't a
        # 16-multiple would straddle sublane tiles across grid steps —
        # unexercised Mosaic geometry; bf16 is an optimization, fall back
        out_dtype = jnp.float32
    qc = _block_diag_queries(qi, P)                        # (P*Q, 128)
    out = pl.pallas_call(
        functools.partial(_mins_kernel_packed, nbit=nbit, P=P,
                          subblock=subblock, block_rows2=block_rows2,
                          n_rows2=Np, Q=Q, chunk2=chunk2,
                          out_dtype=out_dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((P * Q, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows2, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows2 // spp, Q),
                               lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, Q), out_dtype),
        interpret=interpret,
    )(qc, db_packed)
    return out


def _mins_kernel(q_ref, db_ref, o_ref, *, nbit: int, subblock: int,
                 block_rows: int, n_rows: int, out_dtype):
    """One db row-block: simT = db_blk @ q^T (MXU, int32), group-max over
    sublane groups of `subblock`, emit min DISTANCES. Tail-row mask runs
    only on the LAST grid step (pl.when) — see _mins_kernel_packed."""
    i = pl.program_id(0)

    def compute(mask: bool):
        sim = jax.lax.dot_general(
            db_ref[...], q_ref[...],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)              # (Bt, Q)
        if mask:
            row = (jax.lax.broadcasted_iota(jnp.int32, sim.shape, 0)
                   + i * block_rows)
            # padded rows get sim below any real value -> dist above any real
            sim = jnp.where(row < n_rows, sim, -(nbit + 2))
        g = sim.reshape(block_rows // subblock, subblock, sim.shape[1])
        gmax = jnp.max(g, axis=1)                           # (Bt/S, Q)
        o_ref[...] = (0.5 * (nbit - gmax).astype(jnp.float32)).astype(
            out_dtype)

    if n_rows % block_rows:  # static predicate
        last = pl.num_programs(0) - 1
        pl.when(i == last)(lambda: compute(True))
        pl.when(i != last)(lambda: compute(False))
    else:
        compute(False)


def subblock_min_dists(q_signs, db_i8, subblock: int = 64,
                       block_rows: int | None = None,
                       interpret: bool = False,
                       out_dtype=jnp.float32):
    """Per-subblock min Hamming distance, (Q, nbit) x (N, nbit) ->
    (ceil(N/S), Q) in ``out_dtype`` (bf16 exact for nbit <= 128, see
    subblock_min_dists_packed) — TRANSPOSED (subblock-major) so the
    in-kernel group reduction splits the sublane axis, which is free,
    instead of the lane axis. Callers transpose the small mins array,
    never the distances.

    q_signs: (Q, nbit) ±1 (any float/int dtype); db_i8: (N, nbit) int8 ±1.
    Entries past N get distance nbit+1 (> any real Hamming distance).
    """
    Q, nbit = q_signs.shape
    N = db_i8.shape[0]
    if block_rows is None:
        # keep the (Bt, Q) int32 sim tile ~<=2MB of VMEM
        block_rows = 2048 if Q <= 1024 else 512
    assert block_rows % subblock == 0
    grid = _cdiv(N, block_rows)
    qi = jnp.where(q_signs > 0, 1, -1).astype(jnp.int8)  # strict ±1
    m_pad = grid * (block_rows // subblock)

    # Mosaic lowering needs a real TPU; off-TPU (CPU test mesh) use the
    # equivalent XLA form unless interpret mode is explicitly requested
    if not _HAS_PALLAS or (not interpret
                           and jax.default_backend() != "tpu"):
        return _mins_reference(qi, db_i8, subblock, m_pad, out_dtype)

    if (not interpret and out_dtype == jnp.bfloat16
            and (block_rows // subblock) % 16):
        # see subblock_min_dists_packed: keep bf16 out blocks on (16, 128)
        # tile boundaries (Q>1024 picks block_rows=512 -> 8-row blocks)
        out_dtype = jnp.float32
    out = pl.pallas_call(
        functools.partial(_mins_kernel, nbit=nbit, subblock=subblock,
                          block_rows=block_rows, n_rows=N,
                          out_dtype=out_dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((Q, nbit), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, nbit), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows // subblock, Q),
                               lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, Q), out_dtype),
        interpret=interpret,
    )(qi, db_i8)
    return out


def _mins_reference(qi, db_i8, subblock: int, m_pad: int,
                    out_dtype=jnp.float32):
    """XLA fallback with identical semantics (used when pallas is absent;
    also the oracle in tests)."""
    Q, nbit = qi.shape
    N = db_i8.shape[0]
    sim = jax.lax.dot_general(
        db_i8.astype(jnp.int8), qi,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)                   # (N, Q)
    pad = m_pad * subblock - N
    if pad:
        sim = jnp.concatenate(
            [sim, jnp.full((pad, Q), -(nbit + 2), jnp.int32)])
    gmax = sim.reshape(m_pad, subblock, Q).max(axis=1)
    return (0.5 * (nbit - gmax).astype(jnp.float32)).astype(out_dtype)


# direct lax.top_k is cheap below this many subblock mins per row; above it
# the hierarchical no-fallback selection + exact theta_next wins
# (tests monkeypatch this to force the large-m branch on small inputs)
_INNER_DIRECT_MAX = 32768

# codes per chunk in pack_bits_serving's chunked build (tests monkeypatch
# this to exercise the lax.map path on small galleries)
_PACK_CHUNK_CODES = 1 << 22


def _approx_smallest_rows(x, kk: int, sub2: int = 64, cap2: int | None = None,
                          return_theta: bool = False, mins2=None):
    """Indices of ~the kk smallest entries of each row of (Q, m) — a
    superblock-min hierarchy with NO exactness fallback: ties at the
    selection boundary may be missed. Callers MUST pair this with an exact
    certificate (exact_topk_minspass checks theta_next over the true
    unselected set; a missed small value shrinks theta_next and fails the
    certificate instead of corrupting results).

    With the default cap2 = kk the selection is certificate-equivalent to
    an exact inner top_k: let B be the kk-th smallest value; there are
    < kk values strictly below B, so every superblock whose min is < B is
    among the kk smallest superblock mins and gets selected — all values
    < B are gathered, every unselected entry is >= B, and theta_next
    computed over the unselected set equals the exact selection's
    (kk+1)-th-min theta. (A smaller cap2 can miss boundary values and only
    costs fallbacks, never correctness.)

    return_theta=True additionally returns theta = EXACT min over the
    unselected entries of each row, (Q,) — for free from the two top_k
    passes already performed: the unselected set is (gathered entries
    beyond the kk selected) ∪ (entries of unselected superblocks), so
    theta = min((kk+1)-th smallest gathered value, (cap2+1)-th smallest
    superblock min) — the second term because each unselected superblock's
    min IS one of its entries. This replaces a scatter + full min-reduce
    over (Q, m) (a whole extra HBM pass — 1.6GB at the 100M point).

    Cost: one min-reduce pass over x (HBM bandwidth), a top_k over m/sub2,
    and a top_k over kk*sub2 gathered candidates — at m = 1.56M, kk = 1024
    (the 100M-gallery point) ~10ms vs 116ms for an exact top_k over m.

    ``mins2``: optional precomputed (Q, m/sub2) superblock mins (requires
    m % sub2 == 0). exact_topk_minspass reduces them in the Pallas output's
    OWN (m, Q) layout before the one big transpose — reducing the
    transposed (Q, m, sub2) view makes XLA materialize a second
    full-size relayout copy of x (the 2.98GB copy.68 in the round-4 1e8
    OOM dump), and the pad concat here a third.
    """
    Q, m = x.shape
    if cap2 is None:
        cap2 = kk
    cap2 = max(cap2, 2 * _cdiv(kk, sub2))
    if mins2 is None:
        pad = (-m) % sub2
        if pad:
            x = jnp.concatenate(
                [x, jnp.full((Q, pad), jnp.inf, x.dtype)], axis=1)
        m2 = (m + pad) // sub2
        x3 = x.reshape(Q, m2, sub2)
        mins2 = x3.min(axis=-1)                               # (Q, m2)
    else:
        assert m % sub2 == 0, "precomputed mins2 needs sub2-aligned m"
        m2 = m // sub2
        assert mins2.shape == (Q, m2), (mins2.shape, (Q, m2))
        x3 = x.reshape(Q, m2, sub2)
    cap2 = min(cap2, m2)
    cap2p = min(cap2 + 1, m2) if return_theta else cap2
    neg_sb, si_all = jax.lax.top_k(-mins2, cap2p)             # superblocks
    si = si_all[:, :cap2]
    g = jnp.take_along_axis(x3, si[:, :, None], axis=1)       # (Q, cap2, S2)
    neg_g, li_all = jax.lax.top_k(-g.reshape(Q, cap2 * sub2),
                                  kk + 1 if return_theta else kk)
    li = li_all[:, :kk]
    idx = jnp.take_along_axis(si, li // sub2, axis=1) * sub2 + li % sub2
    if not return_theta:
        return idx
    theta_gathered = -neg_g[:, kk]                            # (kk+1)-th value
    theta_sb = (-neg_sb[:, cap2] if cap2p > cap2
                else jnp.full((Q,), jnp.inf, x.dtype))        # all sb selected
    return idx, jnp.minimum(theta_gathered, theta_sb)


def pack_bits_serving(db_i8, nbit: int | None = None, subblock: int = 64):
    """uint32 bit-pack of a sign gallery for the rescore gather: (N, nbit)
    int8 signs or the 128-lane packed form -> (ceil(N/subblock),
    subblock*nbit//32) uint32, one SUBBLOCK of codes per row (512B rows at
    nbit=64/S=64 — the contiguous chunk the rescore gathers). 8 bytes/code
    at nbit=64 instead of 64, so the candidate gather in
    ``exact_topk_minspass`` moves 8x less HBM (1.07GB -> 134MB at the
    100M/cap-1024 point, probe_s4). Bit j set iff sign > 0 (matches
    ops/hamming.pack_bits). Pad rows (all-zero codes) pack to 0x0 and
    rescore as popcount(q) — NOT the sign path's nbit/2 — so galleries with
    pad rows MUST pass ``n_valid`` to the serving calls (the documented
    contract; the mask runs before any distance is used).

    Memory (round 4, 1e8x64): chunks are cut with dynamic_slice IN THE
    INPUT'S OWN LAYOUT (a whole-gallery reshape of the packed form to
    (N, nbit<128) stores lane-padded to 128 — 2x the gallery — and a
    lax.map over a pre-reshaped xs copies the operand into the loop), and
    every materialized output has a >=128-lane trailing dim: a stacked
    (chunks, chunk, nbit//32) map output gets tiled with its 2-element
    minor axis padded to 128 lanes — 64x the data, a 49GB allocation.

    Speed (round 4, probe_pack_bits, v5e, 1e8x64 packed): the per-chunk
    ``blk.reshape(-1, nbit)`` was 96% of the cost — it IS the 2x lane-pad
    relayout copy in disguise (437ms/4.19M-code chunk; the shift-reduce on
    the native 128-lane layout is 17ms). Codes sit in lane-major order
    inside a stored row (pack_serving_gallery asserts P*nbit == 128), so
    the 32-lane word grid of a (m, 128) block IS the code-major word
    stream — pack straight off the stored layout, never reshape to
    (N, nbit). Measured whole-gallery build at 1e8: 3,366ms -> ~390ms."""
    from concepthash_tpu.ops.hamming import pack_bits

    if nbit is None:
        if db_i8.shape[1] == 128:
            raise ValueError(
                "a 128-lane gallery is ambiguous (plain nbit=128 vs the "
                "packed layout of any nbit dividing 128) — pass nbit "
                "explicitly")
        nbit = db_i8.shape[1]
    if nbit % 32 != 0:
        raise ValueError(
            f"serving bit-pack needs nbit to be a 32-multiple (uint32 "
            f"words), got {nbit}; the sign-row rescore path handles other "
            f"widths")
    L = nbit // 32
    lanes = db_i8.shape[1]
    P = lanes // nbit                       # codes per stored row (1 if plain)
    Nr = db_i8.shape[0]                     # stored rows
    N = Nr * P

    if nbit % 32 == 0 and P * nbit == lanes:
        def to_words(blk):  # (m, lanes) int8 -> (m*P, L) u32, NO relayout
            # pack_bits on the STORED last dim: its 32-lane word grid is
            # already the code-major word stream when P*nbit == lanes
            return pack_bits(blk).reshape(-1, L)
    else:  # ragged lane tail (plain nbit not a 32-multiple): generic path
        def to_words(blk):
            return pack_bits(blk.reshape(-1, nbit))

    def chunk_rows(words):                  # (M, L) -> (M/S, S*L), zero-pad
        pad = (-words.shape[0]) % subblock
        if pad:
            words = jnp.concatenate(
                [words, jnp.zeros((pad, L), jnp.uint32)])
        return words.reshape(-1, subblock * L)

    assert P == 1 or subblock % P == 0
    codes_per_chunk = max(subblock, _PACK_CHUNK_CODES
                          - _PACK_CHUNK_CODES % subblock)
    chunk_r = codes_per_chunk // P          # stored rows per chunk
    assert chunk_r > 0 and chunk_r * P % subblock == 0
    if Nr <= chunk_r:
        return chunk_rows(to_words(db_i8))
    nfull = Nr // chunk_r

    def body(i):
        blk = jax.lax.dynamic_slice(db_i8, (i * chunk_r, 0), (chunk_r, lanes))
        return chunk_rows(to_words(blk))

    out = jax.lax.map(body, jnp.arange(nfull)).reshape(
        nfull * (chunk_r * P // subblock), subblock * L)
    if Nr % chunk_r:
        out = jnp.concatenate(
            [out, chunk_rows(to_words(db_i8[nfull * chunk_r:]))])
    assert out.shape[0] == _cdiv(N, subblock)
    return out


def exact_topk_minspass(q_signs, db_i8, k: int, subblock: int = 64,
                        cap: int | None = None, interpret: bool = False,
                        n_valid=None, db_bits=None, retry_mult: int = 2):
    """Exact top-k candidates over an int8 sign gallery via the fused mins
    kernel + hierarchical selection + db-row gather rescore.

    ``db_i8`` is either (N, nbit) int8 signs or the 128-lane packed form
    from ``pack_serving_gallery`` ((Np, 128) with P = 128//nbit originals
    per row, detected by shape) — packed is the zero-copy layout for the
    kernel; the gather/rescore stages read both layouts identically
    because packing is a row-major reshape.

    ``db_bits``: optional (N, nbit//32) uint32 bit-pack of the same gallery
    (``pack_bits_serving``). When given, the candidate rescore gathers 8
    bytes/code instead of 64 and scores with XOR+popcount on the VPU —
    measured 27.9ms -> ~4ms of gather traffic at the 100M/cap-1024 point
    (probe_s4). When omitted in the large-m regime (> _INNER_DIRECT_MAX
    subblocks) it is derived in-call — one extra gallery read, vs the
    sign-row rescore's whole-gallery subblock reshape, which is a 6.4GB
    relayout copy at 1e8x64 (the round-4 OOM); serve with a precomputed
    one. Galleries with pad rows must pass ``n_valid`` (pad codes
    bit-pack to 0x0, which rescored via popcount is NOT the sign path's
    nbit/2; the n_valid mask applies before any distance is consumed).

    Returns (distances (Q, k) f32, indices (Q, k) i32, valid () bool).
    ``valid`` is the exactness certificate: the k-th distance of every query
    is strictly below the best UNSELECTED subblock min, so no entry outside
    the gathered candidates can belong to the top-k (same argument as
    ops/retrieval.exact_topk_blocked). When valid is False the caller MUST
    fall back to an exact path — results here may miss tied entries.

    ``retry_mult``: when the certificate fails at the first candidate
    budget, ONE on-device retry runs at ``retry_mult * cap`` reusing the
    already-computed subblock mins (a lax.cond, executed only on failure)
    before the returned ``valid`` sends the caller to its full fallback.
    Auto cap is 512 at every scale (certificate-valid on 3 seeds at the
    1e8 point, probe_cap: 2309 qps vs 1806 at the old 1024) — tie-heavy
    real-code galleries pay the 2x retry instead of the full-scan cliff.

    ``n_valid``: real row count when the gallery carries pad rows (the
    all-zero codes from pack_serving_gallery / shard_gallery sit at distance
    nbit/2, NOT inf-like); rows >= n_valid are masked to +inf in the rescore
    so pad indices never surface (a pure-pad selected subblock only wastes
    candidate budget — the certificate then fails and the caller's exact
    fallback runs). May be a traced scalar.
    """
    Q, nbit = q_signs.shape
    packed = db_i8.ndim == 2 and db_i8.shape[1] == 128 and nbit != 128
    P = 128 // nbit if packed else 1
    N = db_i8.shape[0] * P
    if cap is None:
        cap = 512
    # strict ±1 (0 -> -1, the torch.sign-as-negative bit convention of
    # pack_bits): jnp.sign would keep exact-0 components as 0, making the
    # kernel mins (0 contributes sim 0) and the bit-packed popcount rescore
    # (0 packs as -1) disagree by ±0.5 per zero bit — the certificate could
    # then validate a ranking inconsistent with its own theta_next.
    qi = jnp.where(q_signs > 0, 1, -1).astype(jnp.int8)
    m_real = _cdiv(N, subblock)
    nv = N if n_valid is None else n_valid

    if m_real <= cap:
        # fewer subblocks than the candidate budget: the "selection" is the
        # whole gallery — dense rescore, unconditionally exact
        rows_db = db_i8.reshape(N, nbit) if packed else db_i8
        sim = jax.lax.dot_general(
            qi, rows_db, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        dist = 0.5 * (nbit - sim).astype(jnp.float32)
        if n_valid is not None:
            col = jnp.arange(N, dtype=jnp.int32)
            dist = jnp.where(col < nv, dist, jnp.inf)
        neg, idx = jax.lax.top_k(-dist, k)
        return -neg, idx, jnp.array(True)

    large_m = m_real > _INNER_DIRECT_MAX
    if large_m and db_bits is None and nbit % 32 == 0:
        # the sign-row rescore below reshapes the WHOLE gallery into
        # subblock chunks — a 6.4GB relayout copy at 1e8x64 (the round-4
        # OOM dump's reshape.29); the bit-pack is 8x smaller, memory-safe
        # to build (chunked in-layout), and 8x less gather traffic. Only
        # auto-derived at serving scale: pad rows rescore as popcount(q)
        # under bits (not the sign path's nbit/2), so pad-carrying
        # galleries must pass n_valid — the documented serving contract.
        db_bits = pack_bits_serving(db_i8, nbit, subblock=subblock)
    # bf16 mins are EXACT for nbit <= 128 (all half-integer distances and
    # the nbit+1 pad value are < 256, inside bf16's 8-bit mantissa) and
    # halve the kernel's mins write + the superblock reduce + the transpose
    # (~1.6GB f32 at the 1e8 point).
    mdt = jnp.bfloat16 if nbit <= 128 else jnp.float32
    if packed:
        mins_t = subblock_min_dists_packed(qi, db_i8, subblock=subblock,
                                           interpret=interpret,
                                           out_dtype=mdt)
    else:
        mins_t = subblock_min_dists(qi, db_i8, subblock=subblock,
                                    interpret=interpret,
                                    out_dtype=mdt)           # (m_pad, Q)
    if large_m:
        # Keep the mins in the kernel's (m, Q) layout as long as possible:
        # reduce superblocks natively, then ONE transpose to (Q, m) for the
        # per-entry gather. Slicing to m_real + transposing + re-padding
        # (the round-3 form) kept THREE ~1.5GB relayout copies of the mins
        # live at the 1e8 point (round-4 OOM dump, allocs 2-4); kernel pad
        # rows carry distance nbit+1 (> any real), which is exactly the
        # +inf-like padding the selection needs, so they stay in-band.
        sub2 = 64
        pad2 = (-mins_t.shape[0]) % sub2
        if pad2:
            mins_t = jnp.concatenate(
                [mins_t,
                 jnp.full((pad2, Q), float(nbit + 1), mins_t.dtype)])
        msb = mins_t.reshape(-1, sub2, Q).min(axis=1).T      # (Q, m2) small
        mins = mins_t.T                                      # (Q, m_pad2)
    else:
        mins = mins_t[:m_real].T                             # (Q, m) small

    # rescore gather source: bit-packed rows when available (8 bytes/code),
    # else the int8 sign rows. Whole SUBBLOCKS are gathered (contiguous
    # subblock*nbit/8- or subblock*nbit-byte chunks), not rows: scattered
    # 64-byte row reads measured ~130ms for 537MB at the 10M point —
    # subblock-chunk gathers run near HBM gather bandwidth.
    if db_bits is not None:
        L = nbit // 32
        assert db_bits.shape[1] % L == 0, (db_bits.shape, nbit)
        if db_bits.shape[1] == subblock * L:
            src_sb = db_bits           # canonical subblock-chunk serving form
        else:
            # per-code row form (N, L), or chunked at another subblock:
            # re-chunk to this call's (small galleries — serving callers
            # pack with the matching subblock so this is a no-op there)
            words = (db_bits if db_bits.shape[1] == L
                     else db_bits.reshape(-1, L))
            pad_rows = (-words.shape[0]) % subblock
            if pad_rows:
                words = jnp.concatenate(
                    [words, jnp.zeros((pad_rows, L), jnp.uint32)])
            src_sb = words.reshape(-1, subblock * L)
        from concepthash_tpu.ops.hamming import pack_bits

        q_bits = pack_bits(qi)                               # (Q, L)
    else:
        lanes = db_i8.shape[1]
        pad_rows = (-db_i8.shape[0]) % ((subblock // P) if packed
                                        else subblock)
        dbp = (jnp.concatenate(
            [db_i8, jnp.zeros((pad_rows, lanes), jnp.int8)]) if pad_rows
            else db_i8)
        src_sb = dbp.reshape(-1, subblock * nbit)

    def _select_rescore(cap_i: int):
        # Select the ~cap_i smallest subblock mins. The selection itself
        # need NOT be exact — exactness rests entirely on theta_next being
        # a true lower bound over the UNSELECTED subblocks plus the final
        # certificate below (any entry outside the selected subblocks is
        # >= its subblock min >= theta_next). Round 3 ran an exact inner
        # selection here (exact_topk_blocked(mins, cap+1)); at 100M entries
        # its own tie certificate failed on tie VOLUME and silently paid a
        # full lax.top_k over (Q, 1.56M) = 116 of the 211ms call
        # (probe_minspass, PARITY.md roadmap 3). Now: small m -> one direct
        # top_k (exact theta for free); large m -> hierarchical selection
        # WITHOUT a fallback, theta_next exact from the selection's own
        # top_k passes (see return_theta) — ties the inner cost to HBM
        # bandwidth instead of sort throughput.
        if not large_m:
            neg_mv, sel_all = jax.lax.top_k(-mins, cap_i + 1)
            sel = sel_all[:, :cap_i]                         # (Q, cap_i)
            theta_next = -neg_mv[:, cap_i]
        else:
            sel, theta_next = _approx_smallest_rows(mins, cap_i, sub2=sub2,
                                                    return_theta=True,
                                                    mins2=msb)

        rows = (sel[:, :, None] * subblock
                + jnp.arange(subblock, dtype=sel.dtype)).reshape(
                    Q, cap_i * subblock)
        gathered = jnp.take(
            src_sb, jnp.minimum(sel, src_sb.shape[0] - 1).reshape(-1),
            axis=0)
        if db_bits is not None:
            # keep every materialized shape >=128 lanes wide: a
            # (Q, cap_i*S, L) view of the gathered words tiles its L-wide
            # minor axis to 128 lanes — 64x the data, an 8GB allocation at
            # the 1e8 retry point (round-4 OOM dump). XOR/popcount run on
            # the (Q, cap_i, S*L) chunk shape; the per-code word sum is an
            # MXU contraction with a repeat-eye matrix instead of a
            # reshape+sum over an L-minor axis.
            x = jnp.bitwise_xor(gathered.reshape(Q, cap_i, subblock * L),
                                jnp.tile(q_bits, (1, subblock))[:, None, :])
            pc = jax.lax.population_count(x).astype(jnp.int8)  # <=32/word
            wsum = jnp.repeat(jnp.eye(subblock, dtype=jnp.int8), L, axis=0)
            dist_c = jax.lax.dot_general(
                pc, wsum, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(
                    jnp.float32).reshape(Q, cap_i * subblock)
        else:
            cand = gathered.reshape(Q, cap_i, subblock, nbit)
            sim_c = jax.lax.dot_general(
                cand, qi, dimension_numbers=(((3,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32)            # (Q, cap_i, S)
            dist_c = 0.5 * (nbit - sim_c).astype(jnp.float32).reshape(
                Q, cap_i * subblock)
        dist_c = jnp.where(rows >= nv, jnp.inf, dist_c)
        negd, li = jax.lax.top_k(-dist_c, k)
        d = -negd
        idx = jnp.take_along_axis(rows, li, axis=1)
        valid = jnp.all(d[:, -1] < theta_next)
        return d, idx, valid

    d1, i1, v1 = _select_rescore(cap)
    # m_real - 1: the direct branch's top_k(cap_i + 1) must fit in a row
    cap_retry = min(retry_mult * cap, m_real - 1)
    if cap_retry <= cap:
        return d1, i1, v1
    return jax.lax.cond(
        v1, lambda _: (d1, i1, v1),
        lambda _: _select_rescore(cap_retry), None)


# ---------------------------------------------------------------------------
# bit-plane serving layout: 1 bit/bit (8 bytes/code at nbit=64) — the 1e9-
# codes-on-one-chip format. The int8 sign layout costs nbit bytes/code
# (64 GB at 1e9x64, 4x any single chip here); this one is 8 GB. No
# reference counterpart (the reference scores with full torch matmuls).
# ---------------------------------------------------------------------------


def pack_bitplane_serving(db, nbit: int | None = None):
    """Sign gallery -> bit-plane serving form: ((Gp, 128) uint8, n_pad).

    Accepts (N, nbit) ±1 signs or the 128-lane packed int8 form from
    ``pack_serving_gallery``. Bit j of ``bp[g, l]`` is the sign bit
    (``> 0``, the pack_bits convention) of packed row ``8*g + j`` at lane
    ``l`` — i.e. bits are packed along the SUBLANE axis in groups of 8
    packed rows, NOT along the code's bit axis like ``pack_bits_serving``.
    Why this orientation: the mins kernel unpacks a byte tile with 8
    mask+compare passes whose outputs are full 128-lane int8 tiles stacked
    into one MXU dot; a code-major word pack would need a cross-lane
    scatter of each word's 32 bits, which Mosaic lowers as an expensive
    relayout.

    ``n_pad`` counts codes in the stored form: N rounded up to P codes per
    packed row and then to 8 packed rows per byte. A bit-plane has no
    zero state, so BOTH pad kinds store as ALL-NEGATIVE codes (bits 0x00)
    — unlike the int8 layout's zero codes at nbit/2, these are
    real-looking. Whole pad packed ROWS are masked to nbit+1 by the mins
    kernel via ``n_rows``; pad SLOTS sharing the last partial row cannot
    be, so serving calls MUST pass ``n_valid`` (the rescore masks them to
    +inf before any distance is consumed — same contract as minspass).
    """
    db = jnp.asarray(db)
    if db.shape[1] == 128 and (nbit is None or nbit != 128):
        if nbit is None:
            raise ValueError(
                "a 128-lane input is ambiguous (plain nbit=128 vs the "
                "packed layout of any nbit dividing 128) — pass nbit")
        packed, n_pad = db.astype(jnp.int8), db.shape[0] * (128 // nbit)
    else:
        if nbit is None:
            nbit = db.shape[1]
        assert db.shape[1] == nbit
        packed, n_pad = pack_serving_gallery(db)
    P = 128 // nbit
    rows = packed.shape[0]
    pad_r = (-rows) % 8
    bits = (packed > 0).astype(jnp.uint8)
    if pad_r:
        bits = jnp.concatenate([bits, jnp.zeros((pad_r, 128), jnp.uint8)])
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bp = (bits.reshape(-1, 8, 128) << shifts[None, :, None]).sum(
        axis=1, dtype=jnp.uint8)
    return bp, n_pad + pad_r * P


def unpack_bitplane(bp):
    """(G, 128) uint8 bit-planes -> (G*8, 128) int8 ±1 packed rows (the
    pack_serving_gallery layout). Test/dense-path helper; at serving scale
    the kernel unpacks per-tile in VMEM instead."""
    bp = jnp.asarray(bp)
    shifts = jnp.arange(8, dtype=jnp.uint8)
    u = ((bp[:, None, :] >> shifts[None, :, None]) & 1).astype(jnp.int8)
    return (u * 2 - 1).reshape(-1, 128)


def _mins_kernel_bitplane(qc_ref, bp_ref, o_ref, *, nbit: int, P: int,
                          subblock: int, block_g: int, n_rows2: int, Q: int,
                          chunk_g: int, out_dtype, unpack: str = "i32_shift"):
    """Bit-plane variant of ``_mins_kernel_packed``: each uint8 db row packs
    8 packed rows along the sublane axis; the kernel unpacks plane j with a
    shift/and (pure VPU, ~1/3 the elements of the matmul's output tile) and
    runs the same int8 MXU dot per plane, max-combining planes in
    registers. Packed rows 8g..8g+7 share byte row g, so with
    ``subblock % (8*P) == 0`` every plane of a byte group lands in the same
    subblock and the group-max over planes/byte-rows/lane-slots is exactly
    the packed kernel's subblock min — row order inside a subblock never
    matters for a min.

    ``unpack`` selects the plane-extraction form. All three compute
    identical mins (equality-tested in interpret mode and on the real TPU
    at 1e6); per-code MACs and reduce work are identical — they differ
    only in how the work is PRESENTED to the MXU. Measured at 1e8/Q=256
    (r5 probe, scripts/probe_bitplane_unpack.py, mins-kernel-only):
    - "i8_stack" (default): extract all 8 planes into one (8*chunk_g, 128)
      i8 operand (and+compare legalize on vector<i8>) and run ONE tall MXU
      dot per chunk — 34 ms/call, within 18% of the int8 packed kernel
      measured same-process/same-accounting (29.3 ms, 112 vs 95 useful
      int8-Tops at 2 ops per logical nbit-MAC; probe_packed_vs_stack) on
      8x less HBM. The per-plane forms lose 2.4x to pipeline drain: 8
      small dependent dot+reduce pairs never keep the MXU fed.
    - "i32_shift": promote the byte tile to i32 once, ``(tile >> j) & 1``
      per plane (vector shifts only legalize at 32 bits), truncate to i8 —
      81 ms/call.
    - "i8_mask": per-plane ``(tile & (1 << j)) != 0`` on the stored uint8
      tile — 85 ms/call (the i32 promotion was never the tax)."""
    i = pl.program_id(0)
    spp = subblock // P                    # packed rows per subblock
    gps = spp // 8                         # byte (bit-plane) rows per subblock

    def compute(mask: bool):
        # ±1 sims from {0,1} planes via the affine identity
        # <2b-1, q> = 2<b, q> - sum(q): int8 MULTIPLY doesn't legalize in
        # Mosaic (arith.muli on vector<i8>), so the unpack stays {0,1} and
        # the x2 - qsum correction runs on int32. The affine commutes with
        # every max (2x - qs is increasing in x; qs is constant down each
        # column and equal across the P lane groups of a query), so the
        # fast path applies it ONCE on the tiny group-reduced tile; only
        # the last grid step's mask branch pays it per plane (the pad
        # value must land at exactly nbit+1 pre-reduction).
        qs = jnp.sum(qc_ref[...].astype(jnp.int32), axis=1)   # (P*Q,)
        nblk = chunk_g // gps
        for c in range(block_g // chunk_g):            # static inner loop
            raw = bp_ref[c * chunk_g:(c + 1) * chunk_g, :]
            if unpack == "i8_stack":
                # all 8 planes extracted at once into one tall i8 operand:
                # ONE MXU dot per chunk (plane-major rows) instead of 8
                # small dependent dot+reduce pairs
                u = jnp.concatenate(
                    [(raw & jnp.uint8(1 << j)).astype(jnp.bool_).astype(
                        jnp.int8) for j in range(8)],
                    axis=0)                            # (8*chunk_g, 128)
                sim = jax.lax.dot_general(
                    u, qc_ref[...],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)  # (8*chunk_g, P*Q)
                if mask:
                    sim = 2 * sim - qs[None, :]
                    # row t of plane block j is packed row 8*(base + t) + j
                    rr = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 0)
                    r = (8 * (i * block_g + c * chunk_g + rr % chunk_g)
                         + rr // chunk_g)
                    sim = jnp.where(r < n_rows2, sim, -(nbit + 2))
                acc = sim.reshape(8, nblk, gps, sim.shape[1]).max(
                    axis=(0, 2))                       # (nblk, P*Q)
                if not mask:
                    acc = 2 * acc - qs[None, :]
                mm = acc[:, 0:Q]
                for p in range(1, P):                  # static lane-group max
                    mm = jnp.maximum(mm, acc[:, p * Q:(p + 1) * Q])
                o_ref[c * nblk:(c + 1) * nblk, :] = (
                    0.5 * (nbit - mm).astype(jnp.float32)).astype(out_dtype)
                continue
            # "i32_shift" promotes bytes to i32 once per chunk (vector
            # shifts legalize at 32 bits, not on i8 — arith.shrui on
            # vector<i8> failed to legalize) and truncates back to i8 for
            # the MXU; "i8_mask" extracts with and+compare at 8 bits
            tile = raw.astype(jnp.int32) if unpack == "i32_shift" else raw
            acc = None                                 # (nblk, P*Q), small
            for j in range(8):                         # static plane loop
                if unpack == "i32_shift":
                    u01 = ((tile >> j) & 1).astype(jnp.int8)
                else:
                    u01 = (tile & jnp.uint8(1 << j)).astype(jnp.bool_
                                                            ).astype(jnp.int8)
                sim = jax.lax.dot_general(
                    u01, qc_ref[...],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)  # (chunk_g, P*Q)
                if mask:
                    sim = 2 * sim - qs[None, :]
                    # packed-row id of plane j of byte row r is 8*r + j
                    r = (jax.lax.broadcasted_iota(jnp.int32, sim.shape, 0)
                         + i * block_g + c * chunk_g) * 8 + j
                    sim = jnp.where(r < n_rows2, sim, -(nbit + 2))
                # group-reduce BEFORE combining planes: keeping a full
                # (chunk_g, P*Q) accumulator live across the plane loop
                # doubles the working set past the sim-tile budget and
                # measured 5.6x off the int8 kernel (r5 probe, 1e8)
                g = sim.reshape(nblk, gps, sim.shape[1]).max(axis=1)
                acc = g if acc is None else jnp.maximum(acc, g)
            if not mask:
                acc = 2 * acc - qs[None, :]
            mm = acc[:, 0:Q]
            for p in range(1, P):                      # static lane-group max
                mm = jnp.maximum(mm, acc[:, p * Q:(p + 1) * Q])
            o_ref[c * nblk:(c + 1) * nblk, :] = (
                0.5 * (nbit - mm).astype(jnp.float32)).astype(out_dtype)

    if n_rows2 < pl.num_programs(0) * block_g * 8:   # static predicate
        last = pl.num_programs(0) - 1
        pl.when(i == last)(lambda: compute(True))
        pl.when(i != last)(lambda: compute(False))
    else:
        compute(False)


def subblock_min_dists_bitplane(q_signs, bp, subblock: int = 256,
                                block_g: int | None = None,
                                interpret: bool = False,
                                out_dtype=jnp.float32,
                                n_rows: int | None = None,
                                unpack: str = "i8_stack"):
    """Per-subblock min distances over a bit-plane gallery: (Q, nbit) x
    (G, 128) uint8 (from ``pack_bitplane_serving``) -> (ceil(G*8*P/S), Q)
    transposed mins in ``out_dtype`` (bf16 exact for nbit <= 128, see
    ``subblock_min_dists_packed``).

    Same MXU MACs as the int8 packed kernel (8 planes x 1/8 the rows), 8x
    less HBM read — the layout that fits 1e9 codes x 64 bits in 8 GB next
    to the mins array. Needs ``subblock % (8 * (128//nbit)) == 0`` so byte
    groups never straddle subblocks.

    ``n_rows``: count of VALID packed rows (static int). Byte-pad rows
    (bits 0x00) unpack to all-negative codes — real-looking, unlike the
    int8 layout's zero codes — so packed rows >= n_rows are masked to
    nbit+1 like grid padding. Defaults to all stored rows.
    """
    Q, nbit = q_signs.shape
    assert 128 % nbit == 0
    P = 128 // nbit
    assert subblock % (8 * P) == 0, (subblock, P)
    spp = subblock // P
    gps = spp // 8
    G = bp.shape[0]
    N = G * 8 * P                           # stored codes (incl. byte pad)
    if n_rows is None:
        n_rows = G * 8
    qi = jnp.where(q_signs > 0, 1, -1).astype(jnp.int8)  # strict ±1

    # size the inner chunk so the int32 sim tile stays within the same ~4MB
    # VMEM budget as the packed kernel — (chunk_g, P*Q) for the per-plane
    # forms, (8*chunk_g, P*Q) for the stacked single-dot form
    sim_rows_per_g = 8 if unpack == "i8_stack" else 1
    budget_rows = (_SIM_TILE_BYTES // 4 // max(P * Q, 1)
                   // sim_rows_per_g) // gps * gps
    chunk_g = max(gps, min(2048, budget_rows))
    chunk_g = max(gps, min(chunk_g, _cdiv(G, gps) * gps))  # tiny-gallery safe
    if block_g is None:
        block_g = 4 * chunk_g
    else:
        assert block_g % gps == 0
        chunk_g = min(chunk_g, block_g)
        while block_g % chunk_g:           # largest gps-multiple divisor
            chunk_g -= gps
    assert block_g % chunk_g == 0 and chunk_g % gps == 0, (
        block_g, chunk_g, gps)
    grid = _cdiv(G, block_g)
    m_pad = grid * (block_g // gps)
    # pads (byte pad + grid pad) must sit entirely in the LAST grid step —
    # the only one that runs the mask (same structure as the other kernels)
    assert n_rows > (grid - 1) * block_g * 8, (n_rows, grid, block_g)

    if not _HAS_PALLAS or (not interpret
                           and jax.default_backend() != "tpu"):
        rows_db = unpack_bitplane(bp).reshape(N, nbit)[:n_rows * P]
        return _mins_reference(qi, rows_db, subblock, m_pad, out_dtype)

    if (not interpret and out_dtype == jnp.bfloat16
            and (block_g // gps) % 16):
        # bf16 out tiles are (16, 128) — see subblock_min_dists_packed
        out_dtype = jnp.float32
    qc = _block_diag_queries(qi, P)                        # (P*Q, 128)
    out = pl.pallas_call(
        functools.partial(_mins_kernel_bitplane, nbit=nbit, P=P,
                          subblock=subblock, block_g=block_g,
                          n_rows2=n_rows, Q=Q, chunk_g=chunk_g,
                          out_dtype=out_dtype, unpack=unpack),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((P * Q, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_g, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_g // gps, Q),
                               lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, Q), out_dtype),
        interpret=interpret,
    )(qc, bp)
    return out


def exact_topk_bitplane(q_signs, bp, k: int, subblock: int = 128,
                        cap: int | None = None, interpret: bool = False,
                        n_valid=None, retry_mult: int = 2,
                        unpack: str = "i8_stack"):
    """Exact top-k over a bit-plane gallery (``pack_bitplane_serving``) —
    the 1e9-codes-on-one-chip serving path. Same selection scaffold and
    exactness certificate as ``exact_topk_minspass`` (subblock mins ->
    hierarchical selection -> candidate rescore -> certificate + one
    on-device retry); differs in the mins kernel (bit-plane unpack, 8x less
    HBM) and the rescore, which gathers 2KB contiguous byte-row slices of
    the SAME stored array (no second gallery layout in HBM — at 1e9 a
    second copy is itself 8 GB) and scores planes with shift/and + a
    (128, P) slot-sum MXU contraction.

    Galleries whose stored code count exceeds the real one (pack padding:
    zero codes at nbit/2 from the P-row pack, all-negative codes from the
    byte pad) MUST pass ``n_valid`` = real N; rows >= n_valid are masked to
    +inf before any distance is consumed, same contract as minspass.

    Returns (distances (Q, k) f32, indices (Q, k) i32, valid () bool);
    ``valid`` False means the caller must use an exact fallback.
    """
    Q, nbit = q_signs.shape
    assert 128 % nbit == 0
    P = 128 // nbit
    assert subblock % (8 * P) == 0, (subblock, P)
    gps = subblock // P // 8               # byte rows per subblock
    G = bp.shape[0]
    N = G * 8 * P                           # stored codes (incl. pads)
    m_real = _cdiv(N, subblock)
    if cap is None:
        # 512 at every subblock, like minspass: scaling cap DOWN with
        # subblock (to hold the rescored candidate count at the tuned
        # 512*64 point) failed the exactness certificate on random
        # galleries — coarse subblocks have near-equal mins (min of S
        # draws), so the selection needs MORE of them, not fewer, to get
        # theta_next above the k-th distance. Measured at 1e8/Q=256
        # (r5 probe): S=512/cap=64 2005 qps but INVALID; S=128/cap=512
        # 944 qps valid FIRST-TRY (no retry); S=128/cap=256 valid only
        # via the retry at 731 qps.
        cap = 512
    qi = jnp.where(q_signs > 0, 1, -1).astype(jnp.int8)
    nv = N if n_valid is None else n_valid

    if m_real <= cap:
        # fewer subblocks than the candidate budget: dense rescore over the
        # unpacked gallery (small galleries / tests)
        rows_db = unpack_bitplane(bp).reshape(N, nbit)
        sim = jax.lax.dot_general(
            qi, rows_db, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        dist = 0.5 * (nbit - sim).astype(jnp.float32)
        col = jnp.arange(N, dtype=jnp.int32)
        dist = jnp.where(col < nv, dist, jnp.inf)
        neg, idx = jax.lax.top_k(-dist, k)
        return -neg, idx, jnp.array(True)

    large_m = m_real > _INNER_DIRECT_MAX
    mdt = jnp.bfloat16 if nbit <= 128 else jnp.float32
    # byte-pad codes are all-negative (real-looking), so mask them at the
    # mins level too when n_valid is static — otherwise an all-negative
    # query's candidate budget drains into pad subblocks (rescore still
    # masks them; the certificate + retry keep exactness either way)
    nr = G * 8
    if isinstance(n_valid, int):
        nr = min(nr, _cdiv(n_valid, P))
    mins_t = subblock_min_dists_bitplane(qi, bp, subblock=subblock,
                                         interpret=interpret,
                                         out_dtype=mdt,
                                         n_rows=nr,
                                         unpack=unpack)      # (m_pad, Q)
    if large_m:
        # reduce superblocks in the kernel's own (m, Q) layout, ONE
        # transpose — see exact_topk_minspass (round-4 OOM lineage)
        sub2 = 64
        pad2 = (-mins_t.shape[0]) % sub2
        if pad2:
            mins_t = jnp.concatenate(
                [mins_t,
                 jnp.full((pad2, Q), float(nbit + 1), mins_t.dtype)])
        msb = mins_t.reshape(-1, sub2, Q).min(axis=1).T      # (Q, m2)
        mins = mins_t.T                                      # (Q, m_pad2)
    else:
        sub2 = 64
        msb = None
        mins = mins_t[:m_real].T                             # (Q, m)

    # query bytes for the plane rescore: lane l of the packed layout is bit
    # (l % nbit) of code slot l // nbit, so the query's mismatch byte for
    # lane l is 0xFF iff bit (l % nbit) is set (bytes compare 8 codes
    # against the SAME query lane)
    qlane = (qi > 0)[:, jnp.mod(jnp.arange(128), nbit)]      # (Q, 128) bool
    qb = jnp.where(qlane, jnp.uint8(0xFF), jnp.uint8(0))
    # (128, P) slot indicator: lane l belongs to code slot l // nbit
    slot = (jnp.arange(128)[:, None] // nbit
            == jnp.arange(P)[None, :]).astype(jnp.int8)
    # unpack-order -> in-subblock code index: plane j of byte row g_local,
    # lane slot p is packed row 8*g_local + j, code (8*g_local + j)*P + p.
    # The rescore emits (g_local, j, p)-ordered distances, which IS that
    # code order — rows stay the natural arange, same as minspass.

    def _select_rescore(cap_i: int):
        if not large_m:
            neg_mv, sel_all = jax.lax.top_k(-mins, cap_i + 1)
            sel = sel_all[:, :cap_i]                         # (Q, cap_i)
            theta_next = -neg_mv[:, cap_i]
        else:
            sel, theta_next = _approx_smallest_rows(mins, cap_i, sub2=sub2,
                                                    return_theta=True,
                                                    mins2=msb)
        rows = (sel[:, :, None] * subblock
                + jnp.arange(subblock, dtype=sel.dtype)).reshape(
                    Q, cap_i * subblock)
        # gather WHOLE subblocks as gps consecutive byte rows (gps*128 B
        # contiguous — 2KB at S=256/nbit=64; scattered sub-512B reads are
        # ~50x slower, round-4 measurement) straight from the stored array
        start = jnp.minimum(sel * gps, max(G - gps, 0)).reshape(-1)
        gath = jax.vmap(
            lambda s: jax.lax.dynamic_slice(bp, (s, 0), (gps, 128)))(start)
        gath = gath.reshape(Q, cap_i, gps, 128)
        x = jnp.bitwise_xor(gath, qb[:, None, None, :])
        dj = []
        for j in range(8):                                   # static planes
            bits = ((x >> j) & 1).astype(jnp.int8)
            dj.append(jax.lax.dot_general(
                bits, slot, (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.int32))           # (Q,cap,gps,P)
        # (g_local, j, p) order == in-subblock code order (see above)
        dist_c = jnp.stack(dj, axis=3).astype(jnp.float32).reshape(
            Q, cap_i * subblock)
        dist_c = jnp.where(rows >= nv, jnp.inf, dist_c)
        negd, li = jax.lax.top_k(-dist_c, k)
        d = -negd
        idx = jnp.take_along_axis(rows, li, axis=1)
        valid = jnp.all(d[:, -1] < theta_next)
        return d, idx, valid

    d1, i1, v1 = _select_rescore(cap)
    cap_retry = min(retry_mult * cap, m_real - 1)
    if cap_retry <= cap:
        return d1, i1, v1
    return jax.lax.cond(
        v1, lambda _: (d1, i1, v1),
        lambda _: _select_rescore(cap_retry), None)
