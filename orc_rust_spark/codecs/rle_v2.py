"""ORC RLEv2 integer run-length encoding (public Apache ORC v1 spec).

Four sub-encodings, selected per run of <= 512 values:

- SHORT_REPEAT  header ``00wwwccc`` + big-endian value        (3-10 repeats)
- DIRECT        ``01`` + 5-bit width code + 9-bit (len-1), bit-packed values
- PATCHED_BASE  ``10`` + 4-byte header; frame-of-reference (value - min)
                bit-packed at the 95th-percentile width, outliers patched
                via a (gap, patch-bits) list
- DELTA         ``11`` + 5-bit width code + 9-bit (len-1); varint base +
                signed-varint first delta + bit-packed |deltas|

The encoder reproduces the ORC writer heuristics — the run state machine
(fixed runs of >= 3 -> short-repeat/fixed-delta; variable spans chunked at
512 through the sub-encoding selector) and the percentile-bit-width based
DIRECT vs PATCHED_BASE choice.

Reference parity (behavioral, not code): the state machine and selector in
src/encoding/integer/rle_v2/mod.rs:255-531 and the per-sub-encoding readers
and writers in rle_v2/{short_repeat,direct,delta,patched_base}.rs. Golden
byte vectors from the reference's unit tests (rle_v2/mod.rs:558-692) are
asserted in tests/test_rle_v2.py.

Signedness: ``signed=True`` zigzags values for SHORT_REPEAT/DIRECT and
varint bases; PATCHED_BASE never zigzags (sign-MSB base); DELTA zigzags
only the base varint.

Values are int64 throughout (unsigned semantics live in the uint64 view).
Python loops run per *run* (<=512 values), all inner work is NumPy.
"""

from __future__ import annotations

import numpy as np

from .util import (
    percentile_bits_pair,
    bitpack,
    bits_required,
    bits_required_scalar,
    bitunpack,
    closest_aligned_bits,
    closest_fixed_bits,
    decode_bit_width,
    encode_bit_width,
    percentile_bits,
    read_signed_varint,
    read_varint,
    write_signed_varint,
    write_varint,
    zigzag_decode,
    zigzag_encode,
    zigzag_encode_scalar,
)

MAX_RUN_LENGTH = 512
MIN_REPEAT = 3
MAX_SHORT_REPEAT = 10
# bases at or above 2**56 don't fit the patched-base BW field safely
BASE_VALUE_LIMIT = 1 << 56

_U64 = np.uint64
_I64 = np.int64


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


def encode_rlev2(values: np.ndarray, signed: bool = True) -> bytes:
    """Encode an int64 (or uint64-viewed) array as an ORC RLEv2 stream."""
    v = np.ascontiguousarray(values, dtype=np.int64)
    out = bytearray()
    if v.size == 0:
        return b""

    # maximal equal-value runs
    change = np.flatnonzero(v[1:] != v[:-1]) + 1
    starts = np.concatenate(([0], change))
    lengths = np.diff(np.concatenate((starts, [v.size])))
    # Adaptive fixed-run threshold: churn-heavy data (mean run < MIN_REPEAT,
    # e.g. dictionary indexes of a low-cardinality column) would fragment
    # into one Python-level segment per 3-value repeat — ~100k segments for
    # 200k values, each paying header-emission overhead, while a 3-10
    # repeat saves almost nothing over packed-literal DIRECT blocks at
    # small bit widths. Folding short repeats into the 512-value variable
    # blocks is equally spec-valid RLEv2 (the reader accepts any run mix)
    # and is both ~50x faster and smaller on such data. Runs >= 12 still
    # become fixed-delta/short-repeat runs.
    mean_run = v.size / starts.size
    fixed_threshold = MIN_REPEAT if mean_run >= MIN_REPEAT else 12
    is_fixed = lengths >= fixed_threshold

    # zigzag + per-element bit widths ONCE for the whole array — the
    # per-run selector then slices instead of recomputing (the small
    # per-run numpy calls dominated encode time on churny data). Computed
    # LAZILY on the first variable span: an all-fixed array (constant or
    # long-run columns) never pays the two full-array passes
    # (code-review r6)
    zz_all = w_all = None

    # group consecutive non-fixed runs into variable spans
    i = 0
    n_runs = starts.size
    while i < n_runs:
        if is_fixed[i]:
            _write_fixed_run(out, int(v[starts[i]]), int(lengths[i]), signed)
            i += 1
        else:
            j = i
            while j < n_runs and not is_fixed[j]:
                j += 1
            if zz_all is None:
                zz_all = zigzag_encode(v) if signed else v.view(np.uint64)
                w_all = bits_required(zz_all)
            span_start = int(starts[i])
            span_end = int(starts[j - 1] + lengths[j - 1])
            for cs in range(span_start, span_end, MAX_RUN_LENGTH):
                ce = min(cs + MAX_RUN_LENGTH, span_end)
                _write_variable_run(out, v[cs:ce], signed,
                                    zz_all[cs:ce], w_all[cs:ce])
            i = j
    return bytes(out)


def _write_fixed_run(out: bytearray, value: int, length: int, signed: bool) -> None:
    while length > 0:
        take = min(length, MAX_RUN_LENGTH)
        if take < MIN_REPEAT:
            _write_variable_run(out, np.full(take, value, dtype=np.int64), signed)
        elif take <= MAX_SHORT_REPEAT:
            _write_short_repeat(out, value, take, signed)
        else:
            _write_fixed_delta(out, value, take, signed)
        length -= take


def _write_short_repeat(out: bytearray, value: int, count: int, signed: bool) -> None:
    u = zigzag_encode_scalar(value) if signed else value & ((1 << 64) - 1)
    width_bytes = max(1, (bits_required_scalar(u) + 7) // 8)
    out.append(((width_bytes - 1) << 3) | (count - MIN_REPEAT))
    out.extend(u.to_bytes(width_bytes, "big"))


def _write_fixed_delta(out: bytearray, value: int, length: int, signed: bool) -> None:
    # DELTA header with width code 0 (fixed delta), delta = 0
    out.append(0xC0 | ((length - 1) >> 8))
    out.append((length - 1) & 0xFF)
    base = zigzag_encode_scalar(value) if signed else value & ((1 << 64) - 1)
    out.extend(write_varint(base))
    out.extend(write_signed_varint(0))


def _write_variable_run(out: bytearray, literals: np.ndarray, signed: bool,
                        zz: np.ndarray | None = None,
                        zz_widths: np.ndarray | None = None) -> None:
    """The sub-encoding selector over one chunk of <= 512 literals.
    ``zz``/``zz_widths`` carry the precomputed zigzag view and per-element
    bit widths when the caller already computed them array-wide."""
    n = literals.size
    if zz is None:
        zz = zigzag_encode(literals) if signed else literals.view(np.uint64)

    if n <= MIN_REPEAT:
        _write_direct(out, zz, percentile_bits(zz, 1.0, zz_widths))
        return

    deltas = np.diff(literals)
    if deltas.size and (deltas == deltas[0]).all():
        _write_delta(out, literals, None, signed, fixed=True)
        return
    non_increasing = bool((deltas <= 0).all())
    non_decreasing = bool((deltas >= 0).all())
    # first delta signals increasing/decreasing to the reader, so must be != 0
    if deltas[0] != 0 and (non_increasing or non_decreasing):
        # bit width over |deltas| excluding the first (stored as varint)
        abs_deltas = np.abs(deltas[1:]).view(np.uint64)
        max_bits = int(bits_required(abs_deltas).max()) if abs_deltas.size else 1
        _write_delta(out, literals, max_bits, signed, fixed=False)
        return

    zz100, zz90 = percentile_bits_pair(zz, 1.0, 0.9, zz_widths)
    if zz100 - zz90 <= 1:
        _write_direct(out, zz, zz100)
        return

    lo = int(literals.min())
    hi = int(literals.max())
    # overflow / base-size guards -> DIRECT
    if abs(lo) >= BASE_VALUE_LIMIT or (hi - lo) > (1 << 63) - 1:
        _write_direct(out, zz, zz100)
        return
    reduced = (literals.astype(object) - lo).astype(np.uint64) if hi - lo >= 1 << 62 else (
        literals - lo
    ).view(np.uint64)
    br100, br95 = percentile_bits_pair(reduced, 1.0, 0.95)
    if br100 != br95:
        if not _write_patched_base(out, literals, reduced, lo, br95, br100):
            _write_direct(out, zz, zz100)
    else:
        _write_direct(out, zz, zz100)


def _write_direct(out: bytearray, zz: np.ndarray, width100p: int) -> None:
    n = zz.size
    width = closest_aligned_bits(width100p)
    out.append(0x40 | (encode_bit_width(width) << 1) | ((n - 1) >> 8))
    out.append((n - 1) & 0xFF)
    out.extend(bitpack(zz, width))


def _write_delta(
    out: bytearray, literals: np.ndarray, max_delta_bits: int | None, signed: bool, fixed: bool
) -> None:
    n = literals.size
    base = int(literals[0])
    base_u = zigzag_encode_scalar(base) if signed else base & ((1 << 64) - 1)
    if fixed:
        out.append(0xC0 | ((n - 1) >> 8))
        out.append((n - 1) & 0xFF)
        out.extend(write_varint(base_u))
        out.extend(write_signed_varint(int(literals[1]) - base))
        return
    width = closest_aligned_bits(max_delta_bits if max_delta_bits and max_delta_bits > 1 else 2)
    out.append(0xC0 | (encode_bit_width(width) << 1) | ((n - 1) >> 8))
    out.append((n - 1) & 0xFF)
    out.extend(write_varint(base_u))
    deltas = np.diff(literals)
    out.extend(write_signed_varint(int(deltas[0])))
    if n > 2:
        out.extend(bitpack(np.abs(deltas[1:]).view(np.uint64), width))


def _write_patched_base(
    out: bytearray,
    literals: np.ndarray,
    reduced: np.ndarray,
    base: int,
    br95: int,
    br100: int,
) -> bool:
    """Write a PATCHED_BASE run; return False to fall back to DIRECT."""
    n = literals.size
    width = br95
    patch_width = closest_fixed_bits(br100 - br95)
    if patch_width == 64:
        patch_width = 56
        width = 8
    mask = _U64((1 << width) - 1)
    outlier_idx = np.flatnonzero(reduced > mask)
    if outlier_idx.size == 0:
        return False
    patches = (reduced[outlier_idx] >> _U64(width)).tolist()
    # gaps between consecutive patches (first gap from index 0)
    gaps = np.empty(outlier_idx.size, dtype=np.int64)
    gaps[0] = outlier_idx[0]
    gaps[1:] = np.diff(outlier_idx)
    # split gaps > 255 with jump patches (gap 255, patch 0)
    entries: list[tuple[int, int]] = []
    for g, p in zip(gaps.tolist(), patches):
        while g > 255:
            entries.append((255, 0))
            g -= 255
        entries.append((g, int(p)))
    if len(entries) > 31:
        return False
    max_gap = max(g for g, _ in entries)
    gap_width = closest_fixed_bits(bits_required_scalar(max_gap))
    if gap_width + patch_width > 64:
        gap_width = 64 - patch_width
        if bits_required_scalar(max_gap) > gap_width:
            return False
    # base value: sign-MSB, minimal whole bytes
    negative = base < 0
    base_mag = -base if negative else base
    base_bits = bits_required_scalar(base_mag) + 1  # +1 sign bit
    base_bytes = max(1, (base_bits + 7) // 8)
    base_word = base_mag | (1 << (base_bytes * 8 - 1)) if negative else base_mag

    out.append(0x80 | (encode_bit_width(width) << 1) | ((n - 1) >> 8))
    out.append((n - 1) & 0xFF)
    out.append(((base_bytes - 1) << 5) | encode_bit_width(patch_width))
    out.append(((gap_width - 1) << 5) | len(entries))
    out.extend(base_word.to_bytes(base_bytes, "big"))
    out.extend(bitpack(reduced & mask, width))
    entry_vals = np.array([(g << patch_width) | p for g, p in entries], dtype=np.uint64)
    # Java/C++ ORC pack the patch list at closestFixedBits(gap+patch)
    # (RunLengthIntegerWriterV2.preparePatchedBlob) — packing at the raw
    # sum made every run whose sum is not itself a fixed-bit size
    # unreadable by real ORC readers (silent corruption / ParseError;
    # code-review r6, differential-tested both directions)
    out.extend(bitpack(entry_vals, closest_fixed_bits(gap_width + patch_width)))
    return True


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def _run_extent(buf, pos: int) -> tuple[int, int]:
    """(value_count, next_pos) of the run at ``pos`` WITHOUT decoding values
    — run-header arithmetic only (reference skip parity: E19,
    rle_v2/mod.rs:148-175)."""
    h = buf[pos]
    enc = h >> 6
    if enc == 0:  # short repeat
        width_bytes = ((h >> 3) & 0x7) + 1
        return (h & 0x7) + MIN_REPEAT, pos + 1 + width_bytes
    if enc == 1:  # direct
        width = decode_bit_width((h >> 1) & 0x1F)
        n = (((h & 1) << 8) | buf[pos + 1]) + 1
        return n, pos + 2 + (n * width + 7) // 8
    if enc == 2:  # patched base
        n = (((h & 1) << 8) | buf[pos + 1]) + 1
        width = decode_bit_width((h >> 1) & 0x1F)
        base_bytes = ((buf[pos + 2] >> 5) & 0x7) + 1
        patch_width = decode_bit_width(buf[pos + 2] & 0x1F)
        gap_width = ((buf[pos + 3] >> 5) & 0x7) + 1
        pll = buf[pos + 3] & 0x1F
        nxt = pos + 4 + base_bytes + (n * width + 7) // 8
        nxt += (pll * closest_fixed_bits(gap_width + patch_width) + 7) // 8
        return n, nxt
    # delta: must walk the two varints
    width_code = (h >> 1) & 0x1F
    width = 0 if width_code == 0 else decode_bit_width(width_code)
    n = (((h & 1) << 8) | buf[pos + 1]) + 1
    p = pos + 2
    _, p = read_varint(buf, p)
    # the delta-base varint is ALWAYS present, even for n == 1 (the same
    # old-Hive contract _read_delta honors above — skipping it here
    # desynchronized the SEEK path on exactly the files the full-decode
    # fix targets: next_pos landed inside the varint and the following
    # run header parsed as garbage)
    _, p = read_varint(buf, p)  # signed varint is varint-shaped
    if n > 1 and width:
        p += ((n - 2) * width + 7) // 8
    return n, p


def decode_rlev2(buf, n: int, signed: bool = True, skip: int = 0,
                 exact: bool = True) -> np.ndarray:
    """Decode ``n`` int64 values from an ORC RLEv2 stream, optionally
    skipping ``skip`` values first (whole runs are skipped via header
    arithmetic without materializing). ``exact=False`` tolerates a stream
    that continues past the requested count (decoding a row group out of
    the middle of a stripe stream) and truncates the final run."""
    pos = 0
    head_trim = 0
    while skip > 0:
        count, nxt = _run_extent(buf, pos)
        if count <= skip:
            skip -= count
            pos = nxt
        else:
            head_trim = skip
            skip = 0
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    chunks: list[np.ndarray] = []
    n_target = n
    n = n + head_trim  # decode the partial first run fully, trim below
    got = 0
    while got < n:
        header = buf[pos]
        enc = header >> 6
        if enc == 0:
            vals, pos = _read_short_repeat(buf, pos, signed)
        elif enc == 1:
            vals, pos = _read_direct(buf, pos, signed)
        elif enc == 2:
            vals, pos = _read_patched_base(buf, pos)
        else:
            vals, pos = _read_delta(buf, pos, signed)
        chunks.append(vals)
        got += vals.size
    if got != n and exact:
        raise ValueError(f"RLEv2 stream produced {got} values, expected {n}")
    out = np.concatenate(chunks) if len(chunks) > 1 else chunks[0]
    return out[head_trim : head_trim + n_target]


def _read_short_repeat(buf, pos: int, signed: bool) -> tuple[np.ndarray, int]:
    h = buf[pos]
    width_bytes = ((h >> 3) & 0x7) + 1
    count = (h & 0x7) + MIN_REPEAT
    u = int.from_bytes(bytes(buf[pos + 1 : pos + 1 + width_bytes]), "big")
    v = ((u >> 1) ^ -(u & 1)) if signed else u
    if v >= 1 << 63:
        v -= 1 << 64
    return np.full(count, v, dtype=np.int64), pos + 1 + width_bytes


def _read_direct(buf, pos: int, signed: bool) -> tuple[np.ndarray, int]:
    h = buf[pos]
    width = decode_bit_width((h >> 1) & 0x1F)
    n = (((h & 1) << 8) | buf[pos + 1]) + 1
    pos += 2
    nbytes = (n * width + 7) // 8
    u = bitunpack(bytes(buf[pos : pos + nbytes]), n, width)
    vals = zigzag_decode(u) if signed else u.view(np.int64)
    return vals, pos + nbytes


def _read_delta(buf, pos: int, signed: bool) -> tuple[np.ndarray, int]:
    h = buf[pos]
    width_code = (h >> 1) & 0x1F
    width = 0 if width_code == 0 else decode_bit_width(width_code)
    n = (((h & 1) << 8) | buf[pos + 1]) + 1
    pos += 2
    base_u, pos = read_varint(buf, pos)
    base = ((base_u >> 1) ^ -(base_u & 1)) if signed else base_u
    if base >= 1 << 63:
        base -= 1 << 64
    # the delta-base varint is ALWAYS present, even for a declared run
    # length of 1 (old Hive ORIGINAL writers emit such runs — decimal.orc
    # scale stream): skipping it desynchronized the stream and every
    # following run parsed as garbage (reference read_delta_values reads
    # it unconditionally, src/encoding/integer/rle_v2/delta.rs:73-92)
    delta_base, pos = read_signed_varint(buf, pos)
    if n == 1:
        return np.array([base], dtype=np.int64), pos
    if width == 0:  # fixed delta
        vals = base + delta_base * np.arange(n, dtype=np.int64)
        return vals, pos
    nbytes = ((n - 2) * width + 7) // 8
    packed = bitunpack(bytes(buf[pos : pos + nbytes]), n - 2, width).view(np.int64)
    pos += nbytes
    sign = -1 if delta_base < 0 else 1
    deltas = np.empty(n, dtype=np.int64)
    deltas[0] = base
    deltas[1] = delta_base
    deltas[2:] = sign * packed
    return np.cumsum(deltas), pos


def _read_patched_base(buf, pos: int) -> tuple[np.ndarray, int]:
    h0, h1, h2, h3 = buf[pos], buf[pos + 1], buf[pos + 2], buf[pos + 3]
    width = decode_bit_width((h0 >> 1) & 0x1F)
    n = (((h0 & 1) << 8) | h1) + 1
    base_bytes = ((h2 >> 5) & 0x7) + 1
    patch_width = decode_bit_width(h2 & 0x1F)
    gap_width = ((h3 >> 5) & 0x7) + 1
    pll = h3 & 0x1F
    pos += 4
    base_word = int.from_bytes(bytes(buf[pos : pos + base_bytes]), "big")
    msb = 1 << (base_bytes * 8 - 1)
    base = -(base_word & (msb - 1)) if base_word & msb else base_word
    pos += base_bytes
    nbytes = (n * width + 7) // 8
    data = bitunpack(bytes(buf[pos : pos + nbytes]), n, width)
    pos += nbytes
    # patch-list entries are packed at closestFixedBits(gap+patch) by
    # every real ORC writer — reading at the raw sum desynced the stream
    # (code-review r6)
    entry_width = closest_fixed_bits(gap_width + patch_width)
    ebytes = (pll * entry_width + 7) // 8
    entries = bitunpack(bytes(buf[pos : pos + ebytes]), pll, entry_width)
    pos += ebytes
    idx = 0
    pmask = (1 << patch_width) - 1
    for e in entries.tolist():
        gap = e >> patch_width
        patch = e & pmask
        idx += gap
        if idx >= n:
            raise ValueError(
                f"malformed PATCHED_BASE run: patch index {idx} past "
                f"run length {n}")
        if patch:
            # the FIELD widths may sum past 64 (patch_width is rounded
            # up to a fixed-bit size); the VALUE must still fit int64 —
            # a clean parse error instead of a raw OverflowError on
            # corrupt streams (code-review r6)
            if patch.bit_length() + width > 64:
                raise ValueError(
                    "malformed PATCHED_BASE run: patched value exceeds "
                    "64 bits")
            data[idx] |= _U64(patch << width)
    return (data.view(np.int64) + base), pos
