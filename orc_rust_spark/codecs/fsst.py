"""FSST — Fast Static Symbol Table string compression.

From the published algorithm (Boncz, Neumann, Leis: "FSST: Fast Random
Access String Compression", VLDB 2020). This codec does NOT exist in the
reference repo (verified: no fsst matches in /root/reference); the north
rule adds it for string streams.

- Symbol table: up to 255 symbols of 1-8 bytes (codes 0..254);
  code 255 is the escape marker — the next code byte is a literal.
- Training: iterative (default 5 rounds) on a bounded sample: compress with
  the current table, count symbol and adjacent-pair frequencies, admit the
  highest-gain (count * length) symbols and pair-concatenations.
- Encoding: greedy longest match. Implemented *transposed*: one NumPy step
  advances every still-active string by one token, so the hot loop is over
  max-tokens-per-string, not over bytes. Lookup per candidate length is a
  searchsorted against the sorted uint64 prefixix keys of that length.
- Decoding: fully vectorized — escape runs are resolved with run-length
  parity, symbol expansion via an (n_tokens, 8) gather + mask.

The symbol table serializes to bytes so the engine can train once per
column during the stats pass and broadcast it to all encode tasks.
"""

from __future__ import annotations

import numpy as np

ESCAPE = 255
MAX_SYMBOLS = 255
MAX_SYMBOL_LEN = 8


class FsstTable:
    """An immutable trained symbol table."""

    def __init__(self, symbols: list[bytes]):
        if len(symbols) > MAX_SYMBOLS:
            raise ValueError("at most 255 symbols")
        if any(not 1 <= len(s) <= MAX_SYMBOL_LEN for s in symbols):
            raise ValueError("symbols must be 1-8 bytes")
        if len(set(symbols)) != len(symbols):
            raise ValueError("duplicate symbols")
        self.symbols = list(symbols)
        # decode side: (255, 8) byte matrix + lengths
        self._dec_bytes = np.zeros((MAX_SYMBOLS, MAX_SYMBOL_LEN), dtype=np.uint8)
        self._dec_lens = np.ones(MAX_SYMBOLS, dtype=np.int64)
        for code, s in enumerate(self.symbols):
            self._dec_bytes[code, : len(s)] = np.frombuffer(s, dtype=np.uint8)
            self._dec_lens[code] = len(s)
        # encode side: per length l, sorted uint64 keys (bytes left-aligned)
        # and the symbol codes in that order
        self._keys: list[np.ndarray] = []
        self._codes: list[np.ndarray] = []
        for length in range(1, MAX_SYMBOL_LEN + 1):
            pairs = [
                (int.from_bytes(s.ljust(8, b"\0"), "big"), c)
                for c, s in enumerate(self.symbols)
                if len(s) == length
            ]
            pairs.sort()
            self._keys.append(np.array([k for k, _ in pairs], dtype=np.uint64))
            self._codes.append(np.array([c for _, c in pairs], dtype=np.uint8))
        self._lengths_present = [
            length for length in range(MAX_SYMBOL_LEN, 0, -1) if self._keys[length - 1].size
        ]

    def serialize(self) -> bytes:
        out = bytearray([len(self.symbols)])
        for s in self.symbols:
            out.append(len(s))
            out.extend(s)
        return bytes(out)

    @classmethod
    def deserialize(cls, buf: bytes) -> "FsstTable":
        n = buf[0]
        pos = 1
        symbols = []
        for _ in range(n):
            ln = buf[pos]
            pos += 1
            symbols.append(bytes(buf[pos : pos + ln]))
            pos += ln
        return cls(symbols)


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------


def _greedy_tokens(sample: bytes, sym_set: dict[bytes, int]) -> list[bytes]:
    """Sequential greedy longest-match over the (bounded) training sample."""
    tokens = []
    i = 0
    n = len(sample)
    max_len = max((len(s) for s in sym_set), default=1)
    while i < n:
        match = None
        for ln in range(min(max_len, n - i), 0, -1):
            cand = sample[i : i + ln]
            if cand in sym_set:
                match = cand
                break
        if match is None:
            match = sample[i : i + 1]  # escape-literal
        tokens.append(match)
        i += len(match)
    return tokens


def train_fsst(sample: bytes, iterations: int = 5, sample_limit: int = 16384) -> FsstTable:
    """Train a symbol table on a bounded sample (paper §4 bottom-up variant)."""
    sample = bytes(sample[:sample_limit])
    if not sample:
        return FsstTable([])
    symbols: dict[bytes, int] = {}
    for _ in range(iterations):
        tokens = _greedy_tokens(sample, symbols)
        gain: dict[bytes, int] = {}
        prev = None
        for t in tokens:
            # count single symbols (gain = freq * len, only len>1 compresses;
            # len-1 symbols still help by avoiding escapes)
            g = len(t) if len(t) > 1 else 1
            gain[t] = gain.get(t, 0) + g
            if prev is not None:
                cat = (prev + t)[:MAX_SYMBOL_LEN]
                if len(cat) > len(prev):
                    gain[cat] = gain.get(cat, 0) + len(cat)
            prev = t
        best = sorted(gain.items(), key=lambda kv: (-kv[1], kv[0]))[:MAX_SYMBOLS]
        symbols = {s: i for i, (s, _) in enumerate(best)}
    return FsstTable(list(symbols.keys()))


# ---------------------------------------------------------------------------
# encode (transposed across strings)
# ---------------------------------------------------------------------------

def fsst_encode(data: bytes, offsets: np.ndarray, table: FsstTable) -> tuple[bytes, np.ndarray]:
    """Encode strings given as (flat bytes, int64 offsets of n+1 entries).

    Returns (flat encoded bytes, int64 encoded offsets).

    Phase 1 precomputes, for EVERY byte position at once, the longest symbol
    match that fits inside its string (8 vectorized searchsorted passes).
    Phase 2 walks the greedy token chain transposed across strings — one
    cheap gather step per token *rank*, so the Python loop length is
    max-tokens-per-string, not total bytes.
    """
    n = offsets.size - 1
    if n == 0 or len(data) == 0:
        return b"", offsets.astype(np.int64).copy()
    if int(offsets[0]) != 0 or int(offsets[-1]) != len(data):
        # the offsets must be REBASED to the data span (offsets[0] == 0,
        # offsets[-1] == len(data)); absolute offsets of a sliced Arrow
        # array would silently corrupt the per-position remaining-length
        # math (code-review r6)
        raise ValueError(
            f"offsets must span data exactly: [{int(offsets[0])}, "
            f"{int(offsets[-1])}] vs {len(data)} bytes")
    buf = np.frombuffer(data, dtype=np.uint8)
    nb = buf.size
    offsets = offsets.astype(np.int64, copy=False)
    str_lens = np.diff(offsets)

    # --- phase 1: longest match per byte position -------------------------
    padded = np.concatenate([buf, np.zeros(MAX_SYMBOL_LEN, dtype=np.uint8)])
    w64 = (
        np.lib.stride_tricks.sliding_window_view(padded, MAX_SYMBOL_LEN)[:nb]
        .copy()
        .view(">u8")
        .ravel()
        .astype(np.uint64)
    )
    # remaining bytes in the string from each position
    pos_arange = np.arange(nb, dtype=np.int64)
    str_end_per_pos = np.repeat(offsets[1:], str_lens)
    remaining = str_end_per_pos - pos_arange
    match_len = np.zeros(nb, dtype=np.int64)
    match_code = np.zeros(nb, dtype=np.uint8)
    for length in table._lengths_present:
        keys = table._keys[length - 1]
        cand = np.flatnonzero((match_len == 0) & (remaining >= length))
        if cand.size == 0:
            continue
        shift = np.uint64(64 - 8 * length)
        k = (w64[cand] >> shift) << shift
        idx = np.searchsorted(keys, k)
        idx_c = np.minimum(idx, keys.size - 1)
        hit = keys[idx_c] == k
        ci = cand[hit]
        match_len[ci] = length
        match_code[ci] = table._codes[length - 1][idx_c[hit]]
    escaped = match_len == 0
    advance = np.where(escaped, 1, match_len)
    tok_bytes = np.where(escaped, 2, 1).astype(np.int64)

    # --- phase 2: single chain walk into an over-allocated buffer ----------
    # worst case output is 2 bytes per input byte, so give each string a
    # capacity region of 2x its length, then compact with one ragged gather
    starts0 = offsets[:-1]
    ends = offsets[1:]
    cap_starts = starts0 * 2
    out = np.empty(2 * nb, dtype=np.uint8)
    cur = starts0.copy()
    out_cur = cap_starts.copy()
    active = np.flatnonzero(cur < ends)
    # transposed-vectorized while the active set is large; a Python tail
    # finishes the few longest strings (per-step numpy overhead would
    # otherwise dominate the long tail)
    while active.size > 64:
        p = cur[active]
        o = out_cur[active]
        esc = escaped[p]
        out[o] = np.where(esc, np.uint8(ESCAPE), match_code[p])
        oe = o[esc]
        out[oe + 1] = buf[p[esc]]
        out_cur[active] = o + tok_bytes[p]
        cur[active] = p + advance[p]
        active = active[cur[active] < ends[active]]
    if active.size:
        for si in active.tolist():
            p = int(cur[si])
            e = int(ends[si])
            o = int(out_cur[si])
            mseg = match_code[p:e].tolist()
            aseg = advance[p:e].tolist()
            eseg = escaped[p:e].tolist()
            bseg = buf[p:e].tolist()
            base = p
            while p < e:
                i = p - base
                if eseg[i]:
                    out[o] = ESCAPE
                    out[o + 1] = bseg[i]
                    o += 2
                    p += 1
                else:
                    out[o] = mseg[i]
                    o += 1
                    p += aseg[i]
            out_cur[si] = o
    enc_lens = out_cur - cap_starts
    enc_offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(enc_lens, out=enc_offsets[1:])
    total = int(enc_offsets[-1])
    # ragged gather compaction
    base = np.repeat(cap_starts, enc_lens)
    within = np.arange(total, dtype=np.int64) - np.repeat(enc_offsets[:-1], enc_lens)
    return out[base + within].tobytes(), enc_offsets


# ---------------------------------------------------------------------------
# decode (fully vectorized)
# ---------------------------------------------------------------------------


def fsst_decode(enc: bytes, enc_offsets: np.ndarray, table: FsstTable) -> tuple[bytes, np.ndarray]:
    """Decode -> (flat decoded bytes, int64 decoded offsets)."""
    n = enc_offsets.size - 1
    codes = np.frombuffer(enc, dtype=np.uint8)
    if codes.size == 0:
        return b"", enc_offsets.astype(np.int64).copy()
    # token starts: escape runs pair up (run-length parity); safe across
    # string boundaries because escape pairs never straddle a string
    is_esc = codes == ESCAPE
    # run-length encode is_esc
    change = np.flatnonzero(np.diff(is_esc.astype(np.int8))) + 1
    run_starts = np.concatenate(([0], change))
    run_lens = np.diff(np.concatenate((run_starts, [codes.size])))
    run_is_esc = is_esc[run_starts]
    is_literal = np.zeros(codes.size, dtype=bool)  # consumed by an escape
    esc_starts = run_starts[run_is_esc]
    esc_lens = run_lens[run_is_esc]
    if esc_starts.size:
        # within an escape run, odd offsets are literals (ragged arange);
        # if the run length is odd, the byte right after it is a literal too
        half = esc_lens // 2
        total = int(half.sum())
        if total:
            base = np.repeat(esc_starts, half)
            cum = np.zeros(half.size, dtype=np.int64)
            np.cumsum(half[:-1], out=cum[1:])
            within = np.arange(total, dtype=np.int64) - np.repeat(cum, half)
            is_literal[base + 1 + 2 * within] = True
        odd = esc_lens % 2 == 1
        tail = esc_starts[odd] + esc_lens[odd]
        is_literal[tail[tail < codes.size]] = True
    token_start = ~is_literal
    starts = np.flatnonzero(token_start)
    tok_codes = codes[starts]
    tok_is_esc = tok_codes == ESCAPE
    out_lens = np.where(tok_is_esc, 1, table._dec_lens[np.minimum(tok_codes, MAX_SYMBOLS - 1)])
    # expand
    mat = np.zeros((starts.size, MAX_SYMBOL_LEN), dtype=np.uint8)
    sym_rows = ~tok_is_esc
    mat[sym_rows] = table._dec_bytes[tok_codes[sym_rows]]
    esc_rows = np.flatnonzero(tok_is_esc)
    mat[esc_rows, 0] = codes[starts[esc_rows] + 1]
    mask = np.arange(MAX_SYMBOL_LEN) < out_lens[:, None]
    flat = mat[mask]
    # decoded offsets: tokens per string via searchsorted on enc_offsets
    tok_string = np.searchsorted(enc_offsets, starts, side="right") - 1
    dec_lens = np.bincount(tok_string, weights=out_lens, minlength=n).astype(np.int64)
    dec_offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(dec_lens, out=dec_offsets[1:])
    return flat.tobytes(), dec_offsets
