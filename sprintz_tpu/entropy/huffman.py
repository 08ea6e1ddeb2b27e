"""Canonical length-limited Huffman coding with chunk-parallel decode.

Fills the role of the paper's Huff0 stage (SprintzFIRE+Huf,
communicate/method.tex:300-303) with a TPU-native design:

- **Tables**: canonical codes from length-limited Huffman (max 12 bits,
  Kraft-repair length limiting). 256 x 4-bit lengths ship in a 128-byte
  table header — cheap to broadcast across chips.
- **Encode**: vectorized — per-symbol (code, length) LUTs, bit offsets by
  prefix sum, emission via LSB-first bit expansion + packbits. Symbols are
  grouped into independent chunks.
- **Decode**: table-driven and *chunk-parallel*: a 4096-entry
  (peek12 -> symbol, length) LUT; a lax.scan advances every chunk's bit
  cursor one symbol per step, so lanes = chunks and steps = symbols/chunk
  — the "serial Huffman becomes table-driven parallel decode" requirement
  of the north star. A numpy fallback decodes chunk-sequentially.

Stream layout (this framework's own; the reference has no in-repo format):
  [u32 n_symbols][u32 chunk_symbols][u32 nchunks][128B lengths table]
  [u32 payload_nbytes per chunk][chunk payloads...]
"""

from __future__ import annotations

import dataclasses
import heapq

import numpy as np

MAX_CODE_LEN = 12
# smaller chunks = more decode lanes and fewer sequential steps
DEFAULT_CHUNK_SYMBOLS = 1 << 12


@dataclasses.dataclass
class HuffmanTable:
    lengths: np.ndarray  # (256,) uint8, 0 = symbol absent
    codes: np.ndarray  # (256,) uint32, canonical, LSB-first bit order

    def decode_lut(self) -> tuple[np.ndarray, np.ndarray]:
        """(4096,) symbol and length tables indexed by the next 12 bits
        (LSB-first peek)."""
        sym = np.zeros(1 << MAX_CODE_LEN, dtype=np.uint8)
        ln = np.zeros(1 << MAX_CODE_LEN, dtype=np.uint8)
        for s in range(256):
            L = int(self.lengths[s])
            if L == 0:
                continue
            code = int(self.codes[s])
            step = 1 << L
            for fill in range(code, 1 << MAX_CODE_LEN, step):
                sym[fill] = s
                ln[fill] = L
        return sym, ln


def _limited_lengths(counts: np.ndarray, max_len: int = MAX_CODE_LEN
                     ) -> np.ndarray:
    """Huffman code lengths, limited to max_len via Kraft repair."""
    syms = np.nonzero(counts)[0]
    lengths = np.zeros(256, dtype=np.uint8)
    if len(syms) == 0:
        return lengths
    if len(syms) == 1:
        lengths[syms[0]] = 1
        return lengths
    # standard Huffman on a heap of (count, tiebreak, node)
    heap = [(int(counts[s]), int(s), ("leaf", int(s))) for s in syms]
    heapq.heapify(heap)
    tb = 256
    while len(heap) > 1:
        c1, _, n1 = heapq.heappop(heap)
        c2, _, n2 = heapq.heappop(heap)
        heapq.heappush(heap, (c1 + c2, tb, ("node", n1, n2)))
        tb += 1
    stack = [(heap[0][2], 0)]
    while stack:
        node, depth = stack.pop()
        if node[0] == "leaf":
            lengths[node[1]] = max(1, depth)
        else:
            stack.append((node[1], depth + 1))
            stack.append((node[2], depth + 1))
    # length-limit: clamp, then repair Kraft sum by extending the
    # shallowest-clamped codes
    over = lengths > max_len
    if over.any():
        lengths[over] = max_len
        kraft = np.sum((lengths > 0) * (1 << (max_len - lengths.astype(int))))
        while kraft > (1 << max_len):
            # deepen the least-frequent symbol not yet at max_len
            cands = np.nonzero((lengths > 0) & (lengths < max_len))[0]
            s = cands[np.argmin(counts[cands])]
            kraft -= 1 << (max_len - int(lengths[s]))
            lengths[s] += 1
            kraft += 1 << (max_len - int(lengths[s]))
        # tighten codes that can be shortened for free
        while True:
            kraft = np.sum((lengths > 0) * (1 << (max_len - lengths.astype(int))))
            slack = (1 << max_len) - kraft
            cands = np.nonzero(lengths > 1)[0]
            improved = False
            for s in cands[np.argsort(-counts[cands])]:
                gain = 1 << (max_len - int(lengths[s]))
                if gain <= slack:
                    lengths[s] -= 1
                    improved = True
                    break
            if not improved:
                break
    return lengths


def _canonical_codes(lengths: np.ndarray) -> np.ndarray:
    """Canonical code assignment, emitted LSB-first (bit-reversed)."""
    codes = np.zeros(256, dtype=np.uint32)
    code = 0
    prev_len = 0
    order = sorted((int(lengths[s]), s) for s in range(256) if lengths[s])
    for L, s in order:
        code <<= (L - prev_len)
        # bit-reverse to make the LSB-first peek index canonical
        rev = int(f"{code:0{L}b}"[::-1], 2)
        codes[s] = rev
        code += 1
        prev_len = L
    return codes


def build_table(data: np.ndarray | bytes) -> HuffmanTable:
    from ..native_host import histogram_native

    arr = np.frombuffer(data, dtype=np.uint8) if isinstance(
        data, (bytes, bytearray)) else np.asarray(data, dtype=np.uint8)
    counts = histogram_native(arr)
    if counts is None:
        counts = np.bincount(arr, minlength=256)
    lengths = _limited_lengths(counts)
    return HuffmanTable(lengths=lengths, codes=_canonical_codes(lengths))


def _pack_table(t: HuffmanTable) -> bytes:
    nib = t.lengths.astype(np.uint8)
    return (nib[0::2] | (nib[1::2] << 4)).tobytes()  # 128 bytes


def _unpack_table(buf: bytes) -> HuffmanTable:
    nib = np.frombuffer(buf, dtype=np.uint8)
    lengths = np.zeros(256, dtype=np.uint8)
    lengths[0::2] = nib & 0xF
    lengths[1::2] = nib >> 4
    return HuffmanTable(lengths=lengths, codes=_canonical_codes(lengths))


def huff_compress(data: np.ndarray | bytes,
                  chunk_symbols: int = DEFAULT_CHUNK_SYMBOLS,
                  table: HuffmanTable | None = None) -> bytes:
    """Chunked canonical Huffman encode.

    Emission prefers the native C++ loop (native/sprintz_host.cpp,
    hundreds of MB/s — the role Huff0 plays for the reference paper);
    the numpy fallback below expands per-symbol code bits into a
    (nchunks, max_chunk_bits) bit matrix and packs with np.packbits."""
    from ..native_host import huff_encode_native

    arr = np.frombuffer(data, dtype=np.uint8) if isinstance(
        data, (bytes, bytearray)) else np.asarray(data, dtype=np.uint8)
    t = build_table(arr) if table is None else table
    n = arr.size

    native = huff_encode_native(arr, chunk_symbols, t.codes, t.lengths)
    if native is not None:
        payload, sizes = native
        nchunks = sizes.size
        head = (np.array([n, chunk_symbols, nchunks],
                         dtype=np.uint32).tobytes()
                + _pack_table(t) + sizes.tobytes())
        return head + payload
    nchunks = max(1, -(-n // chunk_symbols))
    padded_n = nchunks * chunk_symbols
    lens = np.zeros(padded_n, dtype=np.int64)
    codes = np.zeros(padded_n, dtype=np.int64)
    lens[:n] = t.lengths[arr]
    codes[:n] = t.codes[arr]
    lens2 = lens.reshape(nchunks, chunk_symbols)
    offs = np.cumsum(lens2, axis=1) - lens2  # per-chunk bit offsets
    chunk_bits = offs[:, -1] + lens2[:, -1]
    max_bits = int(chunk_bits.max()) if n else 0
    width = ((max_bits + 7) // 8) * 8 + 8
    bits = np.zeros(nchunks * width, dtype=np.uint8)
    # flat 1-D targets; one vectorized pass per code-bit position (total
    # work is sum(lens), not nchunks*chunk_symbols*12)
    flat_base = (np.arange(nchunks, dtype=np.int64)[:, None] * width
                 + offs).reshape(-1)
    lens_flat = lens2.reshape(-1)
    maxlen = int(lens_flat.max()) if n else 0
    for k in range(maxlen):
        sel = np.nonzero(lens_flat > k)[0]
        bits[flat_base[sel] + k] = (codes[sel] >> k) & 1
    bits = bits.reshape(nchunks, width)
    packed = np.packbits(bits, axis=1, bitorder="little")
    sizes = ((chunk_bits + 7) // 8).astype(np.uint32)
    payloads = [packed[c, : sizes[c]].tobytes() for c in range(nchunks)]
    head = (np.array([n, chunk_symbols, nchunks], dtype=np.uint32).tobytes()
            + _pack_table(t) + sizes.tobytes())
    return head + b"".join(payloads)


def _parse(buf: bytes):
    n, chunk_symbols, nchunks = np.frombuffer(buf, dtype=np.uint32, count=3)
    t = _unpack_table(buf[12 : 12 + 128])
    sizes = np.frombuffer(buf, dtype=np.uint32, count=int(nchunks),
                          offset=140)
    payload_start = 140 + 4 * int(nchunks)
    offsets = payload_start + np.concatenate(
        [[0], np.cumsum(sizes.astype(np.int64))])[:-1]
    return int(n), int(chunk_symbols), int(nchunks), t, sizes, offsets


def huff_decompress(buf: bytes, backend: str = "auto") -> np.ndarray:
    """Decode a huff_compress stream.

    backend: "auto" prefers the native C++ table-driven loop (the
    production path — entropy decode is gather-driven, the one pattern
    that scalarizes on TPU, so it stays on host exactly like the
    reference runs Huff0 on CPU); "jax" forces the experimental
    chunk-parallel device scan; "numpy" the vectorized host fallback.
    """
    n, chunk_symbols, nchunks, t, sizes, offsets = _parse(buf)
    if n == 0:
        return np.zeros(0, dtype=np.uint8)
    if backend == "auto":
        from ..native_host import huff_decode_native

        sym_lut, len_lut = t.decode_lut()
        native = huff_decode_native(buf, offsets, sizes, chunk_symbols, n,
                                    sym_lut, len_lut)
        if native is not None:
            return native
    if backend == "jax":
        try:
            return _decode_jax(buf, n, chunk_symbols, nchunks, t, sizes,
                               offsets)
        except ImportError:
            pass
    return _decode_np(buf, n, chunk_symbols, nchunks, t, sizes, offsets)


def _decode_np(buf, n, chunk_symbols, nchunks, t, sizes, offsets):
    """Chunk-vectorized decode: all chunks advance one symbol per step."""
    sym_lut, len_lut = t.decode_lut()
    data = np.frombuffer(buf, dtype=np.uint8)
    maxb = int(sizes.max()) + 4 if nchunks else 4
    dense = np.zeros((nchunks, maxb), dtype=np.int64)
    for c in range(nchunks):
        dense[c, : int(sizes[c])] = data[
            int(offsets[c]) : int(offsets[c]) + int(sizes[c])]
    rows = np.arange(nchunks)
    bitpos = np.zeros(nchunks, dtype=np.int64)
    syms = np.empty((nchunks, chunk_symbols), dtype=np.uint8)
    sym_lut_i = sym_lut.astype(np.uint8)
    len_lut_i = len_lut.astype(np.int64)
    for i in range(chunk_symbols):
        # clamp: the final chunk keeps stepping past its own payload
        byte = np.minimum(bitpos >> 3, maxb - 3)
        w = (dense[rows, byte] | (dense[rows, byte + 1] << 8)
             | (dense[rows, byte + 2] << 16))
        peek = (w >> (bitpos & 7)) & 0xFFF
        syms[:, i] = sym_lut_i[peek]
        bitpos += len_lut_i[peek]
    return syms.reshape(-1)[:n]


def _decode_jax(buf, n, chunk_symbols, nchunks, t, sizes, offsets):
    """Chunk-parallel device decode: lanes = chunks, scan steps = symbols."""
    import jax
    import jax.numpy as jnp

    from ..utils.shapes import next_bucket

    sym_lut, len_lut = t.decode_lut()
    data = np.frombuffer(buf, dtype=np.uint8)
    maxb = int(sizes.max()) + 4 if nchunks else 4
    # gather each chunk's payload into a rectangular (nchunks, maxb) buffer
    dense = np.zeros((nchunks, maxb), dtype=np.uint8)
    for c in range(nchunks):
        dense[c, : int(sizes[c])] = data[
            int(offsets[c]) : int(offsets[c]) + int(sizes[c])]

    nc_pad = next_bucket(nchunks, 8)
    dense_p = np.zeros((nc_pad, maxb), dtype=np.uint8)
    dense_p[:nchunks] = dense

    out = _decode_scan(
        jnp.asarray(dense_p, jnp.int32),
        jnp.asarray(sym_lut, jnp.int32),
        jnp.asarray(len_lut, jnp.int32),
        chunk_symbols)
    out = np.asarray(out, dtype=np.uint8)[:nchunks].reshape(-1)[:n]
    return out


def _decode_scan(dense, sym_lut, len_lut, chunk_symbols):
    import functools

    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("steps",))
    def run(dense, sym_lut, len_lut, steps):
        nchunks, maxb = dense.shape

        def step(bitpos, _):
            byte = bitpos >> 3
            i0 = jnp.clip(byte, 0, maxb - 1)
            i1 = jnp.clip(byte + 1, 0, maxb - 1)
            i2 = jnp.clip(byte + 2, 0, maxb - 1)
            rows = jnp.arange(nchunks)
            w = (dense[rows, i0] | (dense[rows, i1] << 8)
                 | (dense[rows, i2] << 16))
            peek = (w >> (bitpos & 7)) & 0xFFF
            s = sym_lut[peek]
            L = len_lut[peek]
            return bitpos + L, s

        _, syms = jax.lax.scan(
            step, jnp.zeros(nchunks, jnp.int32), None, length=steps)
        return syms.T  # (nchunks, steps)

    return run(dense, sym_lut, len_lut, chunk_symbols)
